"""mtd_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for low-dose CT
denoising with the full capability surface of the MTD-GAN reference harness
(babbu3682/MTD-GAN): model zoo (CNN / transformer / GAN / diffusion families),
multi-task-optimization gradient surgery, DICOM data pipeline, on-device
sliding-window inference, metrics, and train/test drivers.

Design stance (not a port):
  * images are NHWC (TPU-native layout), params fp32, optional bf16 compute;
  * models are pure-functional flax.linen modules — state (spectral-norm power
    iteration vectors, MTO histories) is threaded explicitly through jit;
  * one generic engine with per-family jitted TrainStep strategies replaces the
    reference's seven near-duplicate train loops (reference engine.py:26-897);
  * parallelism is a jax.sharding.Mesh (data axis over ICI) instead of
    torch nn.DataParallel (reference train.py:93-110).
"""

__version__ = "0.1.0"
