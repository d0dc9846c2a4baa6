"""Pretrained feature extractors in JAX (VGG19 / ResNet50 / InceptionV3).

The reference pulls these from torchvision with downloaded weights
(losses.py:20, metrics.py:47, module/piq/feature_extractors/fid_inception.py).
This image has no torchvision and no network egress, so:
  * architectures are implemented natively in flax (NHWC);
  * weights import from torch state-dict files if present (searched in
    $MTD_GAN_TPU_WEIGHTS, $TORCH_HOME/hub/checkpoints, ~/.cache/torch/hub/
    checkpoints — drop the standard torchvision .pth files there);
  * otherwise extractors fall back to seeded deterministic random weights —
    every loss/metric stays functional and reproducible, but PL/TML/FID
    absolute values then differ from the pretrained-feature reference
    (documented deviation; fixed by supplying the weight files).
"""

from mtd_gan_tpu.features.registry import (
    feature_weights_status,
    get_inception_feature_fn,
    get_perceptual_fn,
    get_resnet_feature_fn,
    get_vgg_slices_fn,
)

__all__ = [
    "get_vgg_slices_fn",
    "get_resnet_feature_fn",
    "get_inception_feature_fn",
    "get_perceptual_fn",
    "feature_weights_status",
]
