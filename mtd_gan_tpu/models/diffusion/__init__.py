"""Diffusion denoising family: DiffusionUNet + DDPM/DDIM/PNDM/DPM-Solver++
schedulers, conditioned by channel-concat of the low-dose slice.

Reference: arch/Diffusion/networks.py (wrappers) + vendored
MONAI-GenerativeModels tree (UNet arch, scheduler math, inferer loops).
All reverse loops run as lax.scan — one compiled program per sampler.
"""

from mtd_gan_tpu.models.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    PNDMScheduler,
)
from mtd_gan_tpu.models.diffusion.unet import DiffusionUNet
from mtd_gan_tpu.models.diffusion.wrappers import (
    DDIMModel,
    DDPMModel,
    DPMModel,
    PNDMModel,
)

__all__ = [
    "DDPMScheduler", "DDIMScheduler", "PNDMScheduler",
    "DPMSolverMultistepScheduler", "DiffusionUNet",
    "DDPMModel", "DDIMModel", "PNDMModel", "DPMModel",
]
