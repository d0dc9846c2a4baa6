"""On-device image-quality metrics."""

from mtd_gan_tpu.metrics.pixel import (
    compute_rmse,
    compute_psnr,
    compute_ssim,
    rmse,
    psnr,
    ssim,
)

__all__ = [
    "compute_rmse",
    "compute_psnr",
    "compute_ssim",
    "rmse",
    "psnr",
    "ssim",
]
