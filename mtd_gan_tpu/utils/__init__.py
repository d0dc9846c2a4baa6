"""Utilities: metric logging, checkpoint/resume, artifact writers."""

from mtd_gan_tpu.utils.logging import MetricLogger, SmoothedValue
from mtd_gan_tpu.utils.checkpoint import CheckpointManager
from mtd_gan_tpu.utils.artifacts import save_csv, save_png_gray

__all__ = [
    "MetricLogger",
    "SmoothedValue",
    "CheckpointManager",
    "save_png_gray",
    "save_csv",
]
