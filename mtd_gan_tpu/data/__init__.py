"""Data pipeline: DICOM decode (own codec — no pydicom in the image),
HU windowing, on-device patch sampling + augmentation, host prefetch.

Reference: create_datasets/Mayo.py + create_datasets/Sinogram.py +
dataloaders.py. Key behavioral contract:
  DICOM -> int16 HU (slope/intercept, -2000 sentinel -> 0)
  'full*' presets: dicom_normalize HU [-1024,3072] -> [0,1]
  'window*' presets: HU window (abdomen [-160,240], brain [0,80]) -> [0,1]
  '*_patch': foreground crop (n_100 > 0) -> pad to 64 -> 8 random 64x64 crops
  aug: rot90 / flip / rotate +-15 deg, each p=0.1
"""

from mtd_gan_tpu.data.dicom import (
    DicomImage,
    get_pixels_hu,
    read_dicom,
    write_dicom_like,
    write_synthetic_dicom,
)
from mtd_gan_tpu.data.transforms import (
    WINDOW_PRESETS,
    dicom_normalize,
    dicom_denormalize,
    make_train_preprocess,
    make_eval_preprocess,
    scale_intensity_range,
)
from mtd_gan_tpu.data.pipeline import (
    PairedDicomDataset,
    prefetch_to_device,
    train_loader,
    eval_loader,
)

__all__ = [
    "DicomImage", "read_dicom", "get_pixels_hu", "write_dicom_like",
    "write_synthetic_dicom", "WINDOW_PRESETS", "dicom_normalize",
    "dicom_denormalize", "scale_intensity_range", "make_train_preprocess",
    "make_eval_preprocess", "PairedDicomDataset", "train_loader",
    "eval_loader", "prefetch_to_device",
]
