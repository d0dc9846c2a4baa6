"""Artifact writers: grayscale PNGs (epoch triptychs / per-slice test
outputs, reference engine.py:101-103,157-159), per-slice metric CSVs
(engine.py:169-177), and DICOM exports (via data.dicom.write_dicom_like)."""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np


def save_png_gray(path: str, img: np.ndarray) -> None:
    """Save a [0,1] float or uint8 2-D array as grayscale PNG."""
    from PIL import Image

    arr = np.asarray(img)
    arr = np.squeeze(arr)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr, mode="L").save(path)


def save_csv(path: str, rows: List[Dict], columns: Sequence[str] = None) -> None:
    import pandas as pd

    df = pd.DataFrame(rows)
    if columns:
        df = df[list(columns)]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df.to_csv(path, index=False)
