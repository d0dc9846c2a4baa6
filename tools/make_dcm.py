#!/usr/bin/env python
"""Export model predictions (.npy, [0,1] normalized) back to a DICOM series.

Parity target: reference module/Make_DCM_file.py:1-81 (standalone npy ->
DICOM export; the reference copy has broken imports — this one works).
Each prediction is denormalized to HU and written into a copy of its source
DICOM so all patient/geometry headers are preserved.

Usage:
  python tools/make_dcm.py --pred-dir preds/npy --src-dir data/test/L506/n_20 \
      --out-dir preds/dcm
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mtd_gan_tpu.data.dicom import write_dicom_like  # noqa: E402
from mtd_gan_tpu.data.pipeline import natural_sort  # noqa: E402
from mtd_gan_tpu.data.transforms import WINDOW_PRESETS, dicom_denormalize  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred-dir", required=True, help="directory of .npy predictions")
    p.add_argument("--src-dir", required=True, help="directory of source DICOMs")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--normalization", default="full",
                   choices=["full", "window_abdomen", "window_brain"],
                   help="how predictions were normalized to [0,1]")
    args = p.parse_args()

    preds = natural_sort(glob.glob(os.path.join(args.pred_dir, "*.npy")))
    srcs = natural_sort(
        glob.glob(os.path.join(args.src_dir, "*.IMA"))
        + glob.glob(os.path.join(args.src_dir, "*.dcm"))
    )
    if len(preds) != len(srcs):
        raise SystemExit(f"{len(preds)} predictions vs {len(srcs)} sources")

    for pred_path, src_path in zip(preds, srcs):
        pred = np.squeeze(np.load(pred_path)).astype(np.float64)
        if args.normalization == "full":
            hu = np.asarray(dicom_denormalize(pred))
        else:
            a_min, a_max = WINDOW_PRESETS[
                "abdomen" if "abdomen" in args.normalization else "brain"
            ]
            hu = pred * (a_max - a_min) + a_min
        out = os.path.join(args.out_dir,
                           os.path.basename(src_path) + ".denoised.dcm")
        write_dicom_like(src_path, hu.astype(np.int16), out)
        print(out)


if __name__ == "__main__":
    main()
