"""Data-layer tests: DICOM codec round-trips, windowing parity, patch
sampling invariants — all on synthetic fixtures (no PHI; SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.data import dicom as D
from mtd_gan_tpu.data import transforms as T
from mtd_gan_tpu.data.pipeline import PairedDicomDataset, eval_loader, train_loader


@pytest.fixture
def phantom(np_rng):
    """Synthetic CT slice in HU: air background (-1000), soft-tissue disk."""
    h = w = 128
    yy, xx = np.mgrid[:h, :w]
    disk = ((yy - 64) ** 2 + (xx - 64) ** 2) < 40**2
    hu = np.full((h, w), -1000, np.int16)
    hu[disk] = (40 + 10 * np_rng.standard_normal(disk.sum())).astype(np.int16)
    return hu


def test_dicom_roundtrip(tmp_path, phantom):
    path = str(tmp_path / "slice.dcm")
    # stored values = HU - intercept (classic CT encoding)
    stored = (phantom.astype(np.int32) + 1024).astype(np.uint16)
    D.write_synthetic_dicom(path, stored, slope=1.0, intercept=-1024.0)
    img = D.read_dicom(path)
    assert (img.rows, img.cols) == (128, 128)
    assert img.rescale_intercept == -1024.0
    hu = D.get_pixels_hu(path)
    np.testing.assert_array_equal(hu, phantom)


def test_dicom_rewrite_pixels(tmp_path, phantom):
    src = str(tmp_path / "src.dcm")
    out = str(tmp_path / "out.dcm")
    stored = (phantom.astype(np.int32) + 1024).astype(np.uint16)
    D.write_synthetic_dicom(src, stored, intercept=-1024.0)
    new_hu = np.clip(phantom.astype(np.int32) + 7, -1024, 3071).astype(np.int16)
    D.write_dicom_like(src, new_hu, out)
    np.testing.assert_array_equal(D.get_pixels_hu(out), new_hu)
    # header preserved byte-for-byte
    a, b = D.read_dicom(src), D.read_dicom(out)
    assert a.raw[: a.pixel_offset] == b.raw[: b.pixel_offset]


def test_windowing_parity():
    hu = jnp.asarray([[-1024.0, -160.0, 40.0, 240.0, 3000.0]])
    win = T.scale_intensity_range(hu, -160.0, 240.0)
    np.testing.assert_allclose(np.asarray(win[0]), [0, 0, 0.5, 1.0, 1.0], atol=1e-6)
    full = T.dicom_normalize(hu)
    np.testing.assert_allclose(float(full[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(T.dicom_denormalize(full)[0, 4]), 3000.0, atol=1e-3
    )


def test_train_preprocess_window_patch(rng, phantom):
    pre = T.make_train_preprocess("window_patch", "mayo", patch=64, num_samples=8)
    hu = jnp.asarray(phantom)[None, :, :, None].astype(jnp.int16)
    x, y = pre(rng, hu, hu)
    assert x.shape == (8, 64, 64, 1)  # B=1 x 8 samples flattened
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # crops confined to (padded) foreground: every patch overlaps the disk
    assert float(jnp.max(x)) > 0.0
    # paired transform: x == y when inputs identical
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_train_preprocess_full(rng, phantom):
    pre = T.make_train_preprocess("full", "mayo")
    hu = jnp.stack([jnp.asarray(phantom)] * 2)[..., None].astype(jnp.int16)
    x, y = pre(rng, hu, hu)
    assert x.shape == (2, 128, 128, 1)


def test_eval_preprocess(phantom):
    pre = T.make_eval_preprocess("window", "mayo")
    hu = jnp.asarray(phantom)[None, :, :, None].astype(jnp.int16)
    x, y = pre(hu, hu)
    assert x.shape == (1, 128, 128, 1)
    assert float(x.max()) <= 1.0


def test_paired_dataset_and_loaders(tmp_path, phantom):
    stored = (phantom.astype(np.int32) + 1024).astype(np.uint16)
    for split in ["train"]:
        for case in ["L067", "L096"]:
            for i in range(3):
                for key in ["n_20", "n_100"]:
                    D.write_synthetic_dicom(
                        str(tmp_path / split / case / key / f"{i:04d}.dcm"), stored
                    )
    ds = PairedDicomDataset(str(tmp_path), "train")
    assert len(ds) == 6
    batches = list(train_loader(ds, batch_size=2, num_threads=2))
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 128, 128, 1)
    assert batches[0][0].dtype == np.int16

    evals = list(eval_loader(ds, batch_size=1))
    assert len(evals) == 6
    x, y, paths = evals[0]
    assert x.shape == (1, 128, 128, 1) and len(paths) == 1
    assert paths[0].endswith("0000.dcm")


def test_brain_window_preset(rng, phantom):
    """'amc' dataset -> brain window [0, 80] HU (reference Sinogram.py:103)."""
    pre = T.make_eval_preprocess("window", "amc")
    hu = jnp.asarray([[[-10.0], [0.0], [40.0], [80.0], [200.0]]])[None]
    x, _ = pre(hu.astype(jnp.int16), hu.astype(jnp.int16))
    np.testing.assert_allclose(
        np.asarray(x[0, 0, :, 0]), [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)
