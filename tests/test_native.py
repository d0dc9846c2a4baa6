"""Native DICOM codec: build, decode parity vs the Python codec."""

import numpy as np
import pytest

from mtd_gan_tpu.data import dicom as D
from mtd_gan_tpu.data import native


def test_native_decode_matches_python(tmp_path, np_rng):
    hu = (np_rng.integers(-1024, 3000, (64, 96))).astype(np.int16)
    stored = (hu.astype(np.int32) + 1024).astype(np.uint16)
    path = str(tmp_path / "x.dcm")
    D.write_synthetic_dicom(path, stored, slope=1.0, intercept=-1024.0)

    if not native.native_available():
        pytest.skip("no g++ available to build the native codec")
    got = native.decode_hu(path)
    assert got is not None and got.shape == (64, 96)
    np.testing.assert_array_equal(got, D.get_pixels_hu(path))


def test_native_rejects_garbage(tmp_path):
    if not native.native_available():
        pytest.skip("no g++")
    p = str(tmp_path / "junk.dcm")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    assert native.decode_hu(p) is None
