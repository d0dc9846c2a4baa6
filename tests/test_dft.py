"""DFT-as-matmul numerics vs numpy FFT (exact on CPU fp32 matmuls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.ops.dft import irfft2_matmul, rfft2_matmul


@pytest.mark.parametrize("shape", [(2, 16, 16, 3), (1, 32, 24, 2), (1, 17, 15, 1)])
def test_rfft2_matmul_matches_numpy(np_rng, shape):
    x = np_rng.standard_normal(shape).astype(np.float32)
    zr, zi = rfft2_matmul(jnp.asarray(x))
    ref = np.fft.rfft2(x, axes=(1, 2), norm="ortho")
    np.testing.assert_allclose(np.asarray(zr), ref.real, atol=2e-5)
    np.testing.assert_allclose(np.asarray(zi), ref.imag, atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 16, 16, 3), (1, 17, 15, 1)])
def test_irfft2_matmul_roundtrip(np_rng, shape):
    x = np_rng.standard_normal(shape).astype(np.float32)
    zr, zi = rfft2_matmul(jnp.asarray(x))
    rt = irfft2_matmul(zr, zi, (shape[1], shape[2]))
    np.testing.assert_allclose(np.asarray(rt), x, atol=5e-5)


def test_irfft2_matmul_matches_numpy_on_arbitrary_spectrum(np_rng):
    """Non-Hermitian-consistent half spectra must still match numpy irfft2
    (the channel-mixed spectrum in the FFT block is arbitrary)."""
    h, w = 16, 16
    k = w // 2 + 1
    zr = np_rng.standard_normal((1, h, k, 2)).astype(np.float32)
    zi = np_rng.standard_normal((1, h, k, 2)).astype(np.float32)
    got = irfft2_matmul(jnp.asarray(zr), jnp.asarray(zi), (h, w))
    ref = np.fft.irfft2(
        (zr + 1j * zi).transpose(0, 3, 1, 2), s=(h, w), norm="ortho"
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5)
