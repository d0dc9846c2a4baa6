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


def test_dft_matmul_grads_match_fft_path(np_rng):
    """The combined-factor einsums are the TRAINING spectral path on TPU:
    their VJP must match differentiating the jnp.fft implementation (the
    CPU/GPU path golden tests run against)."""
    h, w, c = 16, 16, 2
    x = jnp.asarray(np_rng.standard_normal((2, h, w, c)).astype(np.float32))
    cot = jnp.asarray(np_rng.standard_normal((2, h, w, c)).astype(np.float32))
    mix = jnp.asarray(
        np_rng.standard_normal((2 * c, 2 * c)).astype(np.float32))

    def via_matmul(inp):
        zr, zi = rfft2_matmul(inp)
        spec = jnp.concatenate([zr, zi], axis=-1) @ mix
        spec = jax.nn.relu(spec)
        re, im = jnp.split(spec, 2, axis=-1)
        return jnp.sum(irfft2_matmul(re, im, (h, w)) * cot)

    def via_fft(inp):
        z = jnp.fft.rfft2(inp, axes=(1, 2), norm="ortho")
        spec = jnp.concatenate([z.real, z.imag], axis=-1) @ mix
        spec = jax.nn.relu(spec)
        re, im = jnp.split(spec, 2, axis=-1)
        out = jnp.fft.irfft2(
            jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho")
        return jnp.sum(out * cot)

    g1 = jax.grad(via_matmul)(x)
    g2 = jax.grad(via_fft)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5)


def test_bf16x2_transforms_track_fp32(np_rng):
    """The bf16-training spectral path (2-pass hi/lo dots, bf16 stage
    boundaries) must track the fp32 transforms to bf16-rounding accuracy
    and stay differentiable."""
    from mtd_gan_tpu.ops.dft import irfft2_matmul_bf16x2, rfft2_matmul_bf16x2

    h = w = 64
    x = jnp.asarray(np_rng.standard_normal((2, h, w, 4)).astype(np.float32))
    zr, zi = rfft2_matmul(x)
    zr2, zi2 = rfft2_matmul_bf16x2(x)
    np.testing.assert_allclose(np.asarray(zr2), np.asarray(zr), atol=3e-2)
    np.testing.assert_allclose(np.asarray(zi2), np.asarray(zi), atol=3e-2)

    rt = irfft2_matmul_bf16x2(zr, zi, (h, w))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(x), atol=5e-2)

    def loss(inp):
        a, b = rfft2_matmul_bf16x2(inp)
        return jnp.sum(irfft2_matmul_bf16x2(a, b, (h, w)) ** 2)

    g = jax.grad(loss)(x)
    # d/dx sum(roundtrip(x)^2) ~= 2x (transforms are near-orthonormal)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=0.1)
