"""Pallas fused spectral-branch kernel vs the jnp.fft composition
(interpret mode — runs on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.ops.pallas_fftconv import (spectral_branch_fused,
                                            spectral_branch_tiled)


def _reference(x, mix, bias):
    h, w = x.shape[1], x.shape[2]
    z = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
    sp = jnp.concatenate([z.real, z.imag], axis=-1)
    sp = jax.nn.relu(sp @ mix + bias)
    re, im = jnp.split(sp, 2, axis=-1)
    return jnp.fft.irfft2(jax.lax.complex(re, im), s=(h, w), axes=(1, 2),
                          norm="ortho")


@pytest.mark.parametrize("shape", [(2, 64, 64, 8), (1, 32, 32, 4)])
def test_pallas_spectral_branch_matches_fft(rng, shape):
    n, h, w, c = shape
    x = jax.random.uniform(rng, shape, jnp.float32)
    mix = jax.random.normal(jax.random.PRNGKey(1), (2 * c, 2 * c)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(2), (2 * c,)) * 0.1

    want = _reference(x, mix, bias)
    got = spectral_branch_fused(x, mix, bias, precision="highest",
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    got = spectral_branch_tiled(x, mix, bias, precision="tf32",
                                th=h // 2, tk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)


def test_generator_pallas_tiled_matches_auto(rng):
    """ResFFTGenerator with spectral_impl='pallas_tiled' (interpret mode on
    CPU) == the einsum/fft path on the same params."""
    from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator

    gen = ResFFTGenerator(features=4, num_layers=1)
    gen_tiled = ResFFTGenerator(features=4, num_layers=1,
                                spectral_impl="pallas_tiled")
    x = jax.random.uniform(rng, (1, 64, 64, 1), jnp.float32)
    params = jax.jit(gen.init)(rng, x)["params"]
    want = gen.apply({"params": params}, x)
    got = gen_tiled.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_generator_pallas_fused_matches_auto(rng):
    """spectral_impl='pallas_fused' (per-sample kernel, interpret on CPU)
    == the einsum/fft path on the same params."""
    from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator

    gen = ResFFTGenerator(features=4, num_layers=1)
    gen_fused = ResFFTGenerator(features=4, num_layers=1,
                                spectral_impl="pallas_fused")
    x = jax.random.uniform(rng, (2, 32, 32, 1), jnp.float32)
    params = jax.jit(gen.init)(rng, x)["params"]
    want = gen.apply({"params": params}, x)
    got = gen_fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)
