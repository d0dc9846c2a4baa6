"""Pallas fused spectral-branch kernel vs the jnp.fft composition
(interpret mode — runs on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.ops.pallas_fftconv import spectral_branch_pallas


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

    got = spectral_branch_pallas(x, mix, bias, interpret=True)
    want = _reference(x, mix, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
