"""Extended metric tests: 3-D SSIM, MS-SSIM, TV, GMSD, KID."""

import jax
import jax.numpy as jnp
import numpy as np

from mtd_gan_tpu.metrics.extra import gmsd, kid, ms_ssim, ssim3d, total_variation


def test_ssim3d_identity(rng):
    v = jax.random.uniform(rng, (1, 16, 16, 16, 1))
    assert abs(float(ssim3d(v, v)) - 1.0) < 1e-6
    v2 = jnp.clip(v + 0.1, 0, 1)
    assert float(ssim3d(v, v2)) < 1.0


def test_ms_ssim_identity_and_order(rng):
    x = jax.random.uniform(rng, (1, 176, 176, 1))
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-5
    near = jnp.clip(x + 0.01, 0, 1)
    far = jnp.clip(x + 0.2, 0, 1)
    assert float(ms_ssim(x, near)) > float(ms_ssim(x, far))


def test_total_variation_analytic():
    x = jnp.zeros((1, 4, 4, 1)).at[:, :, 2:, :].set(1.0)
    # horizontal edges: 4 rows x 1 transition = 4; vertical: 0
    assert abs(float(total_variation(x)) - 4.0) < 1e-6


def test_gmsd_zero_on_identity(rng):
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    assert float(gmsd(x, x)) < 1e-6
    assert float(gmsd(x, jnp.clip(x + 0.3, 0, 1))) > 0.0


def test_kid_properties(np_rng):
    a = np_rng.standard_normal((100, 16))
    b = np_rng.standard_normal((100, 16)) + 1.0
    assert abs(kid(a, a[::-1])) < kid(a, b)
    assert kid(a, b) > 0
