"""Extended metric tests: 3-D SSIM, MS-SSIM, TV, GMSD, KID."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_gs_rlt_hand_cases():
    """Pure-numpy RLT statistics of the geometry score (the gudhi-free part
    of reference module/piq/gs.py:18-63)."""
    from mtd_gan_tpu.metrics.extra import _gs_rlt

    # no intervals: beta_1 == 0 always
    rlt = _gs_rlt(np.zeros((0, 2)), alpha_max=2.0)
    assert rlt[0] == 1.0 and rlt[1:].sum() == 0

    # one hole alive over [0.5, 1.5] of alpha_max 2: beta_1=1 half the time
    rlt = _gs_rlt(np.array([[0.5, 1.5]]), alpha_max=2.0)
    np.testing.assert_allclose(rlt[:2], [0.5, 0.5])

    # inf death clamps to alpha_max; overlapping intervals stack
    rlt = _gs_rlt(np.array([[0.0, np.inf], [1.0, 2.0]]), alpha_max=2.0)
    np.testing.assert_allclose(rlt[:3], [0.0, 0.5, 0.5])


def test_gs_gudhi_gate():
    from mtd_gan_tpu.metrics.extra import geometry_score

    feats = np.random.RandomState(0).randn(32, 4)
    try:
        import gudhi  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="gudhi"):
            geometry_score(feats, feats, num_iters=1)
    else:
        score = geometry_score(feats, feats + 0.1, sample_size=8,
                               num_iters=2)
        assert np.isfinite(score)
