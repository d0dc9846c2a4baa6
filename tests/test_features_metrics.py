"""Feature extractors + feature-space metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.features import (
    feature_weights_status,
    get_inception_feature_fn,
    get_resnet_feature_fn,
    get_vgg_slices_fn,
)
from mtd_gan_tpu.metrics import fid as fid_lib
from mtd_gan_tpu.metrics import perceptual as perc


def test_vgg_feature_shapes(rng):
    fn = get_vgg_slices_fn()
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    feats = fn(x)
    assert [f.shape for f in feats] == [
        (1, 64, 64, 64), (1, 32, 32, 128), (1, 16, 16, 256),
        (1, 8, 8, 512), (1, 4, 4, 512),
    ]


def test_resnet_feature_shapes(rng):
    fn = get_resnet_feature_fn()
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    feats = fn(x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048),
    ]


def test_inception_feature_shape(rng):
    fn = get_inception_feature_fn()
    x = jax.random.uniform(rng, (2, 64, 64, 1))
    feats = fn(x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))
    assert "inception" in feature_weights_status()


def test_pl_tml_fixture_columns(rng):
    """gt-vs-gt must be exactly 0 (the reference's fixture check).
    TML needs >= 256px inputs so the deepest VGG slice still fits a 16x16
    patch grid (the reference runs it on 512x512 slices only)."""
    x = jax.random.uniform(rng, (1, 256, 256, 1))
    y = jnp.clip(x + 0.05, 0, 1)
    pls = perc.compute_pl(x, y, jnp.clip(x + 0.01, 0, 1))
    assert float(pls[1]) == 0.0  # gt_pl
    assert float(pls[0]) > 0.0
    tmls = perc.compute_tml(x, y, x)
    assert float(tmls[1]) == 0.0
    assert np.isfinite(float(tmls[0]))


def test_frechet_distance_analytic():
    """FID between identical Gaussians is 0; known mean-shift distance."""
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    assert fid_lib.frechet_distance(a, a) < 1e-8
    b = a + 2.0  # pure mean shift: FID = ||mu||^2 = 8*4 = 32
    np.testing.assert_allclose(fid_lib.frechet_distance(a, b), 32.0, atol=1e-6)


def test_corpus_fid_pipeline(rng):
    x = jax.random.uniform(rng, (2, 32, 32, 1))
    y = jnp.clip(x + 0.05, 0, 1)
    fx, fy, fp = fid_lib.compute_feat(x, y, x)
    fids = fid_lib.compute_fid(np.asarray(fx), np.asarray(fy), np.asarray(fp))
    assert fids[1] < 1e-6  # gt vs gt
    assert np.isfinite(fids[0]) and np.isfinite(fids[2])
