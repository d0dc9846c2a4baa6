"""Corpus-level Fréchet Inception Distance.

Parity target: reference metrics.py:17-41 (per-slice InceptionV3 feature
extraction, reference module/piq/fid.py:149-191 Fréchet distance with
float64 covariance and matrix square root).

The Fréchet math is exact (float64, eigendecomposition-based sqrtm of the
symmetrized product). The feature extractor is pluggable: the pt_inception
weights the reference downloads are not available offline, so the default
extractor is the same FID InceptionV3 (pool3, 2048-d) architecture the
reference uses — pretrained pt_inception weights imported when the .pth
exists, seeded deterministic fallback otherwise
(see mtd_gan_tpu.features docstring).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=1)
def default_feature_fn() -> Callable[[Array], Array]:
    from mtd_gan_tpu.features import get_inception_feature_fn

    return get_inception_feature_fn()


def compute_feat(inp: Array, target: Array, pred: Array, feature_fn=None):
    """Per-batch feature triplets, accumulated by the caller for corpus FID
    (reference engine.py:145-146)."""
    fn = feature_fn or default_feature_fn()
    return fn(inp), fn(target), fn(pred)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root via symmetric eigendecomposition (float64)."""
    mat = (mat + mat.T) / 2.0
    vals, vecs = np.linalg.eigh(mat)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(feats_x: np.ndarray, feats_y: np.ndarray) -> float:
    """FID between two feature corpora (N, D), float64 throughout."""
    x = np.asarray(feats_x, np.float64)
    y = np.asarray(feats_y, np.float64)
    mu_x, mu_y = x.mean(0), y.mean(0)
    cov_x = np.cov(x, rowvar=False)
    cov_y = np.cov(y, rowvar=False)

    diff = mu_x - mu_y
    # sqrt of cov_x @ cov_y via the PSD-stabilized product
    sqrt_x = _sqrtm_psd(cov_x)
    covmean = _sqrtm_psd(sqrt_x @ cov_y @ sqrt_x)
    return float(diff @ diff + np.trace(cov_x) + np.trace(cov_y)
                 - 2.0 * np.trace(covmean))


def compute_fid(input_feats, target_feats, pred_feats) -> Tuple[float, float, float]:
    """(input-vs-gt, gt-vs-gt, pred-vs-gt) corpus FIDs (reference
    metrics.py:33-41)."""
    inp = np.asarray(input_feats)
    tgt = np.asarray(target_feats)
    prd = np.asarray(pred_feats)
    return (
        frechet_distance(inp, tgt),
        frechet_distance(tgt, tgt),
        frechet_distance(prd, tgt),
    )
