"""Feature-space metrics: PL (VGG perceptual) and TML (Gram texture matching).

Parity targets:
  compute_PL  -> reference metrics.py:93-106 (5-slice VGG19, weights
                 [1/32..1], L1 between feature maps)
  compute_TML -> reference metrics.py:109-168 (features cut into 16x16
                 patches via unfold, per-patch Gram matrices, weighted L1)

Fixes reference quirk #7 (SURVEY.md §5): the extractor is built ONCE and
jitted, not re-instantiated per batch (metrics.py:21,94,157).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_WEIGHTS = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)


@lru_cache(maxsize=1)
def _vgg_fn():
    from mtd_gan_tpu.features import get_vgg_slices_fn

    return get_vgg_slices_fn()


def perceptual_loss(x: Array, y: Array, feature_fn=None) -> Array:
    """PL: weighted L1 between VGG19 slice activations of x and y."""
    fn = feature_fn or _vgg_fn()
    fx, fy = fn(x), fn(y)
    return sum(w * jnp.mean(jnp.abs(a - b)) for w, a, b in zip(_WEIGHTS, fx, fy))


def _patch_grams(feat: Array, patch: int = 16) -> Array:
    """NHWC features -> per-16x16-patch Gram matrices (B*L, C, C)."""
    b, h, w, c = feat.shape
    lh, lw = h // patch, w // patch
    # non-overlapping patches (torch Unfold k=s=16)
    f = feat[:, : lh * patch, : lw * patch, :]
    f = f.reshape(b, lh, patch, lw, patch, c)
    f = f.transpose(0, 1, 3, 5, 2, 4)  # b, lh, lw, c, p, p
    f = f.reshape(b * lh * lw, c, patch * patch)
    return jnp.einsum("ncp,ndp->ncd", f, f)


def texture_matching_loss(x: Array, y: Array, feature_fn=None,
                          patch: int = 16) -> Array:
    """TML: weighted L1 between patchwise Gram matrices of VGG features."""
    fn = feature_fn or _vgg_fn()
    fx, fy = fn(x), fn(y)
    total = jnp.float32(0.0)
    for w_, a, b in zip(_WEIGHTS, fx, fy):
        total = total + w_ * jnp.mean(
            jnp.abs(_patch_grams(a, patch) - _patch_grams(b, patch))
        )
    return total


def compute_pl(inp: Array, target: Array, pred: Array) -> Tuple[Array, Array, Array]:
    fn = _vgg_fn()
    return (
        perceptual_loss(inp, target, fn),
        perceptual_loss(target, target, fn),
        perceptual_loss(pred, target, fn),
    )


def compute_tml(inp: Array, target: Array, pred: Array) -> Tuple[Array, Array, Array]:
    fn = _vgg_fn()
    return (
        texture_matching_loss(inp, target, fn),
        texture_matching_loss(target, target, fn),
        texture_matching_loss(pred, target, fn),
    )
