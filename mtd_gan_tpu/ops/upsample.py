"""Fast exact 2x bilinear upsampling (half-pixel centers).

`jax.image.resize(..., method="bilinear")` lowers to gathers whose
TRANSPOSE (the VJP the discriminator backward runs 3x per PCGrad step)
is a scatter — measured ~15 ms/step of the MTD-GAN train step on TPU
v5e. For the exact-2x case the resize is a fixed 2-tap stencil, so it
lowers to shift-adds + an interleave instead, and its VJP is again just
slice-adds: no gather/scatter anywhere.

Derivation (1-D, half-pixel centers, scale 2 — the semantics of both
`jax.image.resize` bilinear and torch `Upsample(align_corners=False)`,
reference arch/Ours/networks.py SEG decoder + arch/DUGAN/networks.py
UpBlock): output j sits at source coordinate (j + 0.5)/2 - 0.5, i.e.

    y[2k]   = 0.75 * x[k] + 0.25 * x[k-1]      (edge-clamped)
    y[2k+1] = 0.75 * x[k] + 0.25 * x[k+1]      (edge-clamped)

At the edges both the clamp and jax.image's renormalized-kernel handling
give y = x exactly (0.75 + 0.25 of the same pixel), so the equivalence
is exact up to float rounding (pinned in tests/test_misc_ops.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _up2_axis(x: Array, axis: int) -> Array:
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    prev = jnp.concatenate(
        [first, lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis)
    nxt = jnp.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis), last], axis)
    lo = 0.75 * x + 0.25 * prev   # even outputs
    hi = 0.75 * x + 0.25 * nxt    # odd outputs
    y = jnp.stack([lo, hi], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def upsample2x_bilinear(x: Array) -> Array:
    """(N, H, W, C) -> (N, 2H, 2W, C); exact-equivalent of
    jax.image.resize(x, (N, 2H, 2W, C), method="bilinear")."""
    return _up2_axis(_up2_axis(x, 1), 2)
