"""Unfold / Fold (im2col and its adjoint) on NHWC tensors with
torch-compatible (C, kh, kw) feature ordering — the CTformer tokenizer's
soft-split ops (reference arch/CTformer/networks.py:44-47 use nn.Unfold /
nn.Fold with stride and dilation).

Unfold lowers to XLA's conv_general_dilated_patches (one fused gather);
Fold is its adjoint implemented as kh*kw strided scatter-adds (static
positions — fully vectorized, no per-patch loop).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def unfold(
    x: Array, kernel: Tuple[int, int],
    stride: Tuple[int, int] = (1, 1), dilation: Tuple[int, int] = (1, 1),
) -> Array:
    """NHWC (B,H,W,C) -> (B, C*kh*kw, L) with torch nn.Unfold semantics
    (features ordered channel-major: c0k00, c0k01, ..., c1k00, ...)."""
    b, h, w, c = x.shape
    kh, kw = kernel
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(kh, kw), window_strides=stride, padding="VALID",
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, Lh, Lw, C*kh*kw) with feature ordering (c, kh, kw)
    b2, lh, lw, f = patches.shape
    return patches.reshape(b2, lh * lw, f).transpose(0, 2, 1)


def fold(
    patches: Array, output_size: Tuple[int, int], kernel: Tuple[int, int],
    stride: Tuple[int, int] = (1, 1), dilation: Tuple[int, int] = (1, 1),
) -> Array:
    """torch nn.Fold: (B, C*kh*kw, L) -> NHWC (B, H, W, C), summing
    overlapping contributions."""
    b, f, l = patches.shape
    kh, kw = kernel
    sh, sw = stride
    dh, dw = dilation
    h, w = output_size
    c = f // (kh * kw)
    lh = (h - dh * (kh - 1) - 1) // sh + 1
    lw = (w - dw * (kw - 1) - 1) // sw + 1
    assert lh * lw == l, f"fold: L={l} != {lh}x{lw}"

    p = patches.reshape(b, c, kh, kw, lh, lw)
    out = jnp.zeros((b, c, h, w), patches.dtype)
    for i in range(kh):
        for j in range(kw):
            out = out.at[
                :, :, i * dh : i * dh + sh * lh : sh, j * dw : j * dw + sw * lw : sw
            ].add(p[:, :, i, j])
    return out.transpose(0, 2, 3, 1)
