"""Attention-gated skip connections and squeeze-excitation blocks.

Parity target: reference module/skip_attention.py:4-53 (SkipAttentionBlock:
additive attention gate over (skip, gating) pair; SCSEModule: concurrent
channel + spatial squeeze-excitation). Unreferenced by the reference
pipeline but part of its component inventory (SURVEY.md §2.8) — kept as
reusable building blocks for discriminator/decoder variants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu.ops.layers import Conv

Array = jax.Array


class SkipAttentionBlock(nn.Module):
    """Additive attention gate: psi = sigmoid(conv(relu(W_g g + W_x x)));
    returns x * psi (Attention-UNet style)."""

    inter_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, g: Array) -> Array:
        wg = Conv(self.inter_channels, kernel_size=(1, 1), padding=0,
                  dtype=self.dtype, name="W_g")(g)
        wx = Conv(self.inter_channels, kernel_size=(1, 1), padding=0,
                  dtype=self.dtype, name="W_x")(x)
        psi = nn.relu(wg + wx)
        psi = Conv(1, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                   name="psi")(psi)
        return x * jax.nn.sigmoid(psi)


class SCSEModule(nn.Module):
    """Concurrent spatial & channel squeeze-excitation."""

    reduction: int = 16
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        # channel SE
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(max(c // self.reduction, 1), kernel_size=(1, 1), padding=0,
                 dtype=self.dtype, name="cse_fc1")(s)
        s = nn.relu(s)
        s = Conv(c, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                 name="cse_fc2")(s)
        cse = x * jax.nn.sigmoid(s)
        # spatial SE
        sse = x * jax.nn.sigmoid(
            Conv(1, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                 name="sse")(x)
        )
        return cse + sse
