"""PixelShuffle (depth-to-space) and the 1x1-conv + shuffle upsample block
used by the REC decoder (reference arch/Ours/networks.py:166-175).

Channel ordering matches torch nn.PixelShuffle so torch-trained weights
import cleanly: input channel index c*r*r + i*r + j maps to output channel c
at spatial offset (i, j).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu.ops.layers import Conv, normal_init

Array = jax.Array


def pixel_shuffle(x: Array, scale: int) -> Array:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C), torch channel order."""
    n, h, w, crr = x.shape
    c = crr // (scale * scale)
    x = x.reshape(n, h, w, c, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, c
    return x.reshape(n, h * scale, w * scale, c)


class PixelShuffleUpsample(nn.Module):
    """1x1 conv to out*scale^2 channels followed by pixel shuffle."""

    features: int
    scale: int = 2
    spectral_norm: bool = False
    kernel_init: Callable = normal_init(0.01)

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Array:
        y = Conv(
            self.features * self.scale**2,
            kernel_size=(1, 1),
            padding=0,
            spectral_norm=self.spectral_norm,
            kernel_init=self.kernel_init,
            name="proj",
        )(x, update_stats=update_stats)
        return pixel_shuffle(y, self.scale)
