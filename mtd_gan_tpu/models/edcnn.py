"""EDCNN — edge-enhanced dense CNN denoiser.

Parity target: reference arch/EDCNN/networks.py:9-161.
  * SobelConv: fixed 4-direction edge bank (horizontal / vertical / two
    diagonals, cycled over output channels) times a trainable per-channel
    scalar factor, plus trainable bias (:9-85).
  * Trunk: 8 dense blocks, each (1x1 conv -> 3x3 conv, LeakyReLU) re-
    concatenating [x, sobel(x)]; residual output relu(x + out) (:88-161).
  * Loss: CompoundLoss = MSE + 0.01 * ResNet50-block feature MSE
    (arch/EDCNN/compound_loss.py:43-73).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.ops.layers import Conv

Array = jax.Array


def edcnn_sobel_bank(kernel_size: int, out_channels: int, in_channels: int) -> np.ndarray:
    """Fixed Sobel bank (HWIO), exact reference fill pattern (:40-63)."""
    k = kernel_size
    mid = k // 2
    w = np.zeros((out_channels, in_channels, k, k), np.float32)
    for idx in range(out_channels):
        if idx % 4 == 0:
            w[idx, :, 0, :] = -1; w[idx, :, 0, mid] = -2
            w[idx, :, -1, :] = 1; w[idx, :, -1, mid] = 2
        elif idx % 4 == 1:
            w[idx, :, :, 0] = -1; w[idx, :, mid, 0] = -2
            w[idx, :, :, -1] = 1; w[idx, :, mid, -1] = 2
        elif idx % 4 == 2:
            w[idx, :, 0, 0] = -2
            for i in range(mid + 1):
                w[idx, :, mid - i, i] = -1
                w[idx, :, k - 1 - i, mid + i] = 1
            w[idx, :, -1, -1] = 2
        else:
            w[idx, :, -1, 0] = -2
            for i in range(mid + 1):
                w[idx, :, mid + i, i] = -1
                w[idx, :, i, mid + i] = 1
            w[idx, :, 0, -1] = 2
    return w.transpose(2, 3, 1, 0)  # OIHW -> HWIO


class SobelConv(nn.Module):
    out_channels: int = 32
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        bank = jnp.asarray(edcnn_sobel_bank(self.kernel_size, self.out_channels, in_ch))
        factor = self.param("sobel_factor", nn.initializers.ones,
                            (self.out_channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,), jnp.float32)
        kernel = bank * factor[None, None, None, :]
        pad = self.kernel_size // 2
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)


class EDCNN(nn.Module):
    out_ch: int = 32
    sobel_ch: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        lrelu = lambda z: nn.leaky_relu(z, 0.01)  # torch LeakyReLU default
        sob = SobelConv(self.sobel_ch, name="conv_sobel")(x)
        out_0 = jnp.concatenate([x, sob], axis=-1)

        h = out_0
        for i in range(1, 8):
            p = Conv(self.out_ch, kernel_size=(1, 1), padding=0,
                     torch_init=True, dtype=self.dtype,
                     name=f"conv_p{i}")(h)
            f = Conv(self.out_ch, kernel_size=(3, 3), padding=1,
                     torch_init=True, dtype=self.dtype,
                     name=f"conv_f{i}")(lrelu(p))
            h = jnp.concatenate([out_0, lrelu(f)], axis=-1)

        p8 = Conv(self.out_ch, kernel_size=(1, 1), padding=0,
                  torch_init=True, dtype=self.dtype,
                  name="conv_p8")(h)
        f8 = Conv(1, kernel_size=(3, 3), padding=1,
                  torch_init=True, dtype=self.dtype,
                  name="conv_f8")(lrelu(p8))
        # the reference's `self.relu` is nn.LeakyReLU() — the output
        # activation leaks too (arch/EDCNN/networks.py:124,159)
        return lrelu(x + f8)


class EDCNNModel:
    """Supervised wrapper with CompoundLoss."""

    name = "EDCNN"

    def __init__(self, out_ch: int = 32, sobel_ch: int = 32, dtype=None,
                 feature_fn=None, use_feature_loss: bool = True):
        self.net = EDCNN(out_ch=out_ch, sobel_ch=sobel_ch, dtype=dtype)
        if use_feature_loss:
            self._loss = losses.make_compound_loss(feature_fn)
        else:
            self._loss = losses.l2

    def init(self, rng, sample_shape=(1, 64, 64, 1)):
        return jax.jit(self.net.init)(rng, jnp.zeros(sample_shape, jnp.float32))["params"]

    def apply(self, params, x):
        return self.net.apply({"params": params}, x)

    def loss(self, params, x, y, rng=None):
        pred = self.apply(params, x)
        val = self._loss(pred, y)
        return val, {"loss": val}
