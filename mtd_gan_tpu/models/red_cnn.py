"""RED-CNN — residual encoder-decoder CNN denoiser.

Parity target: reference arch/RED_CNN/networks.py:7-47 (5 conv5x5 VALID +
5 deconv5x5, residual adds at input / after conv2 / after conv4, final ReLU,
self-contained MSE loss), 96 channels, trained on 64x64 window patches
(reference engine.py:192-298).

TPU notes: VALID 5x5 convs on 64x64x96 lower straight onto the MXU; the whole
forward is one fused XLA computation. `bfloat16` compute is available via
`dtype` (params stay fp32).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.ops.layers import Conv, ConvTranspose

Array = jax.Array


class REDCNN(nn.Module):
    out_ch: int = 96
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = lambda name: Conv(
            self.out_ch,
            kernel_size=(5, 5),
            padding="VALID",
            torch_init=True,
            dtype=self.dtype,
            name=name,
        )
        deconv = lambda feats, name: ConvTranspose(
            feats,
            kernel_size=(5, 5),
            padding=0,
            torch_init=True,
            dtype=self.dtype,
            name=name,
        )

        residual_1 = x
        out = nn.relu(conv("conv1")(x))
        out = nn.relu(conv("conv2")(out))
        residual_2 = out
        out = nn.relu(conv("conv3")(out))
        out = nn.relu(conv("conv4")(out))
        residual_3 = out
        out = nn.relu(conv("conv5")(out))

        out = deconv(self.out_ch, "tconv1")(out) + residual_3
        out = deconv(self.out_ch, "tconv2")(nn.relu(out))
        out = deconv(self.out_ch, "tconv3")(nn.relu(out)) + residual_2
        out = deconv(self.out_ch, "tconv4")(nn.relu(out))
        out = deconv(1, "tconv5")(nn.relu(out)) + residual_1
        return nn.relu(out)


class REDCNNModel:
    """Supervised wrapper: loss = MSE (reference arch/RED_CNN/networks.py:25)."""

    name = "RED_CNN"

    def __init__(self, out_ch: int = 96, dtype=None):
        self.net = REDCNN(out_ch=out_ch, dtype=dtype)

    def init(self, rng, sample_shape=(1, 64, 64, 1)):
        variables = jax.jit(self.net.init)(rng, jnp.zeros(sample_shape, jnp.float32))
        return variables["params"]

    def apply(self, params: dict, x: Array) -> Array:
        return self.net.apply({"params": params}, x)

    def loss(self, params: dict, x: Array, y: Array, rng=None):
        pred = self.apply(params, x)
        return losses.l2(pred, y), {"loss": losses.l2(pred, y)}
