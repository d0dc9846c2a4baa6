"""Restormer — efficient transformer for high-resolution restoration.

Parity target: reference arch/Restormer/networks.py (config dim 48, blocks
[4,6,6,8], heads [1,2,4,8], ffn x2.66, BiasFree LayerNorm — models.py:31).
  * MDTA: channel-wise attention — qkv 1x1 conv + depthwise 3x3, q/k
    L2-normalized over the pixel axis, (c x c) attention scaled by a
    learnable per-head temperature (:99-130).
  * GDFN: 1x1 expand to 2*hidden, depthwise 3x3, gelu(x1)*x2 gate (:76-93).
  * LayerNorm over channels (bias-free variant divides by sqrt(var)).
  * 4-level U-Net with PixelUnshuffle/Shuffle resizing, skip concat +
    1x1 reduce (levels 3,2), refinement blocks, residual output (:191-283).
  * Loss: L1 (:242).

TPU notes: MDTA's (c x c) Gram attention is pure MXU work at any spatial
size; depthwise convs lower to VPU; NHWC throughout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.ops.layers import Conv
from mtd_gan_tpu.ops.pixel_shuffle import pixel_shuffle

Array = jax.Array


def pixel_unshuffle(x: Array, scale: int) -> Array:
    """(N, H*r, W*r, C) -> (N, H, W, C*r*r), torch channel order."""
    n, hr, wr, c = x.shape
    h, w = hr // scale, wr // scale
    x = x.reshape(n, h, scale, w, scale, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n h w c r r
    return x.reshape(n, h, w, c * scale * scale)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of NHWC (reference to_3d/to_4d dance,
    :19-70); bias_free divides by std only (keeps the mean)."""

    bias_free: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,), jnp.float32)
        var = jnp.var(x, axis=-1, keepdims=True)
        if self.bias_free:
            y = x / jnp.sqrt(var + 1e-5)
        else:
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            mu = jnp.mean(x, axis=-1, keepdims=True)
            y = (x - mu) / jnp.sqrt(var + 1e-5)
            return y * weight.astype(x.dtype) + bias.astype(x.dtype)
        return y * weight.astype(x.dtype)


class MDTA(nn.Module):
    dim: int
    num_heads: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1), jnp.float32
        )
        qkv = Conv(3 * c, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                   dtype=self.dtype, name="qkv")(x)
        qkv = Conv(3 * c, kernel_size=(3, 3), padding=1, use_bias=self.use_bias,
                   feature_group_count=3 * c, dtype=self.dtype,
                   name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):  # (B,H,W,C) -> (B, heads, c_head, HW)
            z = z.reshape(b, h * w, self.num_heads, c // self.num_heads)
            return z.transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = (q @ k.transpose(0, 1, 3, 2)) * temperature.astype(q.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = attn @ v  # (B, heads, c_head, HW)
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return Conv(c, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                    dtype=self.dtype, name="project_out")(out)


class GDFN(nn.Module):
    dim: int
    expansion: float = 2.66
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.dim * self.expansion)
        h = Conv(2 * hidden, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                 dtype=self.dtype, name="project_in")(x)
        h = Conv(2 * hidden, kernel_size=(3, 3), padding=1, use_bias=self.use_bias,
                 feature_group_count=2 * hidden, dtype=self.dtype,
                 name="dwconv")(h)
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = nn.gelu(x1, approximate=False) * x2
        return Conv(self.dim, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                    dtype=self.dtype, name="project_out")(h)


class RestormerBlock(nn.Module):
    dim: int
    num_heads: int
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x + MDTA(self.dim, self.num_heads, self.use_bias, self.dtype,
                     name="attn")(ChannelLayerNorm(self.bias_free_ln,
                                                   name="norm1")(x))
        x = x + GDFN(self.dim, self.expansion, self.use_bias, self.dtype,
                     name="ffn")(ChannelLayerNorm(self.bias_free_ln,
                                                  name="norm2")(x))
        return x


class Restormer(nn.Module):
    inp_channels: int = 1
    out_channels: int = 1
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = True  # 'BiasFree' per models.py:31
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dim
        blk = lambda dim, heads, name: RestormerBlock(
            dim, heads, self.expansion, self.use_bias, self.bias_free_ln,
            self.dtype, name=name)

        def down(z, n_feat, name):
            z = Conv(n_feat // 2, kernel_size=(3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name=name)(z)
            return pixel_unshuffle(z, 2)

        def up(z, n_feat, name):
            z = Conv(n_feat * 2, kernel_size=(3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name=name)(z)
            return pixel_shuffle(z, 2)

        h = Conv(d, kernel_size=(3, 3), padding=1, use_bias=False,
                 dtype=self.dtype, name="patch_embed")(x)
        for i in range(self.num_blocks[0]):
            h = blk(d, self.heads[0], f"enc1_{i}")(h)
        e1 = h

        h = down(e1, d, "down1_2")
        for i in range(self.num_blocks[1]):
            h = blk(d * 2, self.heads[1], f"enc2_{i}")(h)
        e2 = h

        h = down(e2, d * 2, "down2_3")
        for i in range(self.num_blocks[2]):
            h = blk(d * 4, self.heads[2], f"enc3_{i}")(h)
        e3 = h

        h = down(e3, d * 4, "down3_4")
        for i in range(self.num_blocks[3]):
            h = blk(d * 8, self.heads[3], f"latent_{i}")(h)

        h = up(h, d * 8, "up4_3")
        h = jnp.concatenate([h, e3], axis=-1)
        h = Conv(d * 4, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                 dtype=self.dtype, name="reduce3")(h)
        for i in range(self.num_blocks[2]):
            h = blk(d * 4, self.heads[2], f"dec3_{i}")(h)

        h = up(h, d * 4, "up3_2")
        h = jnp.concatenate([h, e2], axis=-1)
        h = Conv(d * 2, kernel_size=(1, 1), padding=0, use_bias=self.use_bias,
                 dtype=self.dtype, name="reduce2")(h)
        for i in range(self.num_blocks[1]):
            h = blk(d * 2, self.heads[1], f"dec2_{i}")(h)

        h = up(h, d * 2, "up2_1")
        h = jnp.concatenate([h, e1], axis=-1)  # no reduce at level 1
        for i in range(self.num_blocks[0]):
            h = blk(d * 2, self.heads[0], f"dec1_{i}")(h)
        for i in range(self.num_refinement_blocks):
            h = blk(d * 2, self.heads[0], f"refine_{i}")(h)

        out = Conv(self.out_channels, kernel_size=(3, 3), padding=1,
                   use_bias=self.use_bias, dtype=self.dtype, name="output")(h)
        return out + x


class RestormerModel:
    name = "Restormer"
    train_patch = 64
    eval_roi = (64, 64)
    eval_overlap = {"valid": 0.3, "test": 0.9}

    def __init__(self, dtype=None, **kwargs):
        self.net = Restormer(dtype=dtype, **kwargs)

    def init(self, rng, sample_shape=(1, 64, 64, 1)):
        return jax.jit(self.net.init)(
            rng, jnp.zeros(sample_shape, jnp.float32)
        )["params"]

    def apply(self, params, x, train: bool = False, rng=None):
        return self.net.apply({"params": params}, x)

    def loss(self, params, x, y, rng=None):
        pred = self.apply(params, x)
        val = losses.l1(pred, y)
        return val, {"loss": val}
