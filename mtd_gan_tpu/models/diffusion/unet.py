"""Diffusion UNet with timestep embedding and self-attention.

Parity target: MONAI DiffusionModelUNet (reference arch/Diffusion/generative/
networks/nets/diffusion_model_unet.py:1632-1922) at the config the wrappers
use (networks.py:16-22): in 2 (noisy + condition concat), out 1, channels
(128, 256, 256), attention levels (F, T, T), 1 res block per level,
num_head_channels 256.

Structure (NHWC):
  conv_in 3x3 -> per level: [ResnetBlock (+Attention)] x n, Downsample
  conv3x3/2 (except last) -> mid: Resnet, Attention, Resnet -> per level
  (reversed): [concat skip, ResnetBlock (+Attention)] x (n+1), Upsample
  nearest x2 + conv3x3 (except last) -> GroupNorm/SiLU/zero-init conv.
  ResnetBlock: GN(32) -> SiLU -> conv3x3 -> +time proj -> GN -> SiLU ->
  zero-init conv3x3 -> + skip(1x1 if channels change).
  Timestep embedding: DDPM sinusoid (cos|sin) -> MLP (ch[0] -> 4*ch[0]).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        c_in = x.shape[-1]
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        temb_proj = nn.Dense(self.out_channels, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + temb_proj[:, None, None, :].astype(h.dtype)
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        return x + h


class AttentionBlock(nn.Module):
    num_head_channels: int = 256
    norm_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h_, w_, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        hd = c // heads
        res = x
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm")(x)
        h = h.reshape(b, h_ * w_, c)
        q = nn.Dense(c, name="to_q")(h)
        k = nn.Dense(c, name="to_k")(h)
        v = nn.Dense(c, name="to_v")(h)

        def split(z):
            return z.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        seq = h_ * w_
        if seq <= 4096:
            attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            out = attn @ v
        else:
            # full-image sampling (reference test path engine.py:866) runs
            # attention over 65k+ tokens at 512x512 — the dense seq^2 matrix
            # would be ~17 GB. Chunk queries so peak memory is qc*seq while
            # keys/values stay whole (exact attention, just blocked).
            qc = 2048
            pad = (-seq) % qc
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
            qp = qp.reshape(b, heads, -1, qc, hd).transpose(2, 0, 1, 3, 4)

            def block(qb):                      # (b, heads, qc, hd)
                a = (qb @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
                return jax.nn.softmax(a, axis=-1) @ v

            out = jax.lax.map(block, qp)        # (nb, b, heads, qc, hd)
            out = out.transpose(1, 2, 0, 3, 4).reshape(b, heads, -1, hd)
            out = out[:, :, :seq]
        out = out.transpose(0, 2, 1, 3).reshape(b, h_ * w_, c)
        out = nn.Dense(c, name="proj_attn")(out)
        return res + out.reshape(b, h_, w_, c)


class DiffusionUNet(nn.Module):
    in_channels: int = 2
    out_channels: int = 1
    channels: Sequence[int] = (128, 256, 256)
    attention_levels: Sequence[bool] = (False, True, True)
    num_res_blocks: int = 1
    num_head_channels: int = 256
    norm_groups: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, t: Array) -> Array:
        ch = self.channels
        temb_dim = ch[0] * 4
        temb = timestep_embedding(t, ch[0])
        temb = nn.Dense(temb_dim, name="time_fc1")(temb)
        temb = nn.Dense(temb_dim, name="time_fc2")(nn.silu(temb))

        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        skips = [h]

        # down path
        for li, c in enumerate(ch):
            for ri in range(self.num_res_blocks):
                h = ResnetBlock(c, self.norm_groups, self.dtype,
                                name=f"down{li}_res{ri}")(h, temb)
                if self.attention_levels[li]:
                    h = AttentionBlock(self.num_head_channels, self.norm_groups,
                                       self.dtype, name=f"down{li}_attn{ri}")(h)
                skips.append(h)
            if li != len(ch) - 1:
                h = nn.Conv(c, (3, 3), strides=(2, 2), padding=1,
                            dtype=self.dtype, name=f"down{li}_downsample")(h)
                skips.append(h)

        # middle
        h = ResnetBlock(ch[-1], self.norm_groups, self.dtype, name="mid_res1")(h, temb)
        h = AttentionBlock(self.num_head_channels, self.norm_groups, self.dtype,
                           name="mid_attn")(h)
        h = ResnetBlock(ch[-1], self.norm_groups, self.dtype, name="mid_res2")(h, temb)

        # up path (num_res_blocks + 1 resnets per level, consuming skips)
        for ui, li in enumerate(reversed(range(len(ch)))):
            c = ch[li]
            for ri in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(c, self.norm_groups, self.dtype,
                                name=f"up{ui}_res{ri}")(h, temb)
                if self.attention_levels[li]:
                    h = AttentionBlock(self.num_head_channels, self.norm_groups,
                                       self.dtype, name=f"up{ui}_attn{ri}")(h)
            if li != 0:
                n_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (n_, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up{ui}_upsample")(h)

        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros, dtype=self.dtype,
                       name="out_conv")(h)
