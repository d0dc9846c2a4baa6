"""CTformer — convolution-free token-to-token vision transformer denoiser.

Parity target: reference arch/CTformer/ (networks.py, token_performer.py,
T2T_transformer_block.py), final config img 64, tokens 'performer',
embed 64, depth 1, heads 8, mlp_ratio 2, token_dim 64 (models.py:29).

Geometry at 64x64: unfold7/2 -> 29^2 tokens(49) -> performer(->64) ->
roll(2,2) -> unfold3 dil2 -> 25^2 tokens(576) -> performer(->64) ->
roll(2,2) -> unfold3 -> 23^2=529 tokens(576) -> Linear(->64); sinusoid pos
embed; transformer Block(s); mirrored decoder with Fold + token residual
adds and inverse rolls; output = x - decoded (residual prediction).

Performer kernel attention: positive random features
exp(w^T x - |x|^2/2)/sqrt(m), m = emb/2, with a FIXED (non-trained)
orthogonal w scaled by sqrt(m) (token_performer.py:26-37). We materialize w
as a deterministic compile-time constant per module (same distribution;
exact values differ from torch's RNG — documented RNG-parity deviation,
SURVEY.md §7 hard part (f)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.ops.unfold import fold, unfold

Array = jax.Array

_TRUNC = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


class TokenPerformer(nn.Module):
    """FAVOR+ kernel attention T2T unit (reference token_performer.py:8-60)."""

    dim: int
    in_dim: int
    kernel_ratio: float = 0.5
    dropout: float = 0.1
    w_seed: int = 0

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        emb = self.in_dim
        m = int(emb * self.kernel_ratio)
        # fixed random projection. The reference stores w as a
        # requires_grad=False nn.Parameter (token_performer.py:28-29), i.e.
        # it lives in the checkpoint but is never updated — so it is a flax
        # param (importable from reference .pth via tools/
        # import_torch_checkpoint.py) frozen by CTformerModel.trainable_mask
        # + stop_gradient. Default init: deterministic orthogonal (same
        # distribution as torch's; exact values differ from torch's RNG).
        w = self.param(
            "w",
            lambda _key: jax.random.orthogonal(
                jax.random.PRNGKey(17 + self.w_seed), emb
            )[:m] * jnp.sqrt(jnp.float32(m)),
        )
        w = jax.lax.stop_gradient(w)

        h = nn.LayerNorm(name="norm1")(x)
        kqv = nn.Dense(3 * emb, kernel_init=_TRUNC, name="kqv")(h)
        k, q, v = jnp.split(kqv, 3, axis=-1)

        def prm_exp(z):
            zd = jnp.sum(z * z, axis=-1, keepdims=True) / 2.0
            wtz = jnp.einsum("btd,md->btm", z.astype(jnp.float32), w)
            return jnp.exp(wtz - zd) / jnp.sqrt(jnp.float32(m))

        kp, qp = prm_exp(k), prm_exp(q)
        d = jnp.einsum("btm,bm->bt", qp, jnp.sum(kp, axis=1))[..., None]
        kptv = jnp.einsum("btd,btm->bdm", v.astype(jnp.float32), kp)
        y = jnp.einsum("btm,bdm->btd", qp, kptv) / (d + 1e-8)
        y = y.astype(x.dtype)

        y = nn.Dense(emb, kernel_init=_TRUNC, name="proj")(y)
        y = nn.Dropout(self.dropout, deterministic=not train, name="dp")(y)
        y = v + y  # v as the skip (reference :56)

        h2 = nn.LayerNorm(name="norm2")(y)
        h2 = nn.Dense(emb, kernel_init=_TRUNC, name="mlp_fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        h2 = nn.Dense(emb, kernel_init=_TRUNC, name="mlp_fc2")(h2)
        h2 = nn.Dropout(self.dropout, deterministic=not train, name="mlp_dp")(h2)
        return y + h2


class TransformerBlock(nn.Module):
    """Standard pre-norm ViT block (reference T2T_transformer_block.py:99-115)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    dropout: float = 0.1
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h = nn.LayerNorm(name="norm1")(x)
        b, t, c = h.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, use_bias=False, kernel_init=_TRUNC, name="qkv")(h)
        qkv = qkv.reshape(b, t, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train,
                          name="attn_dp")(attn)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, c)
        y = nn.Dense(c, kernel_init=_TRUNC, name="proj")(y)
        y = nn.Dropout(self.dropout, deterministic=not train, name="proj_dp")(y)
        x = x + y

        h2 = nn.LayerNorm(name="norm2")(x)
        h2 = nn.Dense(int(c * self.mlp_ratio), kernel_init=_TRUNC, name="mlp_fc1")(h2)
        h2 = nn.gelu(h2, approximate=False)
        h2 = nn.Dropout(self.dropout, deterministic=not train, name="mlp_dp1")(h2)
        h2 = nn.Dense(c, kernel_init=_TRUNC, name="mlp_fc2")(h2)
        h2 = nn.Dropout(self.dropout, deterministic=not train, name="mlp_dp2")(h2)
        return x + h2


def _tokens_to_grid(x: Array) -> Array:
    """(B, T, C) -> NHWC (B, s, s, C) with s = sqrt(T)."""
    b, t, c = x.shape
    s = int(np.sqrt(t))
    return x.reshape(b, s, s, c)


def _grid_to_tokens(x: Array) -> Array:
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


class CTformer(nn.Module):
    img_size: int = 64
    embed_dim: int = 64
    token_dim: int = 64
    depth: int = 1
    num_heads: int = 8
    mlp_ratio: float = 2.0
    dropout: float = 0.1
    in_chans: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        res1 = x
        td = self.token_dim

        # ---- T2T encoder ----
        t = unfold(x, (7, 7), stride=(2, 2))  # (B, 49, 29^2)
        t = TokenPerformer(dim=self.in_chans * 49, in_dim=td, w_seed=1,
                           name="enc_attn1")(t.transpose(0, 2, 1), train)
        res_11 = t
        g = _tokens_to_grid(t)
        g = jnp.roll(g, (2, 2), axis=(1, 2))
        t = unfold(g, (3, 3), dilation=(2, 2))  # (B, td*9, 25^2)

        t = TokenPerformer(dim=td * 9, in_dim=td, w_seed=2,
                           name="enc_attn2")(t.transpose(0, 2, 1), train)
        res_22 = t
        g = _tokens_to_grid(t)
        g = jnp.roll(g, (2, 2), axis=(1, 2))
        t = unfold(g, (3, 3))  # (B, td*9, 23^2)

        t = nn.Dense(self.embed_dim, kernel_init=_TRUNC, name="project")(
            t.transpose(0, 2, 1)
        )

        # ---- transformer trunk ----
        pos = jnp.asarray(sinusoid_encoding(t.shape[1], self.embed_dim))
        t = t + pos.astype(t.dtype)
        t = nn.Dropout(self.dropout, deterministic=not train, name="pos_drop")(t)
        for i in range(self.depth):
            t = TransformerBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                                 self.dropout, name=f"block{i}")(t, train)
        t = nn.LayerNorm(name="norm")(t)

        # ---- T2T decoder (mirror) ----
        s1 = self.img_size
        s29 = (s1 - 7) // 2 + 1          # 29 for 64
        s25 = s29 - 4                     # dil-2 3x3
        s23 = s25 - 2
        t = nn.Dense(td * 9, kernel_init=_TRUNC, name="deproject")(t)
        g = fold(t.transpose(0, 2, 1), (s25, s25), (3, 3))
        g = jnp.roll(g, (-2, -2), axis=(1, 2))
        t = _grid_to_tokens(g) + res_22
        t = TokenPerformer(dim=td, in_dim=td * 9, w_seed=3,
                           name="dec_attn2")(t, train)

        g = fold(t.transpose(0, 2, 1), (s29, s29), (3, 3), dilation=(2, 2))
        g = jnp.roll(g, (-2, -2), axis=(1, 2))
        t = _grid_to_tokens(g) + res_11
        t = TokenPerformer(dim=td, in_dim=self.in_chans * 49, w_seed=4,
                           name="dec_attn1")(t, train)

        dec = fold(t.transpose(0, 2, 1), (s1, s1), (7, 7), stride=(2, 2))
        return res1 - dec


class CTformerModel:
    """Supervised wrapper; loss = MSE (reference networks.py:167). The engine
    scales it x100 + 1e-4 (engine.py:319) — kept in the train loop, not here."""

    name = "CTformer"
    train_patch = 64  # trains on 64x64 window patches (engine.py:303-414)
    eval_roi = (64, 64)
    eval_overlap = {"valid": 0.3, "test": 0.9}  # engine.py:345,378

    def __init__(self, img_size=64, embed_dim=64, depth=1, num_heads=8,
                 mlp_ratio=2.0, token_dim=64, dtype=None):
        self.net = CTformer(img_size=img_size, embed_dim=embed_dim, depth=depth,
                            num_heads=num_heads, mlp_ratio=mlp_ratio,
                            token_dim=token_dim, dtype=dtype)

    def init(self, rng, sample_shape=(1, 64, 64, 1)):
        return jax.jit(partial(self.net.init, train=False))(
            rng, jnp.zeros(sample_shape, jnp.float32)
        )["params"]

    @staticmethod
    def trainable_mask(params):
        """False for the performer projections `w` — fixed buffers in the
        reference (requires_grad=False); the trainer masks them out of the
        optimizer so neither gradients nor weight decay touch them."""
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not (
                path and getattr(path[-1], "key", None) == "w"
            ),
            params,
        )

    def apply(self, params, x, train: bool = False, rng=None):
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return self.net.apply({"params": params}, x, train=train, rngs=rngs)

    def loss(self, params, x, y, rng=None):
        pred = self.apply(params, x, train=True, rng=rng)
        val = losses.l2(pred, y)
        # reference engine scales CTformer loss: loss*100 + 1e-4 (engine.py:319)
        scaled = val * 100.0 + 1e-4
        return scaled, {"loss": scaled, "mse": val}
