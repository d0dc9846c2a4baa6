"""Core parametric layers: Conv / ConvTranspose / Dense with optional
spectral normalization.

Spectral norm replaces torch's ``nn.utils.spectral_norm`` hook (used on every
discriminator conv in the reference, e.g. arch/Ours/networks.py:181-305):
one power-iteration step per call on the (out, -1)-reshaped weight matrix,
sigma computed with the iterated (stop-gradiented) singular vectors so the
gradient flows only through the raw weight. The left singular vector ``u`` is
persisted in the ``"spectral"`` linen variable collection and threaded
explicitly through jitted train steps (TPU-native replacement for torch's
in-place buffer mutation).

Layout: NHWC activations, HWIO conv kernels (XLA-native on TPU).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Array = jax.Array


def normal_init(stddev: float = 0.01) -> Callable:
    """N(0, stddev) weight init used by the MTD-GAN family
    (reference arch/Ours/networks.py:57-61: weight ~ N(0, 0.01), bias = 0)."""
    return nn.initializers.normal(stddev=stddev)


def torch_kernel_init() -> Callable:
    """torch nn.Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)), i.e.
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — variance scale 1/3 fan-in uniform."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = float(fan_in) ** -0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _l2_normalize(x: Array, eps: float = 1e-12) -> Array:
    return x / (jnp.linalg.norm(x) + eps)


class _SpectralMixin:
    """Shared power-iteration logic.

    The weight is reshaped to (out_features, -1); column order does not
    affect singular values, so the flax HWIO layout needs no transpose
    gymnastics beyond putting the output axis first.
    """

    def _spectral_normalize(self, w_mat: Array, update_stats: bool) -> Array:
        out_dim = w_mat.shape[0]
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(
                    jax.random.PRNGKey(self.sn_seed), (out_dim,), jnp.float32
                )
            ),
        )
        u = u_var.value
        w_stop = jax.lax.stop_gradient(w_mat)
        v = _l2_normalize(w_stop.T @ u)
        u_new = _l2_normalize(w_stop @ v)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = jnp.einsum("i,ij,j->", jax.lax.stop_gradient(u_new), w_mat, v)
        return sigma


class Conv(nn.Module, _SpectralMixin):
    """2-D convolution (NHWC) with optional spectral norm.

    kernel layout HWIO; `padding` accepts int (symmetric), 'SAME', 'VALID'.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int | str = "SAME"
    use_bias: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: jnp.dtype | None = None
    sn_seed: int = 0
    feature_group_count: int = 1
    torch_init: bool = False  # torch Conv2d default: kaiming-uniform kernel
    #                           + U(-1/sqrt(fan_in), .) bias

    @nn.compact
    def __call__(self, x, update_stats: bool = True) -> Array:
        # A tuple input (a, b, ...) means conv(concat(parts, axis=-1)):
        # same params and math, but computed as a sum of per-part convs on
        # kernel channel slices. Skipping the materialized concat removes
        # its VJP — a bandwidth-bound split + relayout that measured
        # ~15 ms/step in the MTD-GAN discriminator backward (U-Net skip
        # concats at batch 320; see PERF.md round 4).
        parts = x if isinstance(x, (tuple, list)) else (x,)
        kh, kw = self.kernel_size
        total_ch = sum(p.shape[-1] for p in parts)
        if len(parts) > 1:
            assert self.feature_group_count == 1, "tuple input needs fgc=1"
        in_ch = total_ch // self.feature_group_count
        kernel_init = self.kernel_init
        bias_init = self.bias_init
        if self.torch_init:
            kernel_init = torch_kernel_init()
            bias_init = torch_bias_init(kh * kw * in_ch)
        kernel = self.param(
            "kernel", kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        if self.spectral_norm:
            w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)
            sigma = self._spectral_normalize(w_mat, update_stats)
            kernel = kernel / sigma

        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding

        dtype = self.dtype or parts[0].dtype

        def _conv(inp, ker):
            return jax.lax.conv_general_dilated(
                inp.astype(dtype),
                ker.astype(dtype),
                window_strides=tuple(self.strides),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
            )

        if len(parts) == 1:
            y = _conv(parts[0], kernel)
        else:
            y, c0 = None, 0
            for p in parts:
                ker = lax.slice_in_dim(kernel, c0, c0 + p.shape[-1], axis=2)
                c0 += p.shape[-1]
                y = _conv(p, ker) if y is None else y + _conv(p, ker)
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class ConvTranspose(nn.Module, _SpectralMixin):
    """2-D transposed convolution (NHWC), torch-semantics output size:
    out = (in - 1) * stride - 2 * padding + kernel.

    Implemented via lhs-dilated convolution with the kernel spatially flipped
    and I/O axes swapped — the exact adjoint of Conv, so reference deconv
    stacks (e.g. RED-CNN arch/RED_CNN/networks.py:16-20) map 1:1.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: int = 0
    use_bias: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: jnp.dtype | None = None
    sn_seed: int = 0
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel_init = self.kernel_init
        bias_init = self.bias_init
        if self.torch_init:
            # torch ConvTranspose2d fan_in = out_channels * kh * kw
            kernel_init = torch_kernel_init()
            bias_init = torch_bias_init(kh * kw * self.features)
        # Stored layout mirrors torch ConvTranspose2d (in, out) ordering in
        # HW(I=in)(O=out) form so init scales and weight import line up.
        kernel = self.param(
            "kernel", kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        if self.spectral_norm:
            # torch reshapes transposed-conv weight (in, out, kh, kw) -> (in, -1)
            w_mat = kernel.transpose(2, 0, 1, 3).reshape(in_ch, -1)
            sigma = self._spectral_normalize(w_mat, update_stats)
            kernel = kernel / sigma

        sh, sw = self.strides
        p = self.padding
        dtype = self.dtype or x.dtype
        # adjoint conv: flip spatial, swap in/out, pad (k - 1 - p)
        flipped = kernel[::-1, ::-1, :, :]
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            flipped.astype(dtype),
            window_strides=(1, 1),
            padding=[(kh - 1 - p, kh - 1 - p), (kw - 1 - p, kw - 1 - p)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module, _SpectralMixin):
    """Dense layer with optional spectral norm (reference: SN-Linear CLS head,
    arch/Ours/networks.py:226)."""

    features: int
    use_bias: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: jnp.dtype | None = None
    sn_seed: int = 0
    torch_init: bool = False

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Array:
        in_dim = x.shape[-1]
        kernel_init = self.kernel_init
        bias_init = self.bias_init
        if self.torch_init:
            kernel_init = torch_kernel_init()
            bias_init = torch_bias_init(in_dim)
        kernel = self.param(
            "kernel", kernel_init, (in_dim, self.features), jnp.float32
        )
        if self.spectral_norm:
            sigma = self._spectral_normalize(kernel.T, update_stats)
            kernel = kernel / sigma
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


def spectral_weight_matrix(kernel: Array) -> Array:
    """The (out, -1) matrix view each SN layer power-iterates
    (conv HWIO -> (O, HWI); dense (in, out) -> (out, in))."""
    if kernel.ndim == 4:
        return kernel.transpose(3, 0, 1, 2).reshape(kernel.shape[-1], -1)
    return kernel.T


def advance_spectral_state(params, state, n_iters: int = 1,
                           batched: bool = False):
    """Advance every spectral-norm u vector by `n_iters` power iterations
    directly on the weights — the iteration never touches activations
    (see _SpectralMixin), so it can run DECOUPLED from the forwards.

    This restores the reference's exact cadence cheaply: torch's hooks
    advance u once per D forward (4x in d_loss + 1x in g_loss per step,
    engine.py:26-76 / arch/Ours/networks.py:1957-1977); our pair-batched
    forwards advance it 2x. Calling this with n_iters=4 after a
    stats-frozen d_loss reproduces the 4x d_loss cadence regardless of
    how the forwards are batched or microbatched.

    `batched=True` groups the ~44 layers' weight-matrix views by row
    count, zero-pads each group's fan-in to the group max, and runs the
    two matvecs of every iteration as ONE batched contraction per group
    — ~16 dots/iteration instead of ~88. Zero-padding is EXACT: padded
    columns contribute zero to both the products and the L2 norms.
    Measured on chip (r5, tools/bench_step_budget.py): batched is
    SLOWER — 30.3 vs 25.9 ms isolated, full step 341.4 vs 336.7 — the
    (512, 9216)-padded group reads ~4x the real bytes and the stacking
    copies cost more than the ~350 tiny matvecs' launch overhead, which
    the TPU scheduler already hides. Per-layer stays the default;
    batched is kept as the measured alternative (parity test-pinned)."""
    # ---- collect (path, w_mat, u) for every SN layer -----------------------
    entries = []

    def collect(st, pr, path):
        for k, v in st.items():
            if isinstance(v, dict) and "u" in v and not isinstance(
                    v.get("u"), dict):
                w_mat = spectral_weight_matrix(
                    jax.lax.stop_gradient(pr[k]["kernel"]))
                entries.append((path + (k,), w_mat, v["u"]))
            elif isinstance(v, dict):
                collect(v, pr[k], path + (k,))

    collect(dict(state), params, ())

    new_u = {}
    if batched and entries:
        groups = {}
        for path, w_mat, u in entries:
            groups.setdefault(w_mat.shape[0], []).append((path, w_mat, u))
        for rows, items in groups.items():
            fmax = max(w.shape[1] for _, w, _ in items)
            ws = jnp.stack([
                jnp.pad(w, ((0, 0), (0, fmax - w.shape[1]))).astype(
                    jnp.float32)
                for _, w, _ in items])                       # (G, rows, fmax)
            us = jnp.stack([u.astype(jnp.float32)
                            for _, _, u in items])           # (G, rows)
            eps = 1e-12
            for _ in range(n_iters):
                vv = jnp.einsum("goi,go->gi", ws, us)
                vv = vv / (jnp.linalg.norm(vv, axis=-1, keepdims=True) + eps)
                us = jnp.einsum("goi,gi->go", ws, vv)
                us = us / (jnp.linalg.norm(us, axis=-1, keepdims=True) + eps)
            for (path, _, u0), u1 in zip(items, us):
                new_u[path] = u1.astype(u0.dtype)
    else:
        for path, w_mat, u in entries:
            for _ in range(n_iters):
                vv = _l2_normalize(w_mat.T @ u)
                u = _l2_normalize(w_mat @ vv)
            new_u[path] = u

    # ---- rebuild the state tree with the advanced u vectors ----------------
    def rebuild(st, path):
        out = {}
        for k, v in st.items():
            if isinstance(v, dict) and "u" in v and not isinstance(
                    v.get("u"), dict):
                out[k] = {**v, "u": new_u[path + (k,)]}
            elif isinstance(v, dict):
                out[k] = rebuild(v, path + (k,))
            else:
                out[k] = v
        return out

    return rebuild(dict(state), ())
