"""Pallas-fused Res-FFT-Conv spectral branch (TPU, on-device).

The north-star fusion (BASELINE.json; reference hot loop
arch/Ours/networks.py:24-29): rfft2 -> spectral 1x1 conv + ReLU -> irfft2
with every intermediate held in VMEM. The transforms are the DFT factor
matmuls of mtd_gan_tpu.ops.dft (ortho norm, Hermitian-fold inverse), so
outputs match jnp.fft to the chosen dot precision.

Two production paths:

* ``spectral_branch_fused`` — one grid step per sample, the whole
  (H, W, C) working set in VMEM. For training patches (64x64) and any
  resolution whose per-sample spectrum fits on chip.

* ``spectral_branch_tiled`` — full-resolution (512x512) inference as a
  THREE-stage pipeline with HBM boundaries only between stages:
    A: W-axis forward DFT, grid over (sample, H-tiles);
    B: H-axis forward DFT + channel mix + ReLU + H-axis inverse, grid
       over (sample, K-tiles) — the dot->dot chain XLA cannot fuse runs
       as one kernel here, cutting per-block HBM traffic ~6x;
    C: W-axis inverse DFT + Hermitian fold, grid over (sample, H-tiles),
       optionally fusing the block's residual adds into the epilogue.
  Stage boundaries are 4-D (N, H, Kp, C) arrays: C in lanes is always a
  full dim (legal for any tile), H-tiles and K-tiles live in leading
  dims where Mosaic imposes no 8/128 alignment.

Dot precision ("tf32", default): Mosaic on this toolchain only lowers
DEFAULT (bf16) and HIGHEST (fp32, 6-pass) dot precisions; tf32-equivalent
numerics at 3x bf16 cost are emulated by hi/lo bf16 operand splits
(x_hi@w_hi + x_hi@w_lo + x_lo@w_hi) — measured 4.9e-4 abs error on a
512-length N(0,1) contraction vs 2.6e-1 for single-pass bf16.

Mosaic lowering rules this file is written against (probed on-device,
2026-08): 2-D dots at DEFAULT/HIGHEST precision ok (HIGH rejected; HIGHEST
needs 128-aligned lane dims); 3-D dot_general rejected; transpose(0,2,1)/
(1,0,2)/(2,0,1) ok alone and in pairs, but ANY 3 consecutive transposes
crash the compiler (even scratch-separated); reshapes touching only
leading dims ok; trailing-dim reshapes rejected unless preceded by a
transpose and 128-aligned. Every rearrange below is therefore a
leading-dims reshape plus at most TWO transposes.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtd_gan_tpu.ops.dft import (_dft_h_factors, _irdft_w_factors,
                                 _rdft_w_factors)

Array = jax.Array

_F32 = jnp.float32
_BF16 = jnp.bfloat16


# --------------------------------------------------------------------------
# precision plumbing
# --------------------------------------------------------------------------

def _pack_factor(mat: np.ndarray, precision: str) -> np.ndarray:
    """Host-side factor prep: (A, B) fp32 -> (2|1, A, B) pack (numpy, so the
    lru_cache below never captures jit tracers)."""
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    m = np.asarray(mat, np.float32)
    if precision == "tf32":
        hi = m.astype(bf16)
        lo = (m - hi.astype(np.float32)).astype(bf16)
        return np.stack([hi, lo])
    if precision == "bf16":
        return m.astype(bf16)[None]
    return m[None]  # "highest"


def _pack_traced(mat: Array, precision: str) -> Array:
    """Like _pack_factor but for traced (parameter) arrays."""
    m = mat.astype(_F32)
    if precision == "tf32":
        hi = m.astype(_BF16)
        lo = (m - hi.astype(_F32)).astype(_BF16)
        return jnp.stack([hi, lo])
    if precision == "bf16":
        return m.astype(_BF16)[None]
    return m[None]


def _make_dots(precision: str):
    """Returns dots(a, *packs) -> tuple of fp32 products a @ pack_i.

    The activation hi/lo split is shared across all packs of one call."""
    if precision == "tf32":

        def dots(a, *packs):
            ah = a.astype(_BF16)
            al = (a - ah.astype(_F32)).astype(_BF16)
            d = lambda p, q: jnp.dot(p, q, preferred_element_type=_F32)
            return tuple(
                d(ah, p[0]) + d(ah, p[1]) + d(al, p[0]) for p in packs
            )

    elif precision == "bf16":

        def dots(a, *packs):
            ab = a.astype(_BF16)
            return tuple(
                jnp.dot(ab, p[0], preferred_element_type=_F32) for p in packs
            )

    else:  # "highest"

        def dots(a, *packs):
            return tuple(
                jax.lax.dot(
                    a, p[0],
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=_F32,
                )
                for p in packs
            )

    return dots


@lru_cache(maxsize=16)
def _factors_np(h: int, w: int, k_pad: int, precision: str) -> Tuple[np.ndarray, ...]:
    """Padded, packed DFT factors: wr/wi (W, Kp), hr/hi (H, H), ga/gb (Kp, W).

    K columns beyond W//2+1 are zero in the forward factors and zero rows
    in the inverse factors, so padding contributes nothing to the output
    (the mix bias leaks into padded columns through ReLU, but the zero
    ga/gb rows kill it)."""
    k = w // 2 + 1
    wr, wi = _rdft_w_factors(w)
    ga, gb = _irdft_w_factors(w)
    hr, hi = _dft_h_factors(h)
    wr_p = np.zeros((w, k_pad), np.float32)
    wi_p = np.zeros((w, k_pad), np.float32)
    wr_p[:, :k], wi_p[:, :k] = wr, wi
    ga_p = np.zeros((k_pad, w), np.float32)
    gb_p = np.zeros((k_pad, w), np.float32)
    ga_p[:k], gb_p[:k] = ga, gb
    pk = partial(_pack_factor, precision=precision)
    return pk(wr_p), pk(wi_p), pk(hr), pk(hi), pk(ga_p), pk(gb_p)


def _factors(h: int, w: int, k_pad: int, precision: str) -> Tuple[Array, ...]:
    return tuple(jnp.asarray(a) for a in _factors_np(h, w, k_pad, precision))


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------
# shared in-kernel stage math
#
# hr/hi are the symmetric (H, H) cos/-sin factor packs, so every H-axis
# transform is a right-multiplication of (rows, H) matrices.
# --------------------------------------------------------------------------

def _stage_a_math(xs, wr, wi, dots, th, w, c):
    """(th, W, C) sample rows -> W-axis forward DFT -> (th, C, Kp) pair."""
    xt = xs.transpose(0, 2, 1).reshape(th * c, w)
    zr, zi = dots(xt, wr, wi)                        # (th*C, Kp)
    kp = zr.shape[1]
    return zr.reshape(th, c, kp), zi.reshape(th, c, kp)


def _to_rows(a, c, tc, m):                            # (M, C, tc) -> (C*tc, M)
    a = a.transpose(1, 0, 2)                          # (C, M, tc)
    a = a.transpose(0, 2, 1)                          # (C, tc, M)
    return a.reshape(c * tc, m)


def _from_rows(t, c, tc, m):                          # (C*tc, M) -> (M, C, tc)
    return t.reshape(c, tc, m).transpose(2, 0, 1)


def _make_dots_left(precision: str):
    """dots_l(pack, a) -> pack[0-ish] @ a with the pack as LHS."""
    if precision == "tf32":

        def dots_l(pack, a):
            ah = a.astype(_BF16)
            al = (a - ah.astype(_F32)).astype(_BF16)
            d = lambda p, q: jnp.dot(p, q, preferred_element_type=_F32)
            return d(pack[0], ah) + d(pack[1], ah) + d(pack[0], al)

    elif precision == "bf16":

        def dots_l(pack, a):
            return jnp.dot(pack[0], a.astype(_BF16),
                           preferred_element_type=_F32)

    else:  # "highest"

        def dots_l(pack, a):
            return jax.lax.dot(
                pack[0], a,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=_F32,
            )

    return dots_l


def _stage_b_chunk(zr, zi, hr, hi, mix_t, bias_col, dots, dots_l, tc, c, m):
    """One K-chunk: (M, C, tc) spectra pair -> H-forward DFT -> channel mix
    + ReLU -> inverse H DFT -> (M, C, tc).

    Two op-count tricks keep the Mosaic compile fast (the remote compile
    helper times out when a program's Mosaic compile passes ~150 s):
    * real/imag parts stack into ONE operand per factor multiply;
    * the channel mix runs on C-MAJOR rows as a LEFT multiplication by the
      transposed mix matrix over a (2C, tc*M) view — zero transposes,
      where the lanes-last formulation needed four 2-transpose chains."""
    r = c * tc
    z = jnp.concatenate(
        [_to_rows(zr, c, tc, m), _to_rows(zi, c, tc, m)], axis=0
    )                                                 # (2R, M)
    a, b = dots(z, hr, hi)                            # z@hr, z@hi
    or_ = a[:r] - b[r:]                               # Re of F_H @ z
    oi_ = b[:r] + a[r:]                               # Im

    # mix + ReLU: rows are (C, tc)-major, so (R, M) reshapes losslessly to
    # (C, tc*M); stacking re/im gives the (2C, tc*M) operand and the mix is
    # mix^T @ S (out[d] = sum_c S[c] * mix[c, d])
    s = jnp.concatenate(
        [or_.reshape(c, tc * m), oi_.reshape(c, tc * m)], axis=0
    )
    s = dots_l(mix_t, s) + bias_col
    s = jnp.maximum(s, 0.0)
    re = s[:c].reshape(r, m)
    im = s[c:].reshape(r, m)

    # inverse H with conjugate factors: (hr - i*hi) @ (re + i*im)
    e = jnp.concatenate([re, im], axis=0)
    p, q = dots(e, hr, hi)                            # e@hr, e@hi
    tr = p[:r] + q[r:]                                # re@hr + im@hi
    ti = p[r:] - q[:r]                                # im@hr - re@hi
    return _from_rows(tr, c, tc, m), _from_rows(ti, c, tc, m)


def _stage_c_math(tr, ti, ga, gb, dots, th, c, w):
    """(th, C, Kp) spectra pair -> W-axis inverse DFT -> (th, W, C)."""
    kp = tr.shape[2]
    (u,) = dots(tr.reshape(th * c, kp), ga)
    (v,) = dots(ti.reshape(th * c, kp), gb)
    out = (u + v).reshape(th, c, w)
    return out.transpose(0, 2, 1)                     # (th, W, C)


# --------------------------------------------------------------------------
# fused per-sample kernel (training patches / small inputs)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("precision", "interpret"))
def spectral_branch_fused(
    x: Array, mix: Array, bias: Array,
    precision: str = "tf32", interpret: bool = False,
) -> Array:
    """irfft2(relu(mix([Re;Im] rfft2(x)))) over NHWC x, one sample per grid
    step, all intermediates in VMEM. For H, W small enough to fit (<=128)."""
    n, h, w, c = x.shape
    k = w // 2 + 1
    # HIGHEST-precision dots require 128-aligned lane dims (Mosaic); the
    # bf16-based modes only need sublane (8) alignment.
    align = 128 if precision == "highest" else 8
    kp = ((k + align - 1) // align) * align
    wr, wi, hr, hi, ga, gb = _factors(h, w, kp, precision)
    mixp = _pack_traced(mix, precision)
    dots = _make_dots(precision)

    # In-VMEM rearranges use C-MAJOR rows so no dataflow chain ever has more
    # than two consecutive transposes (3+ crash Mosaic, see module docstring);
    # dot groups separate the pairs.
    def kernel(x_ref, wr_r, wi_r, hr_r, hi_r, ga_r, gb_r, mix_r, b_r, o_ref):
        xs = x_ref[0].astype(_F32)                    # (H, W, C)
        xt = xs.transpose(0, 2, 1).reshape(h * c, w)
        zr, zi = dots(xt, wr_r, wi_r)                 # (H*C, Kp)

        def to_ck_h(t):                               # (H*C, Kp) -> (C*Kp, H)
            t = t.reshape(h, c, kp).transpose(1, 0, 2)
            return t.transpose(0, 2, 1).reshape(c * kp, h)

        zr, zi = to_ck_h(zr), to_ck_h(zi)
        a_, b_ = dots(zr, hr_r, hi_r)
        e_, f_ = dots(zi, hr_r, hi_r)
        or_, oi_ = a_ - f_, b_ + e_                   # (C*Kp, H)

        def to_km_c(t):                               # (C*Kp, M) -> (Kp*M, C)
            t = t.reshape(c, kp, h).transpose(1, 0, 2)
            return t.transpose(0, 2, 1).reshape(kp * h, c)

        sp = jnp.concatenate([to_km_c(or_), to_km_c(oi_)], axis=1)
        (sp,) = dots(sp, mix_r)
        sp = jnp.maximum(sp + b_r[0], 0.0)

        def from_km_c(t):                             # (Kp*M, C) -> (C*Kp, M)
            t = t.reshape(kp, h, c).transpose(0, 2, 1)
            return t.transpose(1, 0, 2).reshape(c * kp, h)

        re, im = from_km_c(sp[:, :c]), from_km_c(sp[:, c:])
        p_, q_ = dots(re, hr_r, hi_r)
        r_, s_ = dots(im, hr_r, hi_r)
        tr, ti = p_ + s_, r_ - q_                     # (C*Kp, H)

        def to_ch_k(t):                               # (C*Kp, H) -> (C*H, Kp)
            return t.reshape(c, kp, h).transpose(0, 2, 1).reshape(c * h, kp)

        (u,) = dots(to_ch_k(tr), ga_r)
        (v,) = dots(to_ch_k(ti), gb_r)
        out = (u + v).reshape(c, h, w).transpose(1, 0, 2)
        o_ref[0] = out.transpose(0, 2, 1).astype(o_ref.dtype)  # (H, W, C)

    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec(wr.shape), _full_spec(wi.shape),
            _full_spec(hr.shape), _full_spec(hi.shape),
            _full_spec(ga.shape), _full_spec(gb.shape),
            _full_spec(mixp.shape), _full_spec((1, 2 * c)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x, wr, wi, hr, hi, ga, gb, mixp, bias.astype(_F32)[None])


# --------------------------------------------------------------------------
# tiled three-stage pipeline (full-resolution inference)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("precision", "th", "tk", "interpret"))
def spectral_branch_tiled(
    x: Array, mix: Array, bias: Array,
    residual: Optional[Array] = None,
    precision: str = "tf32", th: int = 64, tk: int = 128,
    interpret: bool = False,
) -> Array:
    """Full-resolution spectral branch; returns residual + branch when
    ``residual`` is given (fusing the block's adds into stage C).

    th: H-tile rows for stages A/C (multiple of 8); tk: spectral-column
    tile for stage B — a multiple of 128 (it is the lane dim of the
    (N, H, C, Kp) stage-boundary arrays). K is padded to the next multiple
    of tk (zero factor columns/rows): tk=128 puts K=257 at kp=384."""
    n, h, w, c = x.shape
    assert h % th == 0, (h, th)
    assert tk % 128 == 0, tk
    k = w // 2 + 1
    kp = ((k + tk - 1) // tk) * tk
    wr, wi, hr, hi, ga, gb = _factors(h, w, kp, precision)
    dots = _make_dots(precision)

    # stage boundaries: 4-D (N, H, C, Kp) — Kp in lanes (128-aligned tiles),
    # H-tiles in a leading dim where Mosaic imposes no alignment.
    z_shape = jax.ShapeDtypeStruct((n, h, c, kp), _F32)
    zh_block = lambda: pl.BlockSpec((1, th, c, kp), lambda i, j: (i, j, 0, 0),
                                    memory_space=pltpu.VMEM)
    zk_block = lambda: pl.BlockSpec((1, h, c, tk), lambda i, j: (i, 0, 0, j),
                                    memory_space=pltpu.VMEM)
    img_block = lambda: pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                                     memory_space=pltpu.VMEM)
    vmem = lambda mb: pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)

    # ---- stage A: W-axis forward DFT ----
    def kern_a(x_ref, wr_r, wi_r, zr_ref, zi_ref):
        zr, zi = _stage_a_math(x_ref[0].astype(_F32), wr_r, wi_r, dots, th, w, c)
        zr_ref[0] = zr
        zi_ref[0] = zi

    zr_arr, zi_arr = pl.pallas_call(
        kern_a,
        out_shape=(z_shape, z_shape),
        grid_spec=pl.GridSpec(
            grid=(n, h // th),
            in_specs=[img_block(), _full_spec(wr.shape), _full_spec(wi.shape)],
            out_specs=(zh_block(), zh_block()),
        ),
        compiler_params=None if interpret else vmem(100),
        interpret=interpret,
    )(x, wr, wi)

    # ---- stage B: H-forward + mix/ReLU + H-inverse, per K-tile ----
    # One kernel, looping over `tc`-column chunks of the 128-column K-tile:
    # chunking bounds VMEM liveness; the concat-trick dots and the
    # rearrange-free left-multiplied mix keep the Mosaic compile fast (the
    # remote compile helper times out past ~150 s of compile).
    tc = 64
    dots_l = _make_dots_left(precision)
    mix_t = _pack_traced(mix.T, precision)
    bias_col = bias.astype(_F32)[:, None]

    def kern_b(zr_ref, zi_ref, hr_r, hi_r, mix_r, b_r, tr_ref, ti_ref):
        for k0 in range(0, tk, tc):
            tr, ti = _stage_b_chunk(
                zr_ref[0, :, :, k0:k0 + tc], zi_ref[0, :, :, k0:k0 + tc],
                hr_r, hi_r, mix_r, b_r[:], dots, dots_l, tc, c, h,
            )
            tr_ref[0, :, :, k0:k0 + tc] = tr
            ti_ref[0, :, :, k0:k0 + tc] = ti

    tr_arr, ti_arr = pl.pallas_call(
        kern_b,
        out_shape=(z_shape, z_shape),
        grid_spec=pl.GridSpec(
            grid=(n, kp // tk),
            in_specs=[
                zk_block(), zk_block(),
                _full_spec(hr.shape), _full_spec(hi.shape),
                _full_spec(mix_t.shape), _full_spec((2 * c, 1)),
            ],
            out_specs=(zk_block(), zk_block()),
        ),
        compiler_params=None if interpret else vmem(120),
        interpret=interpret,
    )(zr_arr, zi_arr, hr, hi, mix_t, bias_col)

    # ---- stage C: W-axis inverse DFT (+ fused residual adds) ----
    with_res = residual is not None

    def kern_c(*refs):
        if with_res:
            tr_ref, ti_ref, ga_r, gb_r, r_ref, o_ref = refs
        else:
            tr_ref, ti_ref, ga_r, gb_r, o_ref = refs
        out = _stage_c_math(tr_ref[0], ti_ref[0], ga_r, gb_r, dots, th, c, w)
        if with_res:
            out = out + r_ref[0].astype(_F32)
        o_ref[0] = out.astype(o_ref.dtype)

    in_specs = [zh_block(), zh_block(), _full_spec(ga.shape), _full_spec(gb.shape)]
    operands = [tr_arr, ti_arr, ga, gb]
    if with_res:
        in_specs.append(img_block())
        operands.append(residual)
    return pl.pallas_call(
        kern_c,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n, h // th),
            in_specs=in_specs,
            out_specs=img_block(),
        ),
        compiler_params=None if interpret else vmem(100),
        interpret=interpret,
    )(*operands)
