"""NCHW Pallas pipeline for the Res-FFT-Conv generator — round-3 perf path.

The round-2 Pallas kernels tied the XLA einsum path (~237 ms/batch4 at
512x512x32) because both sat at the same tf32 compute + HBM-traffic floor
in an NHWC layout whose C=32 lane dim filled a quarter of the 128 lanes
(PERF.md). This module re-lays the whole generator hot loop
(reference arch/Ours/networks.py:24-164) out channel-major:

* Activations live in HBM as ``(N, C, H*W)`` — W in lanes, fully dense.
* The 3x3 convs/deconvs (22 of them, reference networks.py:95-164) become
  ONE lane-dense matmul each: a 9-tap im2col built in VMEM from lane
  rolls + row slices of a halo'd chunk, contracted as
  ``(C_out, 9*C_in) @ (9*C_in, th*W)``. No 32-wide lane tax anywhere.
* Spectral boundaries are ``(N, C, Kp, H)`` — H in lanes (dense), K in
  sublanes, so K pads to 288 instead of the lane-forced 384 of round 2:
  25% less stage-B work for free.
* The H-axis DFTs (the FLOP-dominant term: 34 of 54 GFLOP/sample) run as
  radix-4 Cooley-Tukey: butterfly over four 128-lane slices (VPU) +
  per-digit twiddle + a single 128-contraction on the MXU — 4x fewer MXU
  MACs than the dense 512x512 factor matmul (VERDICT r2 item 1a).
* Stage boundaries default to bf16 (item 1b), halving pipeline traffic;
  DFT dot numerics stay tf32-grade via hi/lo bf16 factor splits.

Mosaic legality notes (probed on-device 2026-08-17, /tmp/probe_v3*.py):
general reshapes between (C, t, W) and (C*t, W) / (C, t*W) forms are
legal when the lane dim stays 128-aligned; pltpu.roll needs non-negative
shifts; manual HBM->VMEM DMAs with dynamic 128-aligned lane offsets are
legal (the conv halo pattern); 4-D blocks with sublane-dim blocking are
legal.
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
# precision plumbing: factor packs + dot factories
#
# Mosaic lowers only DEFAULT (bf16) and HIGHEST (fp32 6-pass) dot
# precisions. "tf32" emulates tensorfloat-grade numerics with hi/lo bf16
# splits of both operands (3 passes); "bf16x2" keeps the hi/lo split on the
# FACTOR only (2 passes) — the right mode when activations are already
# bf16 at the stage boundary (their lo part is exactly zero).
#
# Per-STAGE precision (round 5): a spec of the form "sp:XXXXX" assigns a
# pass count to each of the five spectral stages in order
# (W-fwd, H-fwd, mix, H-inv, W-inv); each char is '1' (single-pass bf16
# factor) or '2' (hi/lo bf16x2). The pass count is carried by the PACK's
# leading dim (1 or 2) — the dot closures below run `p.shape[0]` passes —
# so a mixed spec is purely a table-build-time decision and the kernels
# need no stage branching. "sp:22222" is bit-identical to "bf16x2".
# --------------------------------------------------------------------------

_SP_STAGES = {"wf": 0, "hf": 1, "mix": 2, "hi": 3, "wi": 4}


def _stage_prec(spec: str, stage: str) -> str:
    """Resolve a precision spec to a concrete pack precision for one stage
    (stage in {wf, hf, mix, hi, wi}). Non-"sp:" specs are uniform."""
    if not spec.startswith("sp:"):
        return spec
    body = spec[3:]
    assert len(body) == 5 and set(body) <= {"1", "2"}, spec
    return "bf16" if body[_SP_STAGES[stage]] == "1" else "bf16x2"


def _pack_np(mat: np.ndarray, precision: str) -> np.ndarray:
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    m = np.asarray(mat, np.float32)
    if precision in ("tf32", "bf16x2"):
        hi = m.astype(bf16)
        lo = (m - hi.astype(np.float32)).astype(bf16)
        return np.stack([hi, lo])
    return m.astype(bf16)[None]  # "bf16"


def _pack_traced(mat: Array, precision: str) -> Array:
    m = mat.astype(_F32)
    if precision in ("tf32", "bf16x2"):
        hi = m.astype(_BF16)
        lo = (m - hi.astype(_F32)).astype(_BF16)
        return jnp.stack([hi, lo])
    return m.astype(_BF16)[None]


def _make_dots(precision: str):
    """dots(a, *packs) -> tuple of fp32 products a @ pack_i."""
    d = lambda p, q: jnp.dot(p, q, preferred_element_type=_F32)
    if precision == "tf32":

        def dots(a, *packs):
            ah = a.astype(_BF16)
            al = (a - ah.astype(_F32)).astype(_BF16)
            return tuple(d(ah, p[0]) + d(ah, p[1]) + d(al, p[0]) for p in packs)

    else:  # "bf16x2" / "bf16" / "sp:..." — pass count from the pack shape

        def dots(a, *packs):
            ah = a.astype(_BF16)
            return tuple(d(ah, p[0]) + d(ah, p[1]) if p.shape[0] == 2
                         else d(ah, p[0]) for p in packs)

    return dots


def _make_dots_left(precision: str):
    """dots_l(pack, a) -> fp32 pack @ a (pack is the LHS)."""
    d = lambda p, q: jnp.dot(p, q, preferred_element_type=_F32)
    if precision == "tf32":

        def dots_l(pack, a):
            ah = a.astype(_BF16)
            al = (a - ah.astype(_F32)).astype(_BF16)
            return d(pack[0], ah) + d(pack[1], ah) + d(pack[0], al)

    else:  # pass count from the pack shape (see _make_dots)

        def dots_l(pack, a):
            ab = a.astype(_BF16)
            out = d(pack[0], ab)
            if pack.shape[0] == 2:
                out = out + d(pack[1], ab)
            return out

    return dots_l


# --------------------------------------------------------------------------
# DFT factor tables
# --------------------------------------------------------------------------


def _pad_k(k: int) -> int:
    """Spectral column count padded for sublane tiling / chunking."""
    kp = ((k + 15) // 16) * 16
    if kp > 128:
        kp = ((k + 95) // 96) * 96
    return kp


@lru_cache(maxsize=16)
def _w_tables_np(w: int, kp: int, tc: int, precision: str,
                 inv_precision: Optional[str] = None
                 ) -> Tuple[np.ndarray, ...]:
    """Forward/inverse W-axis real-DFT factor packs, zero-padded to kp
    columns (pad columns/rows are exactly zero, so they contribute nothing
    even after the mix bias + ReLU leak — the inverse rows kill it).

    Factor matrices are N/K-COMBINED so each dot streams its operand once
    (the kernels are VMEM-streaming bound, not MXU-pass bound — probed):
      fwd:  [wr | wi]            (w, 2*kp)   -> (rows, 2*kp) = [zr | zi]
      inv:  row-interleaved [ga; gb] per tc-chunk (2*kp, w), matching the
            chunk-interleaved [tr_j; ti_j] boundary stage B writes.
    """
    k = w // 2 + 1
    wr, wi = _rdft_w_factors(w)
    ga, gb = _irdft_w_factors(w)
    fwd = np.zeros((w, 2 * kp), np.float32)
    fwd[:, :k] = wr
    fwd[:, kp:kp + k] = wi
    ga_p = np.zeros((kp, w), np.float32)
    gb_p = np.zeros((kp, w), np.float32)
    ga_p[:k], gb_p[:k] = ga, gb
    inv = np.zeros((2 * kp, w), np.float32)
    for j in range(kp // tc):
        inv[2 * tc * j:2 * tc * j + tc] = ga_p[tc * j:tc * (j + 1)]
        inv[2 * tc * j + tc:2 * tc * (j + 1)] = gb_p[tc * j:tc * (j + 1)]
    return (_pack_np(fwd, precision),
            _pack_np(inv, inv_precision or precision))


@lru_cache(maxsize=16)
def _w_tables_packed_np(pw: int, kp: int, tc: int, precision: str,
                        inv_precision: Optional[str] = None
                        ) -> Tuple[np.ndarray, ...]:
    """Block-diagonal W-DFT factor packs for the PACKED patch layout: two
    pw-wide patches side by side in one 2*pw lane row (the training-shape
    64x64 patches become 128-lane-dense rows). Per-patch spectra stack
    along the K axis — kp covers BOTH patches (2 * padded per-patch K) —
    so every other stage (H DFTs, mix, stage C) is unchanged.

    Layout mirrors :func:`_w_tables_np`: fwd (2*pw, 2*kp) = [re | im]
    columns, inv (2*kp, 2*pw) with the stage-B chunk interleave.
    """
    k = pw // 2 + 1
    kph = kp // 2
    wr, wi = _rdft_w_factors(pw)
    fwd = np.zeros((2 * pw, 2 * kp), np.float32)
    fwd[:pw, 0:k] = wr
    fwd[:pw, kp:kp + k] = wi
    fwd[pw:, kph:kph + k] = wr
    fwd[pw:, kp + kph:kp + kph + k] = wi
    ga, gb = _irdft_w_factors(pw)
    ga_p = np.zeros((kp, 2 * pw), np.float32)
    gb_p = np.zeros((kp, 2 * pw), np.float32)
    ga_p[0:k, :pw], gb_p[0:k, :pw] = ga, gb
    ga_p[kph:kph + k, pw:], gb_p[kph:kph + k, pw:] = ga, gb
    inv = np.zeros((2 * kp, 2 * pw), np.float32)
    for j in range(kp // tc):
        inv[2 * tc * j:2 * tc * j + tc] = ga_p[tc * j:tc * (j + 1)]
        inv[2 * tc * j + tc:2 * tc * (j + 1)] = gb_p[tc * j:tc * (j + 1)]
    return (_pack_np(fwd, precision),
            _pack_np(inv, inv_precision or precision))


@lru_cache(maxsize=8)
def _w_ct_tables_np(w: int, precision: str) -> Tuple[np.ndarray, ...]:
    """Radix-4 Cooley-Tukey tables for the W-axis REAL half-spectrum DFT,
    w = 4m, m even (VERDICT r3 missing #2 — the dense W factor was ~48% of
    block MACs while H ran CT).

    Spectral indices split k = 4t + u with t < mt = m//2 covering
    k = 0..w/2-1 exactly once; the Nyquist k = w/2 runs as a separate
    rank-1 side chain (see `_block_fused_call`). The boundary layout is
    digit-major PAIR groups: group u holds [Re X_{4t+u} (mt lanes) |
    Im X_{4t+u} (mt lanes)] — identical to the 2*tc chunk interleave the
    dense path already uses with tc = mt, so stages B/C keep their shapes.

    Returns (f_fwd1, f_fwd2, f_inv, twc, tws, half0, pm1f, pm1i):
      f_fwd1 (m, 2mt): [cos | -sin](j t) / sqrt(w) — applied to the
                       twiddled REAL rows (wr_u)
      f_fwd2 (m, 2mt): [sin | cos](j t) / sqrt(w) — applied to the
                       twiddled IMAG rows (wi_u); two dots with per-row-
                       group factors emit [Re|Im] pairs directly (no lane
                       swap, full MXU tiles)
      f_inv (2mt, 2m): [[cos; -sin] | [sin; cos]](t s) * 2/sqrt(w) —
                       one dot per digit group maps [a|b] -> [yr|yi]
      twc/tws (4, m):  twiddle cos/sin(2 pi u j / w)
      half0 (1, 2mt):  0.5 at lanes {0, mt} (k=0 Hermitian weight), 1 else
      pm1f (1, m):     (-1)^j / sqrt(w) (forward Nyquist reduction)
      pm1i (1, w):     (-1)^n / sqrt(w) (inverse Nyquist broadcast)
    """
    assert w % 4 == 0 and (w // 4) % 2 == 0, w
    m = w // 4
    mt = m // 2
    j = np.arange(m)
    t = np.arange(mt)
    ang = 2.0 * np.pi * np.outer(j, t) / m
    s = 1.0 / np.sqrt(w)
    cjt, sjt = np.cos(ang) * s, np.sin(ang) * s
    f_fwd1 = np.concatenate([cjt, -sjt], axis=1).astype(np.float32)
    f_fwd2 = np.concatenate([sjt, cjt], axis=1).astype(np.float32)
    ang2 = 2.0 * np.pi * np.outer(t, j) / m          # (mt, m)
    c2, s2 = np.cos(ang2) * 2.0 * s, np.sin(ang2) * 2.0 * s
    f_re = np.concatenate([c2, -s2], axis=0)         # (2mt, m): a cos - b sin
    f_im = np.concatenate([s2, c2], axis=0)          # (2mt, m): a sin + b cos
    f_inv = np.concatenate([f_re, f_im], axis=1).astype(np.float32)
    u = np.arange(4)[:, None]
    tang = 2.0 * np.pi * u * j[None, :] / w
    twc = np.cos(tang).astype(np.float32)
    tws = np.sin(tang).astype(np.float32)
    half0 = np.ones((1, 2 * mt), np.float32)
    half0[0, 0] = half0[0, mt] = 0.5
    pm1f = (np.where(j % 2 == 0, 1.0, -1.0) * s)[None].astype(np.float32)
    n = np.arange(w)
    pm1i = (np.where(n % 2 == 0, 1.0, -1.0) * s)[None].astype(np.float32)
    return (_pack_np(f_fwd1, precision), _pack_np(f_fwd2, precision),
            _pack_np(f_inv, precision), twc, tws, half0, pm1f, pm1i)


@lru_cache(maxsize=8)
def _h_ct_tables_np(h: int, precision: str) -> Tuple[np.ndarray, ...]:
    """Radix-4 Cooley-Tukey tables for the H-axis ortho DFT, h = 4*m.

    f_cs: (m, 2m) N-combined [cos | -sin] sub-DFT factors carrying the
    FULL 1/sqrt(h) ortho scale (butterfly and twiddle stages unscaled).
    twc/tws: (4, m) twiddles cos/sin(2*pi*q*u/h) for output digit u.
    """
    assert h % 4 == 0, h
    m = h // 4
    q = np.arange(m)
    t = np.arange(m)
    ang = 2.0 * np.pi * np.outer(q, t) / m
    scale = 1.0 / np.sqrt(h)
    f_cs = np.concatenate(
        [np.cos(ang) * scale, -np.sin(ang) * scale], axis=1
    ).astype(np.float32)
    u = np.arange(4)[:, None]
    tang = 2.0 * np.pi * u * q[None, :] / h
    twc = np.cos(tang).astype(np.float32)
    tws = np.sin(tang).astype(np.float32)
    return _pack_np(f_cs, precision), twc, tws


@lru_cache(maxsize=8)
def _w_ct_folded_np(w: int, precision: str,
                    inv_precision: Optional[str] = None
                    ) -> Tuple[np.ndarray, ...]:
    """Twiddle-FOLDED radix-4 CT tables for the W-axis real half-spectrum
    DFT (round 4): the digit twiddles e^{-2 pi i u j / w} (and the k = 0
    Hermitian half-weight) move INTO per-digit factor matrices, so the
    kernels run butterfly adds + MXU dots only — no VPU twiddle passes, no
    post-dot [Re|Im] assembly. Because X_{4t+u} = sum_j v_u[j] W_w^{j(4t+u)},
    each digit's combined (twiddle o sub-DFT) factor is just the global DFT
    factor restricted to its residue class: E_u[j, t] = W_w^{j(4t+u)}/sqrt(w).

    MAC counts also DROP vs the unfolded form: forward 7 -> 6 r*m^2 (the
    real/imag row groups of digits 1/3 share one [d02 | d13] operand), and
    inverse 8 -> 6 r*m^2 (digits 0/2 emit only the REAL outputs the
    keep-real butterfly consumes; the unfolded fused dot computed their
    dead imaginary halves too).

    Returns (e0, e2, g1, g3, k02, k1, k3, pm1f, pm1i):
      e0/e2 (m, 2mt):   [Re|Im]-emitting factors for the real rows v0/v2
      g1/g3 (2m, 2mt):  factors on [d02 | d13] for digits 1 (v = d02-i*d13)
                        and 3 (v = d02+i*d13)
      k02 (2, 2mt, m):  inverse factors for digits 0/2, REAL outputs only;
                        k = 0 Hermitian weight folded into k02[0]'s t=0 rows
      k1/k3 (2mt, 2m):  inverse factors emitting twiddled [zr | zi]
      pm1f/pm1i:        Nyquist side-chain vectors (as _w_ct_tables_np)
    """
    assert w % 4 == 0 and (w // 4) % 2 == 0, w
    m = w // 4
    mt = m // 2
    s = 1.0 / np.sqrt(w)
    j = np.arange(m)[:, None]
    t = np.arange(mt)[None, :]

    def ef(u):
        ang = 2.0 * np.pi * j * (4 * t + u) / w
        return np.cos(ang) * s, -np.sin(ang) * s

    er0, ei0 = ef(0)
    er1, ei1 = ef(1)
    er2, ei2 = ef(2)
    er3, ei3 = ef(3)
    e0 = np.concatenate([er0, ei0], axis=1).astype(np.float32)
    e2 = np.concatenate([er2, ei2], axis=1).astype(np.float32)
    g1 = np.block([[er1, ei1], [ei1, -er1]]).astype(np.float32)
    g3 = np.block([[er3, ei3], [-ei3, er3]]).astype(np.float32)

    tt = np.arange(mt)[:, None]
    n = np.arange(m)[None, :]

    def iv(u):
        ang = 2.0 * np.pi * n * (4 * tt + u) / w
        return np.cos(ang) * 2.0 * s, np.sin(ang) * 2.0 * s

    fr0, fi0 = iv(0)
    fr1, fi1 = iv(1)
    fr2, fi2 = iv(2)
    fr3, fi3 = iv(3)
    k0 = np.concatenate([fr0, -fi0], axis=0).astype(np.float32)
    k0[0] *= 0.5   # k = 0: Hermitian weight 1, not 2 (was `half0`)
    k0[mt] *= 0.5
    k2 = np.concatenate([fr2, -fi2], axis=0).astype(np.float32)
    k1 = np.block([[fr1, fi1], [-fi1, fr1]]).astype(np.float32)
    k3 = np.block([[fr3, fi3], [-fi3, fr3]]).astype(np.float32)

    pm1f = (np.where(np.arange(m) % 2 == 0, 1.0, -1.0) * s)[None]
    nn = np.arange(w)
    pm1i = (np.where(nn % 2 == 0, 1.0, -1.0) * s)[None]
    pk = partial(_pack_np, precision=precision)
    pki = partial(_pack_np, precision=inv_precision or precision)
    # k02 stacks the two PACKS digit-major: k02[u] is digit u's (P, 2mt, m)
    # hi/lo pack (stacking before packing would put the pack dim first and
    # make k02[0] the hi halves of BOTH digits)
    return (pk(e0), pk(e2), pk(g1), pk(g3), np.stack([pki(k0), pki(k2)]),
            pki(k1), pki(k3),
            pm1f.astype(np.float32), pm1i.astype(np.float32))


@lru_cache(maxsize=8)
def _h_ct_folded_np(h: int, precision: str,
                    inv_precision: Optional[str] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Twiddle-folded radix-4 CT tables for the H-axis ortho DFT, h = 4m.

    gf (4, P, 2m, 2m): per-digit forward factors on [vr_u | vi_u] emitting
    [Re X_u | Im X_u] directly — E_u[j, t] = W_h^{j(4t+u)}/sqrt(h) in the
    real-linear representation (twiddle + sub-DFT + output assembly all in
    one dot; same MACs as the unfolded single dot over 8 row groups).
    gi (4, P, 2m, 2m): per-digit inverse factors on [Re X_u | Im X_u]
    emitting the conj-twiddled [zr_u | zi_u]: F_u[t, n] = W_h^{-n(4t+u)} /
    sqrt(h). The radix-4 butterflies stay on the VPU (pure adds)."""
    assert h % 4 == 0, h
    m = h // 4
    s = 1.0 / np.sqrt(h)
    j = np.arange(m)[:, None]
    t = np.arange(m)[None, :]
    gf, gi = [], []
    for u in range(4):
        ang = 2.0 * np.pi * j * (4 * t + u) / h
        er, ei = np.cos(ang) * s, -np.sin(ang) * s
        gf.append(_pack_np(
            np.block([[er, ei], [-ei, er]]).astype(np.float32), precision))
        fr, fi = np.cos(ang).T * s, np.sin(ang).T * s
        gi.append(_pack_np(
            np.block([[fr, fi], [-fi, fr]]).astype(np.float32),
            inv_precision or precision))
    return np.stack(gf), np.stack(gi)


@lru_cache(maxsize=8)
def _h_dense_tables_np(h: int, precision: str) -> np.ndarray:
    """N-combined [hr | hi] (h, 2h) dense fallback factor pack."""
    hr, hi = _dft_h_factors(h)
    return _pack_np(np.concatenate([hr, hi], axis=1), precision)


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)


def _vmem(mb: int, interpret: bool):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)


# --------------------------------------------------------------------------
# conv3x3: lane-dense 9-tap im2col conv over (N, C, H*W) activations
# --------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("h", "w", "th", "relu", "residual", "has_skip",
                     "out_dtype_name", "interpret", "pw"),
)
def _conv3x3_call(
    x: Array, kmat_pack: Array, bias: Array, skip: Optional[Array],
    h: int, w: int, th: int, relu: bool, residual: bool, has_skip: bool,
    out_dtype_name: str, interpret: bool, pw: int,
) -> Array:
    """x: (N, C_in, H*W); kmat_pack: (p, C_out, 9*C_in); bias: (C_out, 1).

    out = [x +] [relu](kmat @ im2col(x) + bias [+ skip]) as (N, C_out, H*W).
    Matches lax.conv_general_dilated(NHWC, HWIO, padding=1) semantics;
    for deconvs the caller passes a spatially flipped kernel (the stride-1
    ConvTranspose adjoint, ops/layers.py ConvTranspose). pw < w treats each
    row as w/pw independent pw-wide patches (packed layout): the W-shift
    zero masks repeat at every patch seam.
    """
    n, c_in, hw = x.shape
    c_out = kmat_pack.shape[1]
    out_dtype = jnp.dtype(out_dtype_name)
    dots_l = _make_dots_left("bf16" if kmat_pack.shape[0] == 1 else "bf16x2")
    n_chunks = h // th
    chw = th * w

    def kern(*refs):
        if has_skip:
            x_any, km_ref, b_ref, s_ref, o_ref, ext, sem = refs
        else:
            x_any, km_ref, b_ref, o_ref, ext, sem = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        h0 = j * th

        # --- halo'd chunk DMA: ext rows = [h0-1, h0+th+1) with zero pads ---
        @pl.when(j == 0)
        def _():
            ext[:, 0:w] = jnp.zeros((c_in, w), ext.dtype)

        @pl.when(j == n_chunks - 1)
        def _():
            ext[:, (th + 1) * w:] = jnp.zeros((c_in, w), ext.dtype)

        main = pltpu.make_async_copy(
            x_any.at[i, :, pl.ds(h0 * w, chw)],
            ext.at[:, pl.ds(w, chw)], sem.at[0])
        main.start()

        @pl.when(j > 0)
        def _():
            top = pltpu.make_async_copy(
                x_any.at[i, :, pl.ds((h0 - 1) * w, w)],
                ext.at[:, 0:w], sem.at[1])
            top.start()
            top.wait()

        @pl.when(j < n_chunks - 1)
        def _():
            bot = pltpu.make_async_copy(
                x_any.at[i, :, pl.ds((h0 + th) * w, w)],
                ext.at[:, (th + 1) * w:], sem.at[2])
            bot.start()
            bot.wait()

        main.wait()

        # --- 9-tap im2col: rows ordered (tap, c_in), tap = (dy+1)*3+(dx+1).
        # The two W-shifted copies are rolled+masked ONCE over the full
        # halo'd chunk, then all dy taps are plain row slices of the three
        # copies (2 rolls + 2 masks instead of 6+6). Mosaic's
        # dynamic_rotate only handles 32-bit data — roll through f32
        # (lossless round trip for bf16).
        ew = (th + 2) * w
        col = jax.lax.broadcasted_iota(jnp.int32, (c_in, ew), 1) % pw
        e32 = ext[:].astype(_F32)
        # sample x[w+1]: left-roll, kill each patch's last column
        ext_p = jnp.where(col == pw - 1, 0.0,
                          pltpu.roll(e32, shift=ew - 1, axis=1)
                          ).astype(ext.dtype)
        # sample x[w-1]: right-roll, kill each patch's first column
        ext_m = jnp.where(col == 0, 0.0,
                          pltpu.roll(e32, shift=1, axis=1)).astype(ext.dtype)
        slabs = []
        for dy in (-1, 0, 1):
            lo, hi = (1 + dy) * w, (1 + dy + th) * w
            slabs.extend([ext_m[:, lo:hi], ext[:, lo:hi], ext_p[:, lo:hi]])
        x9 = jnp.concatenate(slabs, axis=0)  # (9*C_in, th*w)

        acc = dots_l(km_ref, x9) + b_ref[:]
        if has_skip:
            acc = acc + s_ref[0].astype(_F32)
        if relu:
            acc = jnp.maximum(acc, 0.0)
        if residual:
            acc = acc + ext[:, w:(th + 1) * w].astype(_F32)
        o_ref[0] = acc.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        _full_spec(kmat_pack.shape),
        _full_spec(bias.shape),
    ]
    operands = [x, kmat_pack, bias.astype(_F32)]
    if has_skip:
        in_specs.append(
            pl.BlockSpec((1, c_out, chw), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM))
        operands.append(skip)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, c_out, hw), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, c_out, chw), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((c_in, (th + 2) * w), x.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        compiler_params=_vmem(100, interpret),
        interpret=interpret,
    )(*operands)


def conv3x3(x, kmat_pack, bias, h, w, *, skip=None, relu=True, residual=False,
            th=64, out_dtype=None, interpret=False, pw=None):
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    return _conv3x3_call(
        x, kmat_pack, bias, skip, h, w, min(th, h), relu, residual,
        skip is not None, out_dtype.name, interpret, pw or w,
    )


def conv_kmat(kernel_hwio: Array, flip: bool = False) -> Array:
    """(3, 3, C_in, C_out) HWIO kernel -> (C_out, 9*C_in) im2col matrix in
    the kernel's (tap, c_in) column order; flip spatially for deconvs."""
    k = kernel_hwio
    if flip:
        k = k[::-1, ::-1, :, :]
    co = k.shape[-1]
    return k.transpose(3, 0, 1, 2).reshape(co, -1)


# --------------------------------------------------------------------------
# spectral stages over (N, C, Kp, H) boundaries
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("h", "w", "kp", "precision",
                                   "bound_dtype_name", "interpret"))
def _stage_a_call(x, fwd_p, h, w, kp, precision, bound_dtype_name, interpret):
    """(N, C, H*W) -> forward W-axis rDFT -> merged z (N, C, 2*Kp, H) with
    Re at K-rows [0:Kp], Im at [Kp:2Kp]. One N-combined dot per block."""
    n, c, _ = x.shape
    bdt = jnp.dtype(bound_dtype_name)
    dots = _make_dots(precision)
    tha = 128 if h % 128 == 0 else h

    def kern(x_ref, f_r, z_ref):
        xs = x_ref[0].reshape(c * tha, w)
        (z,) = dots(xs, f_r)                          # (C*tha, 2Kp) f32
        z = z.astype(z_ref.dtype)
        z_ref[0] = z.reshape(c, tha, 2 * kp).transpose(0, 2, 1)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, c, 2 * kp, h), bdt),
        grid_spec=pl.GridSpec(
            grid=(n, h // tha),
            in_specs=[
                pl.BlockSpec((1, c, tha * w), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                _full_spec(fwd_p.shape),
            ],
            out_specs=pl.BlockSpec((1, c, 2 * kp, tha),
                                   lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem(100, interpret),
        interpret=interpret,
    )(x, fwd_p)


def _ct_fwd(ar, ai, f_cs, twc, tws, dots, r, m):
    """Radix-4 DIF forward DFT along lanes: (R, 4m) complex in natural
    order -> (R, 4m) complex in digit-major order (lane p = m*u + t maps
    to spectral index k = 4t + u). Operands stream bf16; one N-combined
    [cos|-sin] dot. Butterfly adds run in the INPUT dtype (bf16 on the
    production path: their rounding is of the same order as the operand
    quantization already present; twiddle products promote to f32)."""
    a = [ar[:, m * s:m * (s + 1)] for s in range(4)]
    b = [ai[:, m * s:m * (s + 1)] for s in range(4)]
    v0r, v0i = a[0] + a[1] + a[2] + a[3], b[0] + b[1] + b[2] + b[3]
    d02r, d02i = a[0] - a[2], b[0] - b[2]
    d13r, d13i = a[1] - a[3], b[1] - b[3]
    v2r, v2i = a[0] - a[1] + a[2] - a[3], b[0] - b[1] + b[2] - b[3]
    vr = [v0r, d02r + d13i, v2r, d02r - d13i]
    vi = [v0i, d02i - d13r, v2i, d02i + d13r]
    # twiddle by W_h^{mu} = cos - i sin (digit 0 is the identity)
    wr_, wi_ = [vr[0].astype(_BF16)], [vi[0].astype(_BF16)]
    for u in (1, 2, 3):
        tc_, ts_ = twc[u:u + 1, :], tws[u:u + 1, :]
        wr_.append((tc_ * vr[u] + ts_ * vi[u]).astype(_BF16))
        wi_.append((tc_ * vi[u] - ts_ * vr[u]).astype(_BF16))
    zbig = jnp.concatenate(wr_ + wi_, axis=0)         # (8R, m) bf16
    (AB,) = dots(zbig, f_cs)                          # (8R, 2m) f32
    A, B = AB[:, :m], AB[:, m:]
    xr, xi = [], []
    for u in range(4):
        re = A[u * r:(u + 1) * r] - B[(4 + u) * r:(5 + u) * r]
        im = B[u * r:(u + 1) * r] + A[(4 + u) * r:(5 + u) * r]
        xr.append(re)
        xi.append(im)
    return jnp.concatenate(xr, axis=1), jnp.concatenate(xi, axis=1)


def _ct_inv(xr, xi, f_cs, twc, tws, dots, r, m):
    """Radix-4 inverse of :func:`_ct_fwd` (conjugate transform), digit-major
    lanes in -> natural order out. xr/xi may be any float dtype; pieces are
    cast bf16 before the combined dot."""
    ebig = jnp.concatenate(
        [xr[:, m * u:m * (u + 1)].astype(_BF16) for u in range(4)]
        + [xi[:, m * u:m * (u + 1)].astype(_BF16) for u in range(4)], axis=0)
    (PQ,) = dots(ebig, f_cs)
    P, Q = PQ[:, :m], PQ[:, m:]
    zr, zi = [], []
    for u in range(4):
        yr = P[u * r:(u + 1) * r] + Q[(4 + u) * r:(5 + u) * r]
        yi = P[(4 + u) * r:(5 + u) * r] - Q[u * r:(u + 1) * r]
        if u == 0:
            zr.append(yr)
            zi.append(yi)
        else:
            # conj twiddle W_h^{-mu} = cos + i sin
            tc_, ts_ = twc[u:u + 1, :], tws[u:u + 1, :]
            zr.append(tc_ * yr - ts_ * yi)
            zi.append(tc_ * yi + ts_ * yr)
    x0r = zr[0] + zr[1] + zr[2] + zr[3]
    x0i = zi[0] + zi[1] + zi[2] + zi[3]
    x1r = zr[0] - zi[1] - zr[2] + zi[3]
    x1i = zi[0] + zr[1] - zi[2] - zr[3]
    x2r = zr[0] - zr[1] + zr[2] - zr[3]
    x2i = zi[0] - zi[1] + zi[2] - zi[3]
    x3r = zr[0] + zi[1] - zr[2] - zi[3]
    x3i = zi[0] - zr[1] - zi[2] + zr[3]
    return (jnp.concatenate([x0r, x1r, x2r, x3r], axis=1),
            jnp.concatenate([x0i, x1i, x2i, x3i], axis=1))


def _ct_fwd_real_half(ar, f_fwd1, f_fwd2, twc, tws, dots, r, m, pm1f):
    """Radix-4 DIF real-input half-spectrum DFT along lanes.

    ar: (R, 4m) real rows (natural order). Returns (pairs, ny):
    pairs[u] = (R, 2mt) digit group [Re X_{4t+u} | Im X_{4t+u}], t < mt,
    ny: (R,) Nyquist X_{w/2} coefficients (real by Hermitian symmetry).

    Real input halves the butterfly (v0, v2 real; v1 = conj(v3)): 4 real
    and 3 imaginary twiddled row groups instead of 4+4. Two sub-DFT dots
    with per-row-group factors ([cos|-sin] for the real rows, [sin|cos]
    for the imaginary ones) emit each digit's [Re|Im] pair directly —
    7/8 of the dense complex CT's MXU work on HALF-width output tiles."""
    a = [ar[:, m * s:m * (s + 1)] for s in range(4)]
    v0 = a[0] + a[1] + a[2] + a[3]
    v2 = a[0] - a[1] + a[2] - a[3]
    d02 = a[0] - a[2]
    d13 = a[1] - a[3]
    # (vr_u, vi_u): u=1 -> (d02, -d13); u=2 -> (v2, 0); u=3 -> (d02, +d13)
    wr_list, wi_list = [v0.astype(_BF16)], []
    for u, vr_u, vi_u in ((1, d02, -d13), (2, v2, None), (3, d02, d13)):
        tc_, ts_ = twc[u:u + 1, :], tws[u:u + 1, :]
        if vi_u is None:
            wr_list.append((tc_ * vr_u).astype(_BF16))
            wi_list.append((-ts_ * vr_u).astype(_BF16))
        else:
            wr_list.append((tc_ * vr_u + ts_ * vi_u).astype(_BF16))
            wi_list.append((tc_ * vi_u - ts_ * vr_u).astype(_BF16))
    (ab1,) = dots(jnp.concatenate(wr_list, axis=0), f_fwd1)  # (4R, 2mt)
    (ab2,) = dots(jnp.concatenate(wi_list, axis=0), f_fwd2)  # (3R, 2mt)
    pairs = [ab1[0:r]]  # wi_0 == 0: [Re|Im]_0 comes from the real row alone
    for u in (1, 2, 3):
        pairs.append(ab1[u * r:(u + 1) * r] + ab2[(u - 1) * r:u * r])
    ny = jnp.sum(v0.astype(_F32) * pm1f, axis=1)             # (R,)
    return pairs, ny


def _ct_inv_real_half(groups, f_inv, twc, tws, dots, r, m, half0):
    """Inverse of :func:`_ct_fwd_real_half`: 4 digit pair groups
    (R, 2mt) -> (R, 4m) real rows (the Nyquist term is added by the
    caller). One 2mt-deep dot per digit maps [a|b] -> [yr|yi]; conjugate
    twiddle + the radix-4 butterfly keep only the REAL outputs."""
    g0 = groups[0] * half0  # k = 0: Hermitian weight 1, not 2
    ebig = jnp.concatenate(
        [g0.astype(_BF16)] + [g.astype(_BF16) for g in groups[1:]], axis=0)
    (Y,) = dots(ebig, f_inv)                                   # (4R, 2m) f32
    re_p, im_p = [], []
    for u in range(4):
        yr = Y[u * r:(u + 1) * r, :m]
        yi = Y[u * r:(u + 1) * r, m:]
        if u == 0:
            re_p.append(yr)
            im_p.append(yi)
        else:  # conj twiddle e^{+2 pi i u j / w}
            tc_, ts_ = twc[u:u + 1, :], tws[u:u + 1, :]
            re_p.append(tc_ * yr - ts_ * yi)
            im_p.append(tc_ * yi + ts_ * yr)
    x0 = re_p[0] + re_p[1] + re_p[2] + re_p[3]
    x1 = re_p[0] - im_p[1] - re_p[2] + im_p[3]
    x2 = re_p[0] - re_p[1] + re_p[2] - re_p[3]
    x3 = re_p[0] + im_p[1] - re_p[2] - im_p[3]
    return jnp.concatenate([x0, x1, x2, x3], axis=1)


def _ct_fwd_folded(ar, ai, gf, dots, r, m):
    """Radix-4 DIF forward DFT along lanes with the digit twiddles FOLDED
    into per-digit [Re|Im]-emitting factor tables (_h_ct_folded_np): the
    VPU runs only the butterfly adds; each digit is one (R, 2m) x (2m, 2m)
    dot. Same layout contract as :func:`_ct_fwd` (digit-major output)."""
    a = [ar[:, m * s:m * (s + 1)] for s in range(4)]
    b = [ai[:, m * s:m * (s + 1)] for s in range(4)]
    d02r, d02i = a[0] - a[2], b[0] - b[2]
    d13r, d13i = a[1] - a[3], b[1] - b[3]
    vr = [a[0] + a[1] + a[2] + a[3], d02r + d13i,
          a[0] - a[1] + a[2] - a[3], d02r - d13i]
    vi = [b[0] + b[1] + b[2] + b[3], d02i - d13r,
          b[0] - b[1] + b[2] - b[3], d02i + d13r]
    xr, xi = [], []
    for u in range(4):
        (P,) = dots(jnp.concatenate([vr[u], vi[u]], axis=1), gf[u])
        xr.append(P[:, :m])
        xi.append(P[:, m:])
    return jnp.concatenate(xr, axis=1), jnp.concatenate(xi, axis=1)


def _ct_inv_folded(xr, xi, gi, dots, r, m):
    """Radix-4 inverse of :func:`_ct_fwd_folded`: per-digit dots emit the
    conj-TWIDDLED [zr_u | zi_u] directly (twiddle + P/Q assembly folded
    into the factors); only the radix-4 butterfly runs on the VPU."""
    zr, zi = [], []
    for u in range(4):
        lhs = jnp.concatenate(
            [xr[:, m * u:m * (u + 1)], xi[:, m * u:m * (u + 1)]], axis=1)
        (Z,) = dots(lhs, gi[u])
        zr.append(Z[:, :m])
        zi.append(Z[:, m:])
    x0r = zr[0] + zr[1] + zr[2] + zr[3]
    x0i = zi[0] + zi[1] + zi[2] + zi[3]
    x1r = zr[0] - zi[1] - zr[2] + zi[3]
    x1i = zi[0] + zr[1] - zi[2] - zr[3]
    x2r = zr[0] - zr[1] + zr[2] - zr[3]
    x2i = zi[0] - zi[1] + zi[2] - zi[3]
    x3r = zr[0] + zi[1] - zr[2] - zi[3]
    x3i = zi[0] - zr[1] - zi[2] + zr[3]
    return (jnp.concatenate([x0r, x1r, x2r, x3r], axis=1),
            jnp.concatenate([x0i, x1i, x2i, x3i], axis=1))


def _ct_fwd_real_half_folded(ar, e0, e2, g1, g3, dots, r, m, pm1f):
    """Real-input half-spectrum radix-4 forward with folded twiddles
    (_w_ct_folded_np): digits 1/3 share one [d02 | d13] operand, so the
    MXU work drops 7 -> 6 r*m^2 vs :func:`_ct_fwd_real_half` while the
    VPU runs only the (real) butterfly adds. Same (pairs, ny) contract."""
    a = [ar[:, m * s:m * (s + 1)] for s in range(4)]
    v0 = a[0] + a[1] + a[2] + a[3]
    v2 = a[0] - a[1] + a[2] - a[3]
    d = jnp.concatenate([a[0] - a[2], a[1] - a[3]], axis=1)
    (p0,) = dots(v0, e0)
    (p2,) = dots(v2, e2)
    p1, p3 = dots(d, g1, g3)
    ny = jnp.sum(v0.astype(_F32) * pm1f, axis=1)
    return [p0, p1, p2, p3], ny


def _ct_inv_real_half_folded(groups, k02, k1, k3, dots, r, m):
    """Inverse of :func:`_ct_fwd_real_half_folded`. Digits 0/2 emit ONLY
    the real outputs the keep-real butterfly uses (8 -> 6 r*m^2 MACs vs
    :func:`_ct_inv_real_half`); the k = 0 Hermitian half-weight is folded
    into k02[0], the conj twiddles into every factor."""
    (zr0,) = dots(groups[0], k02[0])
    (zr2,) = dots(groups[2], k02[1])
    (Z1,) = dots(groups[1], k1)
    (Z3,) = dots(groups[3], k3)
    zr1, zi1 = Z1[:, :m], Z1[:, m:]
    zr3, zi3 = Z3[:, :m], Z3[:, m:]
    return jnp.concatenate(
        [zr0 + zr1 + zr2 + zr3,
         zr0 - zi1 - zr2 + zi3,
         zr0 - zr1 + zr2 - zr3,
         zr0 + zi1 - zr2 - zi3], axis=1)


def _dense_h_fwd(ar, ai, h_cs, dots, r, h):
    z = jnp.concatenate([ar.astype(_BF16), ai.astype(_BF16)], axis=0)
    (AB,) = dots(z, h_cs)
    A, B = AB[:, :h], AB[:, h:]
    return A[:r] - B[r:], B[:r] + A[r:]


def _dense_h_inv(xr, xi, h_cs, dots, r, h):
    e = jnp.concatenate([xr.astype(_BF16), xi.astype(_BF16)], axis=0)
    (PQ,) = dots(e, h_cs)
    P, Q = PQ[:, :h], PQ[:, h:]
    return P[:r] + Q[r:], P[r:] - Q[:r]


@partial(jax.jit, static_argnames=("h", "kp", "tc", "precision", "use_ct",
                                   "interpret"))
def _stage_b_call(z, mix_pack, bias_col, h1, h2,
                  h, kp, tc, precision, use_ct, interpret):
    """H-axis forward DFT + spectral channel mix (ReLU'd [Re;Im] 1x1 conv,
    reference arch/Ours/networks.py:24-29) + inverse H DFT, one kernel per
    (sample, K-chunk).

    In: merged z (N, C, 2Kp, H) from stage A ([zr; zi] along K-rows; read
    as two chunk views of the same array). Out: (N, C, 2Kp, H) with
    CHUNK-INTERLEAVED rows [tr_0; ti_0; tr_1; ti_1; ...] — stage C's
    inverse factor pack is row-permuted to match, so no runtime shuffle."""
    n, c, _, _ = z.shape
    r = c * tc
    m = h // 4
    dots = _make_dots(precision)
    dots_l = _make_dots_left(precision)
    n_chunk = kp // tc

    def kern(zr_ref, zi_ref, h1_r, h2_r, mix_r, b_r, t_ref):
        ar = zr_ref[0].reshape(r, h)
        ai = zi_ref[0].reshape(r, h)
        if use_ct:
            xr, xi = _ct_fwd_folded(ar, ai, h1_r, dots, r, m)
        else:
            xr, xi = _dense_h_fwd(ar, ai, h1_r, dots, r, h)
        # channel mix + ReLU on C-major rows: (R, H) -> (C, tc*H) stack
        s = jnp.concatenate(
            [xr.reshape(c, tc * h).astype(_BF16),
             xi.reshape(c, tc * h).astype(_BF16)], axis=0)
        s = dots_l(mix_r, s) + b_r[:]
        s = jnp.maximum(s, 0.0)
        xr = s[:c].reshape(r, h)
        xi = s[c:].reshape(r, h)
        if use_ct:
            tr, ti = _ct_inv_folded(xr, xi, h2_r, dots, r, m)
        else:
            tr, ti = _dense_h_inv(xr, xi, h1_r, dots, r, h)
        t_ref[0] = jnp.concatenate(
            [tr.reshape(c, tc, h), ti.reshape(c, tc, h)], axis=1
        ).astype(t_ref.dtype)

    zb = lambda off: pl.BlockSpec(
        (1, c, tc, h), lambda i, j: (i, 0, j + off, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        grid_spec=pl.GridSpec(
            grid=(n, n_chunk),
            in_specs=[
                zb(0), zb(n_chunk),
                _full_spec(h1.shape), _full_spec(h2.shape),
                _full_spec(mix_pack.shape), _full_spec(bias_col.shape),
            ],
            out_specs=pl.BlockSpec((1, c, 2 * tc, h),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_vmem(110, interpret),
        interpret=interpret,
    )(z, z, h1, h2, mix_pack, bias_col)


@partial(jax.jit, static_argnames=("h", "w", "precision", "out_dtype_name",
                                   "interpret"))
def _stage_c_call(t, inv_p, res, h, w, precision, out_dtype_name, interpret):
    """Inverse W-axis rDFT (+ Hermitian fold) with the block's residual
    fused into the epilogue: out = res + irdft_W(t).

    In: chunk-interleaved (N, C, 2Kp, H) from stage B; the K-combined
    (2Kp, W) factor pack's rows carry the matching [ga; gb] interleave, so
    a single (C*tha, 2Kp) @ (2Kp, W) dot does fold + inverse at once."""
    n, c, kp2, _ = t.shape
    odt = jnp.dtype(out_dtype_name)
    dots = _make_dots(precision)
    tha = 128 if h % 128 == 0 else h
    rr = c * tha

    def kern(t_ref, g_r, r_ref, o_ref):
        a = t_ref[0].transpose(0, 2, 1).reshape(rr, kp2)
        (out,) = dots(a, g_r)                          # (C*tha, W) f32
        out = out.reshape(c, tha * w) + r_ref[0].astype(_F32)
        o_ref[0] = out.astype(o_ref.dtype)

    ib = lambda: pl.BlockSpec((1, c, tha * w), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, c, h * w), odt),
        grid_spec=pl.GridSpec(
            grid=(n, h // tha),
            in_specs=[
                pl.BlockSpec((1, c, kp2, tha), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.VMEM),
                _full_spec(inv_p.shape), ib(),
            ],
            out_specs=ib(),
        ),
        compiler_params=_vmem(100, interpret),
        interpret=interpret,
    )(t, inv_p, res)


# --------------------------------------------------------------------------
# fused Res-FFT-Conv block + full generator chain
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("h", "w", "kp", "tc", "precision",
                                   "use_ct", "use_ct_w", "has_pre",
                                   "has_skip", "has_post", "interpret", "pw"))
def _block_fused_call(x, km_pack, kb, fwd_p, mix_pack, mb, h1, h2,
                      inv_p, wt, pre_km, pre_kb, skip, post_km, post_kb, img,
                      h, w, kp, tc, precision, use_ct, use_ct_w, has_pre,
                      has_skip, has_post, interpret, pw):
    """One whole Res-FFT-Conv block — optionally including the LAYER conv
    that feeds it — as a SINGLE kernel per sample:
      h   = relu(pre_conv3x3(x) + pre_b [+ skip])      (when has_pre; the
            reference's enc_i/dec_i convs, arch/Ours/networks.py:95-164 —
            their output is consumed only by the block, so it never
            touches HBM)
      out = h + relu(conv3x3(h)+b) + irfft2(relu(mix([Re;Im] rfft2(h))))

    x is read from HBM once (halo'd chunk DMAs feed the convs and the
    W-forward DFT); the spectral boundaries live in two VMEM scratch
    buffers and never touch HBM; the conv residual is staged in the output
    block and stage C accumulates onto it. With has_post, a final phase
    computes the generator's EXIT deconv + image residual
    (relu(dec_0(out) + img), reference networks.py:164) over the
    in-VMEM output block, returning (out, final)."""
    n, c_in, hw = x.shape
    c = km_pack.shape[1]
    tha = 128 if h % 128 == 0 else h
    nj = h // tha
    nb = kp // tc
    r = c * tc
    m = h // 4
    chw = tha * w
    # Mosaic supports the (r, h) <-> (c, tc*h) stage-B shape casts only when
    # rows are whole 128-lane tiles; at the packed training geometry (h = 64)
    # the fold runs through scratch instead (unrolled h-wide copies — probed
    # on-chip: tpu.reshape/tpu.concatenate reject half-tile rows)
    need_fold = h % 128 != 0
    dots = _make_dots(precision)
    dots_l = _make_dots_left(precision)
    conv_dots_l = _make_dots_left("bf16" if km_pack.shape[0] == 1 else "bf16x2")

    def _masked_rolls(buf, ew):
        """(left-shifted, right-shifted) copies with conv zero-pad columns
        (repeating at every pw-wide patch seam in the packed layout)."""
        col = jax.lax.broadcasted_iota(jnp.int32, (buf.shape[0], ew), 1) % pw
        b32 = buf.astype(_F32)
        plus = jnp.where(col == pw - 1, 0.0,
                         pltpu.roll(b32, shift=ew - 1, axis=1)
                         ).astype(buf.dtype)
        minus = jnp.where(col == 0, 0.0,
                          pltpu.roll(b32, shift=1, axis=1)).astype(buf.dtype)
        return minus, plus

    def _im2col(buf, minus, plus, rows):
        """9-tap im2col over `rows` output rows of a (rows+2)-row buffer."""
        slabs = []
        for dy in (-1, 0, 1):
            lo, hi = (1 + dy) * w, (1 + dy + rows) * w
            slabs.extend([minus[:, lo:hi], buf[:, lo:hi], plus[:, lo:hi]])
        return jnp.concatenate(slabs, axis=0)

    m_w = w // 4

    def kern(*refs):
        x_any = refs[0]
        km_r, kb_r, mix_r, mb_r, h1_r, h2_r = refs[1:7]
        idx = 7
        if use_ct_w:
            (e0w_r, e2w_r, g1w_r, g3w_r, k02w_r, k1w_r, k3w_r,
             pm1f_r, pm1i_r) = refs[idx:idx + 9]
            idx += 9
            f_r = inv_r = None
        else:
            f_r, inv_r = refs[idx:idx + 2]
            idx += 2
        if has_pre:
            pkm_r, pkb_r = refs[idx:idx + 2]
            idx += 2
        if has_skip:
            s_any = refs[idx]
            idx += 1
        if has_post:
            postk_r, postb_r = refs[idx:idx + 2]
            img_b = refs[idx + 2]
            idx += 3
            o_ref, f_ref = refs[idx:idx + 2]
            idx += 2
        else:
            o_ref = refs[idx]
            idx += 1
        zscr, tscr, ext = refs[idx:idx + 3]
        idx += 3
        if use_ct_w:
            zny, tny = refs[idx:idx + 2]
            idx += 2
        if has_pre:
            ext2 = refs[idx]
            idx += 1
        if has_skip:
            ext_s = refs[idx]
            idx += 1
        if need_fold:
            fscr, uscr = refs[idx:idx + 2]
            idx += 2
        sem = refs[idx]
        i = pl.program_id(0)

        # ---- phase 1: [layer conv ->] res conv into o_ref, W-DFT to zscr
        def phase_a(j, _):
            h0 = j * tha

            if has_pre:
                # x chunk with a 2-row halo: the layer conv produces h on a
                # 1-row halo window, which the res conv then consumes
                @pl.when(j == 0)
                def _():
                    ext2[:, 0:2 * w] = jnp.zeros((c_in, 2 * w), ext2.dtype)

                @pl.when(j == nj - 1)
                def _():
                    ext2[:, (tha + 2) * w:] = jnp.zeros((c_in, 2 * w),
                                                        ext2.dtype)

                main = pltpu.make_async_copy(
                    x_any.at[i, :, pl.ds(h0 * w, chw)],
                    ext2.at[:, pl.ds(2 * w, chw)], sem.at[0])
                main.start()

                @pl.when(j > 0)
                def _():
                    top = pltpu.make_async_copy(
                        x_any.at[i, :, pl.ds((h0 - 2) * w, 2 * w)],
                        ext2.at[:, 0:2 * w], sem.at[1])
                    top.start()
                    top.wait()

                @pl.when(j < nj - 1)
                def _():
                    bot = pltpu.make_async_copy(
                        x_any.at[i, :, pl.ds((h0 + tha) * w, 2 * w)],
                        ext2.at[:, (tha + 2) * w:], sem.at[2])
                    bot.start()
                    bot.wait()

                if has_skip:
                    @pl.when(j == 0)
                    def _():
                        ext_s[:, 0:w] = jnp.zeros((c, w), ext_s.dtype)

                    @pl.when(j == nj - 1)
                    def _():
                        ext_s[:, (tha + 1) * w:] = jnp.zeros((c, w),
                                                             ext_s.dtype)

                    smain = pltpu.make_async_copy(
                        s_any.at[i, :, pl.ds(h0 * w, chw)],
                        ext_s.at[:, pl.ds(w, chw)], sem.at[3])
                    smain.start()

                    @pl.when(j > 0)
                    def _():
                        stop = pltpu.make_async_copy(
                            s_any.at[i, :, pl.ds((h0 - 1) * w, w)],
                            ext_s.at[:, 0:w], sem.at[4])
                        stop.start()
                        stop.wait()

                    @pl.when(j < nj - 1)
                    def _():
                        sbot = pltpu.make_async_copy(
                            s_any.at[i, :, pl.ds((h0 + tha) * w, w)],
                            ext_s.at[:, (tha + 1) * w:], sem.at[5])
                        sbot.start()
                        sbot.wait()
                    smain.wait()
                main.wait()

                e2m, e2p = _masked_rolls(ext2[:], (tha + 4) * w)
                x9p = _im2col(ext2[:], e2m, e2p, tha + 2)
                hacc = conv_dots_l(pkm_r, x9p) + pkb_r[:]
                if has_skip:
                    hacc = hacc + ext_s[:].astype(_F32)
                ext[:] = jnp.maximum(hacc, 0.0).astype(ext.dtype)

                # out-of-image h rows are zero under conv padding semantics
                @pl.when(j == 0)
                def _():
                    ext[:, 0:w] = jnp.zeros((c, w), ext.dtype)

                @pl.when(j == nj - 1)
                def _():
                    ext[:, (tha + 1) * w:] = jnp.zeros((c, w), ext.dtype)
            else:
                @pl.when(j == 0)
                def _():
                    ext[:, 0:w] = jnp.zeros((c, w), ext.dtype)

                @pl.when(j == nj - 1)
                def _():
                    ext[:, (tha + 1) * w:] = jnp.zeros((c, w), ext.dtype)

                main = pltpu.make_async_copy(
                    x_any.at[i, :, pl.ds(h0 * w, chw)],
                    ext.at[:, pl.ds(w, chw)], sem.at[0])
                main.start()

                @pl.when(j > 0)
                def _():
                    top = pltpu.make_async_copy(
                        x_any.at[i, :, pl.ds((h0 - 1) * w, w)],
                        ext.at[:, 0:w], sem.at[1])
                    top.start()
                    top.wait()

                @pl.when(j < nj - 1)
                def _():
                    bot = pltpu.make_async_copy(
                        x_any.at[i, :, pl.ds((h0 + tha) * w, w)],
                        ext.at[:, (tha + 1) * w:], sem.at[2])
                    bot.start()
                    bot.wait()

                main.wait()

            ext_m, ext_p = _masked_rolls(ext[:], (tha + 2) * w)
            x9 = _im2col(ext[:], ext_m, ext_p, tha)
            mid = ext[:, w:(tha + 1) * w]
            acc = jnp.maximum(conv_dots_l(km_r, x9) + kb_r[:], 0.0)
            acc = acc + mid.astype(_F32)
            o_ref[0, :, pl.ds(h0 * w, chw)] = acc.astype(o_ref.dtype)

            xs = mid.reshape(c * tha, w)
            if use_ct_w:
                pairs, ny = _ct_fwd_real_half_folded(
                    xs, e0w_r, e2w_r, g1w_r, g3w_r, dots,
                    c * tha, m_w, pm1f_r[:])
                for u in range(4):
                    zscr[:, 2 * tc * u:2 * tc * (u + 1), pl.ds(h0, tha)] = (
                        pairs[u].reshape(c, tha, 2 * tc)
                        .transpose(0, 2, 1).astype(zscr.dtype))
                zny[:, pl.ds(h0, tha)] = ny.reshape(c, tha)
            else:
                (z,) = dots(xs, f_r)                   # (C*tha, 2Kp) f32
                z = z.astype(zscr.dtype).reshape(c, tha, 2 * kp)
                zscr[:, :, pl.ds(h0, tha)] = z.transpose(0, 2, 1)
            return 0

        jax.lax.fori_loop(0, nj, phase_a, 0)

        # ---- phase 2: H-DFT + mix + inverse H-DFT per K-chunk ----
        def phase_b(j, _):
            k0 = j * tc
            if use_ct_w:
                # digit pair groups: [re | im] interleaved per chunk
                ar = zscr[:, pl.ds(2 * k0, tc), :].reshape(r, h)
                ai = zscr[:, pl.ds(2 * k0 + tc, tc), :].reshape(r, h)
            else:
                ar = zscr[:, pl.ds(k0, tc), :].reshape(r, h)
                ai = zscr[:, pl.ds(kp + k0, tc), :].reshape(r, h)
            if use_ct:
                xr, xi = _ct_fwd_folded(ar, ai, h1_r, dots, r, m)
            else:
                xr, xi = _dense_h_fwd(ar, ai, h1_r, dots, r, h)
            if need_fold:
                xr3 = xr.reshape(c, tc, h)
                xi3 = xi.reshape(c, tc, h)
                for t in range(tc):
                    fscr[:c, t * h:(t + 1) * h] = xr3[:, t, :]
                    fscr[c:, t * h:(t + 1) * h] = xi3[:, t, :]
                s = fscr[:].astype(_BF16)
            else:
                s = jnp.concatenate(
                    [xr.reshape(c, tc * h).astype(_BF16),
                     xi.reshape(c, tc * h).astype(_BF16)], axis=0)
            s = jnp.maximum(dots_l(mix_r, s) + mb_r[:], 0.0)
            if need_fold:
                for t in range(tc):
                    uscr[:, t, :] = s[:, t * h:(t + 1) * h]
                xr = uscr[:c].reshape(r, h)
                xi = uscr[c:].reshape(r, h)
            else:
                xr = s[:c].reshape(r, h)
                xi = s[c:].reshape(r, h)
            if use_ct:
                tr, ti = _ct_inv_folded(xr, xi, h2_r, dots, r, m)
            else:
                tr, ti = _dense_h_inv(xr, xi, h1_r, dots, r, h)
            tscr[:, pl.ds(2 * k0, tc), :] = (
                tr.reshape(c, tc, h).astype(tscr.dtype))
            tscr[:, pl.ds(2 * k0 + tc, tc), :] = (
                ti.reshape(c, tc, h).astype(tscr.dtype))
            return 0

        jax.lax.fori_loop(0, nb, phase_b, 0)

        if use_ct_w:
            # ---- Nyquist side chain (k = w/2): its W-row is real and the
            # k-lane never mixes with other k, so the whole H-DFT + mix +
            # inverse-H runs once on (C, H) rows (c complex rows — tiny)
            ar = zny[:].astype(_BF16)
            ai = jnp.zeros((c, h), _BF16)
            if use_ct:
                xr, xi = _ct_fwd_folded(ar, ai, h1_r, dots, c, m)
            else:
                xr, xi = _dense_h_fwd(ar, ai, h1_r, dots, c, h)
            s = jnp.concatenate(
                [xr.astype(_BF16), xi.astype(_BF16)], axis=0)
            s = jnp.maximum(dots_l(mix_r, s) + mb_r[:], 0.0)
            xr, xi = s[:c], s[c:]
            if use_ct:
                tr, _ = _ct_inv_folded(xr, xi, h2_r, dots, c, m)
            else:
                tr, _ = _dense_h_inv(xr, xi, h1_r, dots, c, h)
            # the imaginary part cannot reach the output: the W-inverse row
            # for k = w/2 is sin(pi n) = 0 (ops/dft.py _irdft_w_factors)
            tny[:] = tr

        # ---- phase 3: inverse W-DFT, accumulate onto the conv residual ----
        def phase_c(j, _):
            h0 = j * tha
            if use_ct_w:
                groups = []
                for u in range(4):
                    g = tscr[:, pl.ds(2 * tc * u, 2 * tc), pl.ds(h0, tha)]
                    groups.append(
                        g.transpose(0, 2, 1).reshape(c * tha, 2 * tc))
                out = _ct_inv_real_half_folded(
                    groups, k02w_r, k1w_r, k3w_r, dots,
                    c * tha, m_w)                       # (C*tha, W) f32
                out3 = out.reshape(c, tha, w)
                ny_c = tny[:, pl.ds(h0, tha)].astype(_F32)
                out3 = out3 + ny_c[:, :, None] * pm1i_r[:][None]
                out = out3.reshape(c, chw)
            else:
                t = tscr[:, :, pl.ds(h0, tha)]          # (C, 2Kp, tha)
                a = t.transpose(0, 2, 1).reshape(c * tha, 2 * kp)
                (out,) = dots(a, inv_r)                 # (C*tha, W) f32
                out = out.reshape(c, chw)
            cur = o_ref[0, :, pl.ds(h0 * w, chw)]
            o_ref[0, :, pl.ds(h0 * w, chw)] = (
                out + cur.astype(_F32)).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, nj, phase_c, 0)

        if has_post:
            # exit deconv (C -> 1) + image residual over the finished
            # in-VMEM output block; halos come straight from o_ref
            def phase_d(j, _):
                h0 = j * tha
                ext[:, w:(tha + 1) * w] = o_ref[0, :, pl.ds(h0 * w, chw)]

                @pl.when(j > 0)
                def _():
                    ext[:, 0:w] = o_ref[0, :, pl.ds((h0 - 1) * w, w)]

                @pl.when(j == 0)
                def _():
                    ext[:, 0:w] = jnp.zeros((c, w), ext.dtype)

                @pl.when(j < nj - 1)
                def _():
                    ext[:, (tha + 1) * w:] = o_ref[
                        0, :, pl.ds((h0 + tha) * w, w)]

                @pl.when(j == nj - 1)
                def _():
                    ext[:, (tha + 1) * w:] = jnp.zeros((c, w), ext.dtype)

                e_m, e_p = _masked_rolls(ext[:], (tha + 2) * w)
                x9 = _im2col(ext[:], e_m, e_p, tha)
                acc = conv_dots_l(postk_r, x9) + postb_r[:]
                acc = acc + img_b[0, :, pl.ds(h0 * w, chw)].astype(_F32)
                f_ref[0, :, pl.ds(h0 * w, chw)] = jnp.maximum(
                    acc, 0.0).astype(f_ref.dtype)
                return 0

            jax.lax.fori_loop(0, nj, phase_d, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        _full_spec(km_pack.shape), _full_spec(kb.shape),
        _full_spec(mix_pack.shape), _full_spec(mb.shape),
        _full_spec(h1.shape), _full_spec(h2.shape),
    ]
    operands = [x, km_pack, kb.astype(_F32), mix_pack, mb, h1, h2]
    if use_ct_w:
        in_specs += [_full_spec(t.shape) for t in wt]
        operands += list(wt)
    else:
        in_specs += [_full_spec(fwd_p.shape), _full_spec(inv_p.shape)]
        operands += [fwd_p, inv_p]
    if has_pre:
        in_specs += [_full_spec(pre_km.shape), _full_spec(pre_kb.shape)]
        operands += [pre_km, pre_kb.astype(_F32)]
    if has_skip:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(skip)
    if has_post:
        in_specs += [
            _full_spec(post_km.shape), _full_spec(post_kb.shape),
            pl.BlockSpec((1, 1, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [post_km, post_kb.astype(_F32), img]
    scratch = [
        pltpu.VMEM((c, 2 * kp, h), _BF16),
        pltpu.VMEM((c, 2 * kp, h), _BF16),
        pltpu.VMEM((c, (tha + 2) * w), x.dtype),
    ]
    if use_ct_w:
        scratch += [pltpu.VMEM((c, h), _F32), pltpu.VMEM((c, h), _F32)]
    if has_pre:
        scratch.append(pltpu.VMEM((c_in, (tha + 4) * w), x.dtype))
    if has_skip:
        scratch.append(pltpu.VMEM((c, (tha + 2) * w), x.dtype))
    if h % 128 != 0:  # need_fold stage-B relayout staging
        scratch += [pltpu.VMEM((2 * c, tc * h), _F32),
                    pltpu.VMEM((2 * c, tc, h), _F32)]
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    out_shape = jax.ShapeDtypeStruct((n, c, hw), x.dtype)
    out_spec = pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    if has_post:
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n, 1, hw), img.dtype))
        out_spec = (out_spec,
                    pl.BlockSpec((1, 1, hw), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        compiler_params=_vmem(120, interpret),
        interpret=interpret,
    )(*operands)


def _pick_tc(kp: int) -> int:
    return 96 if kp % 96 == 0 else kp


def _spectral_tables(h, w, precision, pw=None, use_ct_w=None,
                     interpret=False):
    packed = bool(pw and pw != w)
    p_wf = _stage_prec(precision, "wf")
    p_wi = _stage_prec(precision, "wi")
    p_hf = _stage_prec(precision, "hf")
    p_hi = _stage_prec(precision, "hi")
    if use_ct_w is None:
        # production gate: the unpacked 512-wide path (m = 128 keeps every
        # lane slice tile-aligned); interpret-mode tests force it at any
        # w = 4m with m even
        use_ct_w = (not packed) and w % 512 == 0
    wt = None
    if use_ct_w:
        assert not packed, "CT-W and the packed layout are exclusive"
        m_w = w // 4
        kp = 2 * m_w           # 4 digit groups x mt = m/2 entries
        tc = m_w // 2          # one digit group per stage-B chunk
        wt = tuple(jnp.asarray(t)
                   for t in _w_ct_folded_np(w, p_wf, p_wi))
        fwd_p = inv_p = None
    elif packed:
        assert w == 2 * pw, (w, pw)  # packed pairs
        kp = 2 * _pad_k(pw // 2 + 1)
        tc = _pick_tc(kp)
        fwd_p, inv_p = (jnp.asarray(t) for t in
                        _w_tables_packed_np(pw, kp, tc, p_wf, p_wi))
    else:
        kp = _pad_k(w // 2 + 1)
        tc = _pick_tc(kp)
        fwd_p, inv_p = (jnp.asarray(t)
                        for t in _w_tables_np(w, kp, tc, p_wf, p_wi))
    # radix-4 CT-H needs m = h/4 lanes per sub-DFT row group; Mosaic rejects
    # the group concats when m is not a whole 128-lane tile (probed on-chip
    # at h = 64: "offset mismatch on non-concat dimension"). At small h the
    # dense (h, 2h) factor is a single full-lane MXU dot anyway — use it.
    # Interpret mode (CPU tests) keeps CT coverage at any 8-aligned m.
    use_ct = (h % 4 == 0 and (h // 4) % 8 == 0
              and (interpret or (h // 4) % 128 == 0))
    if use_ct:
        # twiddle-folded per-digit factor stacks (h1 = forward, h2 = inverse)
        h1, h2 = _h_ct_folded_np(h, p_hf, p_hi)
    else:
        # the dense H table serves BOTH directions: pack hi/lo if either
        # stage asks for two passes
        p_h = "bf16x2" if "bf16x2" in (p_hf, p_hi) else "bf16"
        h1 = _h_dense_tables_np(h, p_h)
        h2 = np.zeros((1, 1), np.float32)
    return (kp, tc, use_ct, use_ct_w, fwd_p, inv_p, wt, jnp.asarray(h1),
            jnp.asarray(h2))


def fft_block_nchw(x, img_kmat_pack, img_bias, mix_pack, bias_col,
                   h, w, precision="bf16x2", bound_dtype=jnp.bfloat16,
                   fused=True, pre_kmat_pack=None, pre_bias=None, skip=None,
                   post_kmat_pack=None, post_bias=None, post_img=None,
                   interpret=False, pw=None, use_ct_w=None):
    """One Res-FFT-Conv block (reference arch/Ours/networks.py:15-36) on an
    (N, C, H*W) channel-major activation:
    out = x + relu(conv3x3(x)+b) + irfft2(relu(mix([Re;Im] rfft2(x)))).

    fused=True runs the whole block as one kernel per sample (scratch-
    resident spectral boundaries); fused=False runs the 4-kernel pipeline
    (same math, HBM boundaries). With pre_kmat_pack/pre_bias (and
    optionally skip), the fused kernel also computes the LAYER conv
    feeding the block: x <- relu(pre_conv(x) + pre_b [+ skip]).
    """
    (kp, tc, use_ct, use_ct_w, fwd_p, inv_p, wt, h1, h2) = (
        _spectral_tables(h, w, precision, pw=pw,
                         use_ct_w=use_ct_w if fused else False,
                         interpret=interpret))
    if fused:
        return _block_fused_call(
            x, img_kmat_pack, img_bias, fwd_p, mix_pack, bias_col,
            h1, h2, inv_p, wt, pre_kmat_pack, pre_bias, skip,
            post_kmat_pack, post_bias, post_img,
            h, w, kp, tc, precision, use_ct, use_ct_w,
            pre_kmat_pack is not None, skip is not None,
            post_kmat_pack is not None, interpret, pw or w)
    # the unfused 4-kernel pipeline keeps the dense W factors: it is the
    # structural cross-check the CT-W fused path is tested against
    assert pre_kmat_pack is None and skip is None, (
        "layer-conv fusion requires fused=True")
    res = conv3x3(x, img_kmat_pack, img_bias, h, w, relu=True, residual=True,
                  interpret=interpret, pw=pw)
    z = _stage_a_call(x, fwd_p, h, w, kp, precision,
                      jnp.dtype(bound_dtype).name, interpret)
    t = _stage_b_call(z, mix_pack, bias_col, h1, h2,
                      h, kp, tc, precision, use_ct, interpret)
    return _stage_c_call(t, inv_p, res, h, w, precision,
                         jnp.dtype(x.dtype).name, interpret)


def prep_generator_params(params, num_layers: int, conv_precision: str = "bf16",
                          mix_precision: str = "bf16x2"):
    """Flax ResFFTGenerator param tree -> packed pipeline weights.

    Returns a dict of stacked/packed arrays; pure jnp ops so it can run
    inside jit (weights are tiny)."""
    L = num_layers
    out = {"enc0_k": params["enc_0"]["kernel"],
           "enc0_b": params["enc_0"]["bias"],
           "enc0_pre": (_pack_traced(conv_kmat(params["enc_0"]["kernel"]),
                                     conv_precision),
                        params["enc_0"]["bias"][:, None].astype(_F32)),
           "dec0_k": params["dec_0"]["kernel"],
           "dec0_b": params["dec_0"]["bias"],
           "dec0_post": (_pack_traced(conv_kmat(params["dec_0"]["kernel"],
                                                flip=True), conv_precision),
                         params["dec_0"]["bias"][:, None].astype(_F32))}
    enc, dec, blocks = [], [], []
    for i in range(1, L + 1):
        p = params[f"enc_{i}"]
        enc.append((_pack_traced(conv_kmat(p["kernel"]), conv_precision),
                    p["bias"][:, None].astype(_F32)))
        p = params[f"dec_{i}"]
        dec.append((_pack_traced(conv_kmat(p["kernel"], flip=True),
                                 conv_precision),
                    p["bias"][:, None].astype(_F32)))
    for i in range(2 * L + 1):
        p = params[f"fft_{i}"]
        blocks.append((
            _pack_traced(conv_kmat(p["img_kernel"]), conv_precision),
            p["img_bias"][:, None].astype(_F32),
            _pack_traced(p["fft_kernel"].T, mix_precision),
            p["fft_bias"][:, None].astype(_F32),
        ))
    out["enc"], out["dec"], out["blocks"] = enc, dec, blocks
    return out


def resfft_generator_nchw(params, x, num_layers: int = 10,
                          precision: str = "bf16",
                          conv_precision: str = "bf16",
                          act_dtype=jnp.bfloat16,
                          interpret: Optional[bool] = None,
                          pack: int = 1, use_ct_w: Optional[bool] = None):
    """Full ResFFT generator forward (reference arch/Ours/networks.py:95-164)
    through the channel-major Pallas pipeline.

    params: the flax ResFFTGenerator "params" tree (trained with the einsum
    path — identical parameter structure). x: (N, H, W, 1). Returns
    (N, H, W, 1) in x.dtype.

    pack=2 lays out PAIRS of samples side by side along the lane (W) axis —
    the training-patch geometry (64x64 -> 128-lane-dense rows): seam-masked
    convs + block-diagonal W-DFT tables keep the samples independent while
    every kernel runs full-width. Requires even N.

    precision accepts "bf16x2"/"bf16"/"tf32" (uniform) or a per-stage
    "sp:XXXXX" spec (see module header): each spectral stage's MXU pass
    count becomes a table-build-time decision, measured per stage in
    tools/precision_sweep.py (round 5 error budget).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, w, _ = x.shape
    L = num_layers
    pp = prep_generator_params(params, L, conv_precision=conv_precision,
                               mix_precision=_stage_prec(precision, "mix"))
    act = jnp.dtype(act_dtype)

    # entry conv (C_in=1) in XLA NHWC, then channel-major. (Fusing it into
    # block 0 like the other layer convs fails in Mosaic: DMA-slicing a
    # single-sublane (C_in=1) HBM operand is rejected — measured r3.)
    h0 = jax.lax.conv_general_dilated(
        x.astype(act), pp["enc0_k"].astype(act), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h0 = jax.nn.relu(h0 + pp["enc0_b"].astype(act))
    if pack == 2:
        assert n % 2 == 0, n
        nn_, pw, w_eff = n // 2, w, 2 * w
        c = h0.shape[-1]
        a = h0.reshape(nn_, 2, h, w, c).transpose(0, 4, 2, 1, 3).reshape(
            nn_, c, h * w_eff)
        img32 = x.reshape(nn_, 2, h, w, 1).transpose(0, 4, 2, 1, 3).reshape(
            nn_, 1, h * w_eff).astype(jnp.float32)
    else:
        nn_, pw, w_eff = n, None, w
        a = jnp.transpose(h0, (0, 3, 1, 2)).reshape(n, -1, h * w)
        c = a.shape[1]
        img32 = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, 1, h * w).astype(
            jnp.float32)

    def blk(a_, i, pre=None, skip=None, post=None):
        km, kb, mixp, mb = pp["blocks"][i]
        pkm, pkb = pre if pre is not None else (None, None)
        qkm, qkb = post if post is not None else (None, None)
        return fft_block_nchw(a_, km, kb, mixp, mb, h, w_eff,
                              precision=precision,
                              pre_kmat_pack=pkm, pre_bias=pkb, skip=skip,
                              post_kmat_pack=qkm, post_bias=qkb,
                              post_img=img32 if post is not None else None,
                              interpret=interpret, pw=pw, use_ct_w=use_ct_w)

    # every layer conv (enc_i/dec_i, reference networks.py:95-164) fuses
    # into the block kernel that consumes its output: the whole generator
    # interior is 2L+1 kernels, one per Res-FFT block
    skips = []
    for i in range(L):
        a = blk(a, i, pre=pp["enc"][i - 1] if i > 0 else None)
        skips.append(a)

    a = blk(a, L, pre=pp["enc"][L - 1])
    for i in range(L - 1, 1, -1):
        a = blk(a, 2 * L - i, pre=pp["dec"][i], skip=skips[i])
    if L > 1:
        a = blk(a, 2 * L - 1, pre=pp["dec"][1], skip=skips[1])
    # last block carries the exit deconv + image residual as its phase D
    _, final = blk(a, 2 * L, pre=pp["dec"][0], skip=skips[0],
                   post=pp["dec0_post"])
    if pack == 2:
        return final.reshape(n // 2, 1, h, 2, w).transpose(
            0, 3, 2, 4, 1).reshape(n, h, w, 1).astype(x.dtype)
    return jnp.transpose(final.reshape(n, 1, h, w),
                         (0, 2, 3, 1)).astype(x.dtype)


@lru_cache(maxsize=32)
def _generator_jit(num_layers: int, precision: str, conv_precision: str,
                   act_name: str, interpret: bool, pack: int,
                   use_ct_w: Optional[bool]):
    return jax.jit(partial(
        resfft_generator_nchw, num_layers=num_layers, precision=precision,
        conv_precision=conv_precision, act_dtype=jnp.dtype(act_name),
        interpret=interpret, pack=pack, use_ct_w=use_ct_w))


def resfft_generator_jit(params, x, num_layers: int = 10,
                         precision: str = "bf16",
                         conv_precision: str = "bf16",
                         act_dtype=jnp.bfloat16,
                         interpret: Optional[bool] = None,
                         pack: int = 1, use_ct_w: Optional[bool] = None):
    """resfft_generator_nchw behind a cached whole-program jit.

    The eager form dispatches prep_generator_params' ~100 small packing ops
    plus ~25 kernel calls through the runtime on EVERY call — measured
    2.93 s/call at batch 4 through the r5 axon tunnel vs ~50 ms of device
    time (host-dispatch-bound, PERF.md r5). One traced program removes the
    per-call host work; params stay an argument so new checkpoints don't
    retrace."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _generator_jit(num_layers, precision, conv_precision,
                          jnp.dtype(act_dtype).name, interpret, pack,
                          use_ct_w)(params, x)
