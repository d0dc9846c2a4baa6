"""Fused Pallas training path for the packed 64x64 patch geometry:
block-level `jax.custom_vjp` whose FORWARD is the channel-major fused
block kernel (ops/pallas_pipeline.py) and whose BACKWARD is a single
fused kernel per block — recompute + adjoint transforms + in-kernel
weight-gradient contractions, nothing spectral ever touching HBM.

Reference step this accelerates: the generator forward/backward inside
/root/reference/engine.py:26-76 for arch/Ours/networks.py:95-164
(ResFFT_Generator with FFT_ConvBlock, networks.py:15-36).

Design (PERF.md "Route to a fused Pallas training BACKWARD"):

* custom_vjp sits at the BLOCK level; JAX AD composes the 21-block chain,
  the encoder/decoder skips, and the entry conv. The saved residuals are
  exactly the block INPUTS the forward chain materializes anyway — the
  natural "save block inputs, recompute intra-block" remat policy.
* The ortho H-DFT helpers are a self-adjoint pair in the real-linear
  [Re|Im] representation: adj(H_fwd) = H_inv and adj(H_inv) = H_fwd
  (cos/sin factor matrices are symmetric, so this holds for the ROUNDED
  bf16x2 tables bit-for-bit). The W factor packs adjoint by transposing
  the matrix dims of each pass; the conv adjoint is the io-transposed
  spatially-flipped im2col matrix.
* At training shapes (h = 64 < 128) a whole packed pair fits one VMEM
  chunk: nj == nb == 1, no halo DMAs — the backward is a straight-line
  program per grid step.
* WEIGHT grads stay in-kernel as minor-dim dot_general contractions
  (probed supported on-chip); only (c, 9c)-sized per-pair partials reach
  HBM, summed over the batch by XLA outside.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtd_gan_tpu.ops.pallas_pipeline import (
    _BF16,
    _F32,
    _block_fused_call,
    _dense_h_fwd,
    _dense_h_inv,
    _full_spec,
    _h_dense_tables_np,
    _make_dots,
    _make_dots_left,
    _pack_traced,
    _pad_k,
    _pick_tc,
    _vmem,
    _w_tables_packed_np,
    conv_kmat,
)

Array = jax.Array


# --------------------------------------------------------------------------
# adjoint factor tables
# --------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _w_tables_packed_adj_np(pw: int, kp: int, tc: int, precision: str):
    """Adjoint (matrix-transposed) packed W-DFT factor packs.

    The kernels compute z = x @ f and out = a @ inv; their input
    cotangents are xbar = zbar @ f^T and abar = gbar @ inv^T. Transposing
    the PACK (after rounding) keeps the adjoint exact w.r.t. the rounded
    forward matrices."""
    fwd, inv = _w_tables_packed_np(pw, kp, tc, precision)
    return (np.ascontiguousarray(np.transpose(fwd, (0, 2, 1))),
            np.ascontiguousarray(np.transpose(inv, (0, 2, 1))))


def _adj_kmat(km: Array, c_out: int, c_in: int) -> Array:
    """(c_out, 9*c_in) im2col conv matrix -> its adjoint conv matrix
    (c_in, 9*c_out): spatially flipped, io-transposed. The adjoint of the
    seam-masked 'same' zero-padded 3x3 conv is the seam-masked 'same' conv
    with this kernel."""
    k4 = km.reshape(c_out, 3, 3, c_in)
    return k4[:, ::-1, ::-1, :].transpose(3, 1, 2, 0).reshape(c_in, 9 * c_out)


def kmat_grad_to_hwio(dkm: Array, c_in: int, flip: bool = False) -> Array:
    """Map a (c_out, 9*c_in) im2col-matrix cotangent back to the HWIO
    kernel cotangent (inverse of :func:`conv_kmat`'s permutation)."""
    c_out = dkm.shape[0]
    k = dkm.reshape(c_out, 3, 3, c_in).transpose(1, 2, 3, 0)
    if flip:
        k = k[::-1, ::-1]
    return k


# --------------------------------------------------------------------------
# the fused block backward kernel (train geometry: nj == nb == 1, dense
# H and dense packed W factors)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=(
    "h", "w", "pw", "kp", "tc", "precision", "conv_precision",
    "has_pre", "has_skip", "has_post", "interpret"))
def _block_bwd_call(x, skip, img, g, gfin,
                    km_pack, kadj_pack, kb,
                    mix_pack, mixT_pack, mb,
                    f_pack, fT_pack, inv_pack, invT_pack, h_cs,
                    pkm_pack, padj_pack, pkb,
                    postkm_pack, postadj_pack, postkb,
                    h, w, pw, kp, tc, precision, conv_precision,
                    has_pre, has_skip, has_post, interpret):
    """Backward of one fused Res-FFT-Conv block at the packed training
    geometry. Recomputes the forward in-kernel (residual = block input
    only), runs the adjoint transforms, and contracts the per-pair weight
    gradients on the MXU.

    Returns (xbar, dkm, dkb, dmix, dmb[, skipbar][, dpkm, dpkb]
    [, imgbar, dpostkm, dpostkb]); weight-grad leaves are per-pair
    partials (n, ...) summed by the caller."""
    n, c_in, hw = x.shape
    c = km_pack.shape[1]
    assert h * w == hw and w == 2 * pw and kp == tc, (h, w, pw, kp, tc)
    assert h % 8 == 0 and tc % 8 == 0
    r = c * tc
    dots = _make_dots(precision)
    dots_l = _make_dots_left(precision)
    conv_dots_l = _make_dots_left(conv_precision)
    ew = (h + 2) * w
    act = x.dtype

    def _masked_rolls(buf):
        col = jax.lax.broadcasted_iota(jnp.int32, (buf.shape[0], ew), 1) % pw
        b32 = buf.astype(_F32)
        plus = jnp.where(col == pw - 1, 0.0,
                         pltpu.roll(b32, shift=ew - 1, axis=1)
                         ).astype(buf.dtype)
        minus = jnp.where(col == 0, 0.0,
                          pltpu.roll(b32, shift=1, axis=1)).astype(buf.dtype)
        return minus, plus

    def _im2col(buf):
        minus, plus = _masked_rolls(buf)
        slabs = []
        for dy in (-1, 0, 1):
            lo, hi = (1 + dy) * w, (1 + dy + h) * w
            slabs.extend([minus[:, lo:hi], buf[:, lo:hi], plus[:, lo:hi]])
        return jnp.concatenate(slabs, axis=0)  # (9*rows, h*w)

    def _pad_ext(ext, val):
        ext[:, 0:w] = jnp.zeros((val.shape[0], w), ext.dtype)
        ext[:, w:(h + 1) * w] = val.astype(ext.dtype)
        ext[:, (h + 1) * w:] = jnp.zeros((val.shape[0], w), ext.dtype)

    def _wgrad(a, b):
        """(ca, hw) x (cb, hw) -> (ca, cb) minor-dim contraction (MXU)."""
        return jax.lax.dot_general(
            a.astype(_BF16), b.astype(_BF16),
            (((1,), (1,)), ((), ())), preferred_element_type=_F32)

    def _fold(xr, xi, fref):
        """(r, h) x2 -> (2c, tc*h) staged through scratch (h < 128)."""
        xr3 = xr.reshape(c, tc, h)
        xi3 = xi.reshape(c, tc, h)
        for t in range(tc):
            fref[:c, t * h:(t + 1) * h] = xr3[:, t, :].astype(fref.dtype)
            fref[c:, t * h:(t + 1) * h] = xi3[:, t, :].astype(fref.dtype)

    def _unfold(s, uref):
        """(2c, tc*h) value -> ((r, h), (r, h)) staged through scratch."""
        for t in range(tc):
            uref[:, t, :] = s[:, t * h:(t + 1) * h]
        return uref[:c].reshape(r, h), uref[c:].reshape(r, h)

    def _spec_to_rh(z):
        """stage-A layout (c*h, 2kp) -> H-major ((r, h), (r, h))."""
        z3 = z.reshape(c, h, 2 * kp).transpose(0, 2, 1)  # (c, 2kp, h)
        return (z3[:, :kp, :].reshape(r, h),
                z3[:, kp:, :].reshape(r, h))

    def kern(*refs):
        idx = 0
        x_b = refs[idx]; idx += 1
        g_b = refs[idx]; idx += 1
        if has_skip:
            s_b = refs[idx]; idx += 1
        if has_post:
            img_b = refs[idx]; idx += 1
            gfin_b = refs[idx]; idx += 1
        (km_r, kadj_r, kb_r, mix_r, mixT_r, mb_r,
         f_r, fT_r) = refs[idx:idx + 8]
        idx += 8
        if has_post:
            inv_r = refs[idx]; idx += 1
        invT_r = refs[idx]; idx += 1
        hcs_r = refs[idx]; idx += 1
        if has_pre:
            pkm_r, padj_r, pkb_r = refs[idx:idx + 3]
            idx += 3
        if has_post:
            postkm_r, postadj_r, postkb_r = refs[idx:idx + 3]
            idx += 3
        # outputs
        xbar_o = refs[idx]; idx += 1
        dkm_o, dkb_o, dmix_o, dmb_o = refs[idx:idx + 4]
        idx += 4
        if has_skip:
            sbar_o = refs[idx]; idx += 1
        if has_pre:
            dpkm_o, dpkb_o = refs[idx:idx + 2]
            idx += 2
        if has_post:
            imgbar_o, dpostkm_o, dpostkb_o = refs[idx:idx + 3]
            idx += 3
        # scratch
        extx, exth, extg, sscr_in, fscr, uscr, zscr3 = refs[idx:idx + 7]
        idx += 7
        if has_post:
            ext1 = refs[idx]

        # ================= forward recompute =================
        if has_pre:
            _pad_ext(extx, x_b[0])
            x9p = _im2col(extx[:])                     # (9*c_in, hw)
            pre_act = conv_dots_l(pkm_r, x9p) + pkb_r[:]
            if has_skip:
                pre_act = pre_act + s_b[0].astype(_F32)
            hin = jnp.maximum(pre_act, 0.0).astype(act)  # (c, hw)
        else:
            hin = x_b[0]
        _pad_ext(exth, hin)
        x9 = _im2col(exth[:])                           # (9c, hw)
        res_pre = conv_dots_l(km_r, x9) + kb_r[:]       # (c, hw) f32

        xs = exth[:, w:(h + 1) * w].reshape(c * h, w)   # hin, (c*h, w)
        (z,) = dots(xs, f_r)                            # (c*h, 2kp) f32
        ar, ai = _spec_to_rh(z.astype(_BF16).astype(_F32))
        xr, xi = _dense_h_fwd(ar, ai, hcs_r, dots, r, h)
        _fold(xr, xi, sscr_in)                          # s_in bf16
        s_in = sscr_in[:]
        s_pre = dots_l(mix_r, s_in) + mb_r[:]           # (2c, tc*h) f32

        # ================= backward =================
        if has_post:
            # finish the forward: spec + out, then the exit deconv
            s_out = jnp.maximum(s_pre, 0.0)
            yr, yi = _unfold(s_out, uscr)
            tr, ti = _dense_h_inv(yr, yi, hcs_r, dots, r, h)
            zscr3[:, :kp, :] = tr.reshape(c, tc, h).astype(zscr3.dtype)
            zscr3[:, kp:, :] = ti.reshape(c, tc, h).astype(zscr3.dtype)
            a_cin = zscr3[:].transpose(0, 2, 1).reshape(c * h, 2 * kp)
            (spec,) = dots(a_cin.astype(_BF16), inv_r)  # (c*h, w)
            out = (hin.astype(_F32) + jnp.maximum(res_pre, 0.0)
                   + spec.reshape(c, hw))
            _pad_ext(extg, out.astype(act))
            out9 = _im2col(extg[:])                     # (9c, hw)
            post_pre = (conv_dots_l(postkm_r, out9) + postkb_r[:]
                        + img_b[0].astype(_F32))        # (1, hw)
            dpost = gfin_b[0].astype(_F32) * (post_pre > 0)
            imgbar_o[0] = dpost
            dpostkm_o[0] = _wgrad(dpost, out9)
            dpostkb_o[0] = jnp.sum(dpost, axis=1, keepdims=True)
            # adjoint of the post conv feeds the block-output cotangent
            _pad_ext(ext1, dpost)
            d9 = _im2col(ext1[:])                       # (9, hw)
            g = conv_dots_l(postadj_r, d9) + g_b[0].astype(_F32)
        else:
            g = g_b[0].astype(_F32)                     # (c, hw)

        # identity + residual-conv paths
        hbar = g
        gres = g * (res_pre > 0)                        # (c, hw) f32
        dkm_o[0] = _wgrad(gres, x9)
        dkb_o[0] = jnp.sum(gres, axis=1, keepdims=True)
        _pad_ext(extg, gres.astype(act))
        g9 = _im2col(extg[:])                           # (9c, hw)
        hbar = hbar + conv_dots_l(kadj_r, g9)

        # spectral path adjoint
        gs = g.astype(_BF16).reshape(c * h, w)
        (abar,) = dots(gs, invT_r)                      # (c*h, 2kp)
        tbr, tbi = _spec_to_rh(abar)
        sbr, sbi = _dense_h_fwd(tbr, tbi, hcs_r, dots, r, h)  # adj(H_inv)
        _fold(sbr, sbi, fscr)
        sbar_relu = fscr[:]                             # (2c, tc*h) f32
        sbar_pre = sbar_relu * (s_pre > 0)
        dmix_o[0] = _wgrad(sbar_pre, s_in)
        dmb_o[0] = jnp.sum(sbar_pre, axis=1, keepdims=True)
        zbar_fold = dots_l(mixT_r, sbar_pre.astype(_BF16))
        zbr, zbi = _unfold(zbar_fold, uscr)
        abr, abi = _dense_h_inv(zbr, zbi, hcs_r, dots, r, h)  # adj(H_fwd)
        zscr3[:, :kp, :] = abr.reshape(c, tc, h).astype(zscr3.dtype)
        zscr3[:, kp:, :] = abi.reshape(c, tc, h).astype(zscr3.dtype)
        zbar = zscr3[:].transpose(0, 2, 1).reshape(c * h, 2 * kp)
        (xsbar,) = dots(zbar.astype(_BF16), fT_r)       # (c*h, w)
        hbar = hbar + xsbar.reshape(c, hw)

        if has_pre:
            dpre = hbar * (pre_act > 0)                 # (c, hw) f32
            if has_skip:
                sbar_o[0] = dpre.astype(sbar_o.dtype)
            dpkm_o[0] = _wgrad(dpre, x9p)
            dpkb_o[0] = jnp.sum(dpre, axis=1, keepdims=True)
            _pad_ext(extg, dpre.astype(act))
            d9p = _im2col(extg[:])                      # (9c, hw)
            xbar_o[0] = (conv_dots_l(padj_r, d9p)).astype(xbar_o.dtype)
        else:
            xbar_o[0] = hbar.astype(xbar_o.dtype)

    # ---- specs ----
    def blk(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * (_nd),
                            memory_space=pltpu.VMEM)

    in_specs = [blk((c_in, hw)), blk((c, hw))]
    operands = [x, g]
    if has_skip:
        in_specs.append(blk((c, hw)))
        operands.append(skip)
    if has_post:
        in_specs += [blk((1, hw)), blk((1, hw))]
        operands += [img, gfin]
    packs = [km_pack, kadj_pack, kb.astype(_F32), mix_pack, mixT_pack,
             mb.astype(_F32), f_pack, fT_pack]
    if has_post:
        packs.append(inv_pack)
    packs += [invT_pack, h_cs]
    if has_pre:
        packs += [pkm_pack, padj_pack, pkb.astype(_F32)]
    if has_post:
        packs += [postkm_pack, postadj_pack, postkb.astype(_F32)]
    in_specs += [_full_spec(p.shape) for p in packs]
    operands += packs

    out_shapes = [jax.ShapeDtypeStruct((n, c_in, hw), act),
                  jax.ShapeDtypeStruct((n, c, 9 * c), _F32),
                  jax.ShapeDtypeStruct((n, c, 1), _F32),
                  jax.ShapeDtypeStruct((n, 2 * c, 2 * c), _F32),
                  jax.ShapeDtypeStruct((n, 2 * c, 1), _F32)]
    out_specs = [blk((c_in, hw)), blk((c, 9 * c)), blk((c, 1)),
                 blk((2 * c, 2 * c)), blk((2 * c, 1))]
    if has_skip:
        out_shapes.append(jax.ShapeDtypeStruct((n, c, hw), act))
        out_specs.append(blk((c, hw)))
    if has_pre:
        out_shapes += [jax.ShapeDtypeStruct((n, c, 9 * c_in), _F32),
                       jax.ShapeDtypeStruct((n, c, 1), _F32)]
        out_specs += [blk((c, 9 * c_in)), blk((c, 1))]
    if has_post:
        out_shapes += [jax.ShapeDtypeStruct((n, 1, hw), _F32),
                       jax.ShapeDtypeStruct((n, 1, 9 * c), _F32),
                       jax.ShapeDtypeStruct((n, 1, 1), _F32)]
        out_specs += [blk((1, hw)), blk((1, 9 * c)), blk((1, 1))]

    scratch = [
        pltpu.VMEM((c_in, ew), act),          # extx
        pltpu.VMEM((c, ew), act),             # exth
        pltpu.VMEM((c, ew), act),             # extg (reused)
        pltpu.VMEM((2 * c, tc * h), _BF16),   # sscr_in (mix input)
        pltpu.VMEM((2 * c, tc * h), _F32),    # fscr (sbar fold)
        pltpu.VMEM((2 * c, tc, h), _F32),     # uscr (unfolds)
        pltpu.VMEM((c, 2 * kp, h), _F32),     # zscr3 (spectral staging)
    ]
    if has_post:
        scratch.append(pltpu.VMEM((1, ew), _F32))  # ext1 (dpost padding)

    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        compiler_params=_vmem(120, interpret),
        interpret=interpret,
    )(*operands)


# --------------------------------------------------------------------------
# block-level custom_vjp + the trainable packed generator
# --------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _make_block_train(h, w, pw, kp, tc, c, c_in, precision, conv_precision,
                      has_pre, has_skip, has_post, interpret, act_name):
    """Factory: a custom_vjp'd fused block for one static configuration.

    The differentiable inputs are the UNPACKED f32 weight matrices
    (im2col conv matrices + the (2c, 2c) spectral mix), so the returned
    cotangents stay f32 — bf16x2 packing happens inside both the primal
    and the backward (the hi/lo split is AD-transparent: the lo path's
    tangent is exactly zero)."""
    act = jnp.dtype(act_name)

    def _packs(wts):
        km_p = _pack_traced(wts["km"], conv_precision)
        mix_p = _pack_traced(wts["mix"], precision)
        pre = (_pack_traced(wts["pkm"], conv_precision) if has_pre else None)
        post = (_pack_traced(wts["postkm"], conv_precision)
                if has_post else None)
        return km_p, mix_p, pre, post

    # spectral tables: dense H + dense packed W (the train geometry; the
    # TPU production gate picks the same at h = 64, see _spectral_tables)
    f_np, inv_np = _w_tables_packed_np(pw, kp, tc, precision)
    fT_np, invT_np = _w_tables_packed_adj_np(pw, kp, tc, precision)
    hcs_np = _h_dense_tables_np(h, precision)
    twc0 = np.zeros((4, 1), np.float32)

    def primal(x, skip, img, wts):
        km_p, mix_p, pre_p, post_p = _packs(wts)
        return _block_fused_call(
            x, km_p, wts["kb"], jnp.asarray(f_np), mix_p, wts["mb"],
            jnp.asarray(hcs_np), jnp.asarray(twc0),
            jnp.asarray(inv_np), None,
            pre_p, wts["pkb"] if has_pre else None, skip,
            post_p, wts["postkb"] if has_post else None, img,
            h, w, kp, tc, precision, False, False,
            has_pre, has_skip, has_post, interpret, pw)

    @jax.custom_vjp
    def block(x, skip, img, wts):
        return primal(x, skip, img, wts)

    def fwd(x, skip, img, wts):
        return primal(x, skip, img, wts), (x, skip, img, wts)

    def bwd(res, ct):
        x, skip, img, wts = res
        if has_post:
            gout, gfin = ct
        else:
            gout, gfin = ct, None
        km_p, mix_p, pre_p, post_p = _packs(wts)
        kadj_p = _pack_traced(_adj_kmat(wts["km"], c, c), conv_precision)
        mixT_p = _pack_traced(wts["mix"].T, precision)
        padj_p = (_pack_traced(_adj_kmat(wts["pkm"], c, c_in),
                               conv_precision) if has_pre else None)
        postadj_p = (_pack_traced(_adj_kmat(wts["postkm"], 1, c),
                                  conv_precision) if has_post else None)
        outs = _block_bwd_call(
            x, skip, img, gout.astype(act), gfin,
            km_p, kadj_p, wts["kb"], mix_p, mixT_p, wts["mb"],
            jnp.asarray(f_np), jnp.asarray(fT_np),
            jnp.asarray(inv_np), jnp.asarray(invT_np),
            jnp.asarray(hcs_np),
            pre_p, padj_p, wts["pkb"] if has_pre else None,
            post_p, postadj_p, wts["postkb"] if has_post else None,
            h, w, pw, kp, tc, precision, conv_precision,
            has_pre, has_skip, has_post, interpret)
        it = iter(outs)
        xbar = next(it)
        dwts = {"km": jnp.sum(next(it), axis=0),
                "kb": jnp.sum(next(it), axis=0),
                "mix": jnp.sum(next(it), axis=0),
                "mb": jnp.sum(next(it), axis=0)}
        skipbar = next(it) if has_skip else None
        if has_pre:
            dwts["pkm"] = jnp.sum(next(it), axis=0)
            dwts["pkb"] = jnp.sum(next(it), axis=0)
        imgbar = None
        if has_post:
            imgbar = next(it)
            dwts["postkm"] = jnp.sum(next(it), axis=0)
            dwts["postkb"] = jnp.sum(next(it), axis=0)
        return xbar, skipbar, imgbar, dwts

    block.defvjp(fwd, bwd)
    return block


def resfft_generator_train(params, x, num_layers: int = 10,
                           precision: str = "bf16x2",
                           conv_precision: str = "bf16",
                           act_dtype=jnp.bfloat16,
                           interpret: Optional[bool] = None):
    """Differentiable packed-pair Pallas ResFFT generator: identical
    primal to `resfft_generator_nchw(pack=2)` (dense spectral factors at
    the 64x64 geometry) with a fused Pallas BACKWARD per block.

    x: (N, h, pw, 1), N even. Returns (N, h, pw, 1) in x.dtype.
    Reference: arch/Ours/networks.py:95-164; engine.py:26-76."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, h, pw, _ = x.shape
    assert n % 2 == 0, n
    w = 2 * pw
    L = num_layers
    act = jnp.dtype(act_dtype)
    kp = 2 * _pad_k(pw // 2 + 1)
    tc = _pick_tc(kp)

    # entry conv (XLA, standard AD) then pack pairs channel-major
    k0, b0 = params["enc_0"]["kernel"], params["enc_0"]["bias"]
    h0 = jax.lax.conv_general_dilated(
        x.astype(act), k0.astype(act), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h0 = jax.nn.relu(h0 + b0.astype(act))
    c = h0.shape[-1]
    nn_ = n // 2
    a = h0.reshape(nn_, 2, h, pw, c).transpose(0, 4, 2, 1, 3).reshape(
        nn_, c, h * w)
    img32 = x.reshape(nn_, 2, h, pw, 1).transpose(0, 4, 2, 1, 3).reshape(
        nn_, 1, h * w).astype(_F32)

    def wts_for(i, pre_kernel=None, pre_flip=False, post=False):
        p = params[f"fft_{i}"]
        wts = {"km": conv_kmat(p["img_kernel"]).astype(_F32),
               "kb": p["img_bias"][:, None].astype(_F32),
               "mix": p["fft_kernel"].T.astype(_F32),
               "mb": p["fft_bias"][:, None].astype(_F32)}
        if pre_kernel is not None:
            q = params[pre_kernel]
            wts["pkm"] = conv_kmat(q["kernel"], flip=pre_flip).astype(_F32)
            wts["pkb"] = q["bias"][:, None].astype(_F32)
        if post:
            q = params["dec_0"]
            wts["postkm"] = conv_kmat(q["kernel"], flip=True).astype(_F32)
            wts["postkb"] = q["bias"][:, None].astype(_F32)
        return wts

    def blk(a_, i, pre=None, pre_flip=False, skip=None, post=False):
        fn = _make_block_train(
            h, w, pw, kp, tc, c, c, precision, conv_precision,
            pre is not None, skip is not None, post, interpret, act.name)
        return fn(a_, skip, img32 if post else None,
                  wts_for(i, pre, pre_flip, post))

    # identical chain to resfft_generator_nchw (pp["dec"][j] == dec_{j+1}):
    # decoder block 2L-i is fed by dec_{i+1}; the LAST block is fed by
    # dec_1, consumes skips[0], and carries the dec_0 exit deconv as its
    # post phase (reference networks.py:95-164)
    skips = []
    for i in range(L):
        a = blk(a, i, pre=f"enc_{i}" if i > 0 else None)
        skips.append(a)
    a = blk(a, L, pre=f"enc_{L}")
    for i in range(L - 1, 1, -1):
        a = blk(a, 2 * L - i, pre=f"dec_{i + 1}", pre_flip=True,
                skip=skips[i])
    if L > 1:
        a = blk(a, 2 * L - 1, pre="dec_2", pre_flip=True, skip=skips[1])
    _, final = blk(a, 2 * L, pre="dec_1", pre_flip=True, skip=skips[0],
                   post=True)
    return final.reshape(n // 2, 1, h, 2, pw).transpose(
        0, 3, 2, 4, 1).reshape(n, h, pw, 1).astype(x.dtype)
