"""Pallas-fused Res-FFT-Conv spectral branch for 64x64 training patches.

The north-star fusion (BASELINE.json): rfft2 -> spectral 1x1 conv + ReLU ->
irfft2 executed as ONE kernel per sample with every intermediate held in
VMEM — zero HBM round-trips between the transforms and the channel mix.
At the 64x64 patch size the whole working set is ~3 MB, well under the
~16 MB VMEM budget; all five contractions run on the MXU via jnp.dot.

The transforms are the DFT factor matmuls of mtd_gan_tpu.ops.dft (ortho
norm, Hermitian-fold inverse), so outputs match jnp.fft to fp32 tolerance
(validated in tests/test_pallas_fftconv.py, interpret mode on CPU).

STATUS: numerically validated in interpret mode. On-device findings
(axon jaxlib 0.9 toolchain, fully bisected):
  * a reshape-free variant (static per-channel dots + the channel mix as
    plane combinations) COMPILES AND RUNS on-device at full C=32 — but
    only at default (bf16) dot precision: max err 8.8e-3 vs the tf32
    reference, too lossy for the production DFT;
  * adding `precision=` to any in-kernel dot (or a 9th (1, 2C) bias
    operand) reproducibly crashes the remote compile helper (HTTP 500,
    no diagnostics);
  * blocked lowerings, in order tried: lane-crossing reshape
    (H*C, K)->(H, C*K); dynamic_slice in fori_loop bodies (TC kernels);
    jnp.stack staging; 3-D dot_general for the channel mix.
  * split-operand tf32 emulation (3 default-precision dots per matmul,
    384 in-kernel dots) also crashes the remote compiler — the working
    configuration tops out around the 128-dot bf16 kernel.
Production TPU execution therefore uses the XLA einsum DFT path
(ops.dft): 5.2 ms for the spectral branch at the training shape
(160x64x64x32), within ~40% of the MXU tf32 roofline. Round-2 plan:
split the kernel into per-stage pallas_calls (under the dot budget each)
or move to a toolchain whose Mosaic accepts precision-controlled dots.
Full-resolution (512x512) inference keeps the XLA path regardless — that
working set exceeds VMEM.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtd_gan_tpu.ops.dft import (_dft_h_factors, _irdft_w_factors,
                                 _rdft_w_factors)

Array = jax.Array


def _spectral_math(x, wr, wi, hr, hi, ga, gb, mix, bias, out_dtype):
    """Pure math on one (H, W, C) sample, all fp32 in VMEM."""
    h, w, c = x.shape
    k = w // 2 + 1
    f32 = jnp.float32
    dot = partial(jnp.dot, preferred_element_type=f32)

    x = x.astype(f32)
    # forward W transform: contract W (trailing after transpose)
    xt = x.transpose(0, 2, 1).reshape(h * c, w)
    zr = dot(xt, wr)  # (H*C, K)
    zi = dot(xt, wi)

    # forward H transform: contract H
    zr_h = zr.reshape(h, c * k)
    zi_h = zi.reshape(h, c * k)
    or_ = dot(hr, zr_h) - dot(hi, zi_h)
    oi_ = dot(hr, zi_h) + dot(hi, zr_h)

    # channel mix + ReLU over (H*K, 2C)
    or_m = or_.reshape(h, c, k).transpose(0, 2, 1).reshape(h * k, c)
    oi_m = oi_.reshape(h, c, k).transpose(0, 2, 1).reshape(h * k, c)
    sp = jnp.concatenate([or_m, oi_m], axis=1)
    sp = jnp.maximum(dot(sp, mix) + bias, 0.0)
    re = sp[:, :c].reshape(h, k, c).transpose(0, 2, 1).reshape(h, c * k)
    im = sp[:, c:].reshape(h, k, c).transpose(0, 2, 1).reshape(h, c * k)

    # inverse H transform (conjugate factors)
    tr = dot(hr, re) + dot(hi, im)
    ti = dot(hr, im) - dot(hi, re)

    # inverse W transform with Hermitian fold: contract K
    tr_w = tr.reshape(h, c, k).reshape(h * c, k)
    ti_w = ti.reshape(h, c, k).reshape(h * c, k)
    out = dot(tr_w, ga) + dot(ti_w, gb)  # (H*C, W)
    return out.reshape(h, c, w).transpose(0, 2, 1).astype(out_dtype)


@lru_cache(maxsize=8)
def _factors(h: int, w: int) -> Tuple[Array, ...]:
    wr, wi = _rdft_w_factors(w)
    ga, gb = _irdft_w_factors(w)
    hr, hi = _dft_h_factors(h)
    return tuple(jnp.asarray(a) for a in (wr, wi, hr, hi, ga, gb))


@partial(jax.jit, static_argnames=("interpret",))
def spectral_branch_pallas(x: Array, mix: Array, bias: Array,
                           interpret: bool = False) -> Array:
    """Fused irfft2(relu(mix([Re;Im] rfft2(x)))) over NHWC x."""
    n, h, w, c = x.shape
    k = w // 2 + 1
    wr, wi, hr, hi, ga, gb = _factors(h, w)

    def kernel(x_ref, wr_ref, wi_ref, hr_ref, hi_ref, ga_ref, gb_ref,
               mix_ref, bias_ref, out_ref):
        out_ref[0] = _spectral_math(
            x_ref[0], wr_ref[:], wi_ref[:], hr_ref[:], hi_ref[:],
            ga_ref[:], gb_ref[:], mix_ref[:], bias_ref[0], out_ref.dtype,
        )

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((w, k)), full((w, k)), full((h, h)), full((h, h)),
            full((k, w)), full((k, w)), full((2 * c, 2 * c)), full((1, 2 * c)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(x, wr, wi, hr, hi, ga, gb,
      mix.astype(jnp.float32), bias.astype(jnp.float32)[None])
