"""Res-FFT-Conv block — the MTD-GAN generator's core op.

Semantics (reference arch/Ours/networks.py:15-36):
    out = x + ReLU(conv3x3(x)) + irfft2(C(1x1-conv([Re; Im] of rfft2(x))))
with orthonormal FFT normalization and ReLU applied to the stacked
real/imag channels between the 1x1 conv and the inverse transform.

TPU mapping: on TPU the transforms run as dense DFT factor matmuls
(mtd_gan_tpu.ops.dft) — measured 3.9x faster than XLA's generic TPU FFT
lowering for the 512x512x(4x32) workload AND far more accurate (XLA's TPU
FFT round-trips at ~4e-1 max abs error; the tf32 DFT-matmul at ~6e-5, fp32
at ~6e-7). The spectral 1x1 conv is a plain channel matmul; XLA fuses the
ReLU and residual mixing around the MXU ops. On CPU/GPU jnp.fft is used.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from mtd_gan_tpu.ops import dft
from mtd_gan_tpu.ops.layers import Conv, normal_init

Array = jax.Array

# DFT precision on TPU: 'tensorfloat32' (bf16x3 passes) keeps ~6e-5 accuracy
# at half the fp32-matmul cost; override to 'float32' for exact parity runs.
DFT_MATMUL_PRECISION = "tensorfloat32"


def _use_dft_matmul() -> bool:
    return jax.default_backend() == "tpu"


def generator_checkpoint(fn, mode):
    """jax.checkpoint wrapper understanding the generator remat modes:
    True (full remat), 'save_spectral' (keep each block's spectral output),
    'save_spectral_full' (also keep the pre-mix spectrum + pre-ReLU mix
    output: zero spectral forward recompute in the backward). Falsy modes
    return fn unchanged. Shared by the trainer's hoisted step and
    MTDGANModel.g_loss so both paths honor the same policy strings."""
    if not mode:
        return fn
    if mode == "save_spectral":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                "fft_out"))
    if mode == "save_spectral_full":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                "fft_out", "spec_in", "spec_preact"))
    if mode == "save_all_named":
        # + every conv pre-activation: the backward recomputes NOTHING but
        # elementwise relus (~4.4 GB of bf16 residuals at batch 160 —
        # the smart middle between full remat and the fp32 no-remat that
        # does not fit the chip)
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.save_only_these_names(
                "fft_out", "spec_in", "spec_preact", "conv_preact",
                "img_preact"))
    return jax.checkpoint(fn)


def fft_conv_block(
    x: Array,
    img_kernel: Array,
    img_bias: Array,
    fft_kernel: Array,
    fft_bias: Array,
    impl: str = "auto",
) -> Array:
    """Functional Res-FFT-Conv block on an NHWC tensor.

    Args:
      x: (N, H, W, C) input.
      img_kernel: (3, 3, C, C) spatial conv kernel (HWIO).
      img_bias: (C,) spatial conv bias.
      fft_kernel: (2C, 2C) spectral 1x1 mixing matrix.
      fft_bias: (2C,) spectral bias.
      impl: 'auto' (DFT einsum on TPU, jnp.fft elsewhere — differentiable),
        'pallas_tiled' (3-stage VMEM-fused kernels, inference only — the
        block's residual adds fuse into the inverse-DFT epilogue), or
        'pallas_fused' (per-sample single kernel for small patches,
        inference only).
    """
    n, h, w, c = x.shape
    orig_dtype = x.dtype

    if impl in ("pallas_tiled", "pallas_fused"):
        from mtd_gan_tpu.ops import pallas_fftconv as pk

        # interpret mode off-TPU keeps the path testable everywhere
        interp = jax.default_backend() != "tpu"
        img = jax.lax.conv_general_dilated(
            x, img_kernel.astype(orig_dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        res = x + jax.nn.relu(img + img_bias.astype(orig_dtype))
        if impl == "pallas_tiled":
            return pk.spectral_branch_tiled(
                x, fft_kernel, fft_bias, residual=res, interpret=interp
            )
        return res + pk.spectral_branch_fused(
            x, fft_kernel, fft_bias, interpret=interp
        )

    # --- spectral branch (fp32 values; transform backend-dependent) ---
    if _use_dft_matmul():
        if orig_dtype == jnp.bfloat16:
            # bf16 compute mode: 2-pass hi/lo factor dots + bf16 stage
            # boundaries (the precision scheme the Pallas inference
            # pipeline validates end-to-end at 3e-5) — 1/3 fewer MXU
            # passes and half the traffic vs the tf32 path below. The
            # traced mix weight is cast bf16 like every other layer's
            # kernel under the model's compute dtype (ops/layers.py).
            zr, zi = dft.rfft2_matmul_bf16x2(x)
            spec = jnp.concatenate([zr, zi], axis=-1)
            # named for the save_spectral_full remat policy: with spec_in
            # and spec_preact saved the backward needs NO spectral forward
            # recompute (DFTs are linear — their transposes need no
            # residuals; the mix-weight grad needs spec_in, the ReLU mask
            # needs spec_preact)
            spec = checkpoint_name(spec.astype(jnp.bfloat16), "spec_in")
            spec = jnp.einsum(
                "...k,kd->...d", spec,
                fft_kernel.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) + fft_bias.astype(jnp.float32)
            spec = jax.nn.relu(checkpoint_name(spec, "spec_preact"))
            re, im = jnp.split(spec, 2, axis=-1)
            fft_out = dft.irfft2_matmul_bf16x2(re, im, (h, w)).astype(
                orig_dtype)
            return _finish_block(x, fft_out, img_kernel, img_bias, orig_dtype)
        with jax.default_matmul_precision(DFT_MATMUL_PRECISION):
            zr, zi = dft.rfft2_matmul(x.astype(jnp.float32))
            spec = jnp.concatenate([zr, zi], axis=-1)  # (N, H, W//2+1, 2C)
            spec = checkpoint_name(spec, "spec_in")
            spec = spec @ fft_kernel.astype(jnp.float32) + fft_bias.astype(
                jnp.float32
            )
            spec = jax.nn.relu(checkpoint_name(spec, "spec_preact"))
            re, im = jnp.split(spec, 2, axis=-1)
            fft_out = dft.irfft2_matmul(re, im, (h, w)).astype(orig_dtype)
        return _finish_block(x, fft_out, img_kernel, img_bias, orig_dtype)

    xf = jnp.fft.rfft2(x.astype(jnp.float32), s=(h, w), axes=(1, 2),
                       norm="ortho")
    spec = jnp.concatenate([xf.real, xf.imag], axis=-1)  # (N, H, W//2+1, 2C)
    spec = checkpoint_name(spec, "spec_in")
    spec = spec @ fft_kernel.astype(jnp.float32) + fft_bias.astype(jnp.float32)
    spec = jax.nn.relu(checkpoint_name(spec, "spec_preact"))
    re, im = jnp.split(spec, 2, axis=-1)
    fft_out = jnp.fft.irfft2(
        jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho"
    ).astype(orig_dtype)
    return _finish_block(x, fft_out, img_kernel, img_bias, orig_dtype)


def _finish_block(x: Array, fft_out: Array, img_kernel: Array,
                  img_bias: Array, orig_dtype) -> Array:
    # named so jax.checkpoint(policy=save_only_these_names("fft_out")) can
    # keep the spectral output and skip recomputing the DFT matmuls (the
    # bulk of the block's FLOPs) in the backward pass — the trainer's
    # g_remat="save_spectral" option
    fft_out = checkpoint_name(fft_out, "fft_out")
    # --- spatial branch + residual mixing ---
    img = jax.lax.conv_general_dilated(
        x,
        img_kernel.astype(orig_dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    img = jax.nn.relu(
        checkpoint_name(img + img_bias.astype(orig_dtype), "img_preact"))
    return x + img + fft_out


class FFTConvBlock(nn.Module):
    """Linen wrapper over :func:`fft_conv_block` holding the two kernels.

    `spectral_impl` selects the compute path (see fft_conv_block); the
    parameter structure is identical across impls, so params trained with
    'auto' serve pallas inference directly."""

    channels: int
    kernel_init: Callable = normal_init(0.01)
    spectral_impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.channels
        img_kernel = self.param("img_kernel", self.kernel_init, (3, 3, c, c), jnp.float32)
        img_bias = self.param("img_bias", nn.initializers.zeros, (c,), jnp.float32)
        fft_kernel = self.param("fft_kernel", self.kernel_init, (2 * c, 2 * c), jnp.float32)
        fft_bias = self.param("fft_bias", nn.initializers.zeros, (2 * c,), jnp.float32)
        return fft_conv_block(x, img_kernel, img_bias, fft_kernel, fft_bias,
                              impl=self.spectral_impl)
