"""Res-FFT-Conv block — the MTD-GAN generator's core op.

Semantics (reference arch/Ours/networks.py:15-36):
    out = x + ReLU(conv3x3(x)) + irfft2(C(1x1-conv([Re; Im] of rfft2(x))))
with orthonormal FFT normalization and ReLU applied to the stacked
real/imag channels between the 1x1 conv and the inverse transform.

TPU mapping: the 1x1 conv over 2C stacked spectral channels is a single
(H * W_half, 2C) @ (2C, 2C) matmul — pure MXU work; rfft2/irfft2 lower to
XLA FFT ops. XLA fuses the residual mixing into the surrounding elementwise
graph. A Pallas-fused variant (spectral matmul + ReLU in VMEM between the
transforms) lives in mtd_gan_tpu.ops.pallas_fftconv.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu.ops.layers import Conv, normal_init

Array = jax.Array


def fft_conv_block(
    x: Array,
    img_kernel: Array,
    img_bias: Array,
    fft_kernel: Array,
    fft_bias: Array,
) -> Array:
    """Functional Res-FFT-Conv block on an NHWC tensor.

    Args:
      x: (N, H, W, C) input.
      img_kernel: (3, 3, C, C) spatial conv kernel (HWIO).
      img_bias: (C,) spatial conv bias.
      fft_kernel: (2C, 2C) spectral 1x1 mixing matrix.
      fft_bias: (2C,) spectral bias.
    """
    n, h, w, c = x.shape
    orig_dtype = x.dtype

    # --- spectral branch (fp32: XLA FFT is fp32/complex64) ---
    xf = jnp.fft.rfft2(x.astype(jnp.float32), s=(h, w), axes=(1, 2), norm="ortho")
    spec = jnp.concatenate([xf.real, xf.imag], axis=-1)  # (N, H, W//2+1, 2C)
    spec = spec @ fft_kernel.astype(jnp.float32) + fft_bias.astype(jnp.float32)
    spec = jax.nn.relu(spec)
    re, im = jnp.split(spec, 2, axis=-1)
    fft_out = jnp.fft.irfft2(
        jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho"
    ).astype(orig_dtype)

    # --- spatial branch ---
    img = jax.lax.conv_general_dilated(
        x,
        img_kernel.astype(orig_dtype),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    img = jax.nn.relu(img + img_bias.astype(orig_dtype))

    return x + img + fft_out


class FFTConvBlock(nn.Module):
    """Linen wrapper over :func:`fft_conv_block` holding the two kernels."""

    channels: int
    kernel_init: Callable = normal_init(0.01)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.channels
        img_kernel = self.param("img_kernel", self.kernel_init, (3, 3, c, c), jnp.float32)
        img_bias = self.param("img_bias", nn.initializers.zeros, (c,), jnp.float32)
        fft_kernel = self.param("fft_kernel", self.kernel_init, (2 * c, 2 * c), jnp.float32)
        fft_bias = self.param("fft_bias", nn.initializers.zeros, (2 * c,), jnp.float32)
        return fft_conv_block(x, img_kernel, img_bias, fft_kernel, fft_bias)
