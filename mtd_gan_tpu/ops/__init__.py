"""TPU-native op library: conv/dense layers with optional spectral norm,
FFT-conv blocks, pixel shuffle, fixed filter banks, resizing, and the
on-device sliding-window tiler."""

from mtd_gan_tpu.ops.layers import (
    Conv,
    ConvTranspose,
    Dense,
    normal_init,
)
from mtd_gan_tpu.ops.fft_conv import FFTConvBlock, fft_conv_block
from mtd_gan_tpu.ops.pixel_shuffle import pixel_shuffle, PixelShuffleUpsample
from mtd_gan_tpu.ops.upsample import upsample2x_bilinear
from mtd_gan_tpu.ops.filters import (
    binomial5_kernel,
    gaussian_window,
    gauss_blur5,
    laplacian_detail,
    sobel_kernels,
    sobel_magnitude,
)

__all__ = [
    "Conv",
    "ConvTranspose",
    "Dense",
    "normal_init",
    "FFTConvBlock",
    "fft_conv_block",
    "pixel_shuffle",
    "PixelShuffleUpsample",
    "upsample2x_bilinear",
    "binomial5_kernel",
    "gaussian_window",
    "gauss_blur5",
    "laplacian_detail",
    "sobel_kernels",
    "sobel_magnitude",
]
