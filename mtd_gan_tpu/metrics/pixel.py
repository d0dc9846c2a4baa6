"""Pixel-space metrics: RMSE / PSNR / SSIM, on-device, jittable.

Formula parity with reference metrics.py:
  RMSE -> metrics.py:172-179  (sqrt of mean-squared error)
  PSNR -> metrics.py:182-195  (10*log10(range^2 / (mse + 1e-10)))
  SSIM -> metrics.py:198-235  (11x11 Gaussian sigma 1.5, SAME padding,
                               C1=(0.01*range)^2, C2=(0.03*range)^2)

The reference's compute_* helpers return (input-vs-gt, gt-vs-gt, pred-vs-gt)
triples (the gt column is its fixture check); we keep that shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtd_gan_tpu.ops.filters import depthwise_conv2d, gaussian_window

Array = jax.Array


def rmse(pred: Array, target: Array) -> Array:
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


def psnr(pred: Array, target: Array, data_range: float = 1.0) -> Array:
    mse_val = jnp.mean((pred - target) ** 2) + 1e-10
    return 10.0 * jnp.log10(data_range**2 / mse_val)


def ssim(
    img1: Array,
    img2: Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> Array:
    """Mean SSIM over NHWC batch; Gaussian window, SAME (zero) padding to
    match torch F.conv2d(padding=window_size//2)."""
    if img1.ndim == 2:
        img1 = img1[None, :, :, None]
        img2 = img2[None, :, :, None]
    win = gaussian_window(window_size, sigma)
    pad = window_size // 2

    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)

    mu1 = depthwise_conv2d(img1, win, padding=pad)
    mu2 = depthwise_conv2d(img2, win, padding=pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = depthwise_conv2d(img1 * img1, win, padding=pad) - mu1_sq
    sigma2_sq = depthwise_conv2d(img2 * img2, win, padding=pad) - mu2_sq
    sigma12 = depthwise_conv2d(img1 * img2, win, padding=pad) - mu1_mu2

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def compute_rmse(inp: Array, target: Array, pred: Array):
    return rmse(inp, target), rmse(target, target), rmse(pred, target)


def compute_psnr(inp: Array, target: Array, pred: Array, data_range: float = 1.0):
    return (
        psnr(inp, target, data_range),
        psnr(target, target, data_range),
        psnr(pred, target, data_range),
    )


def compute_ssim(inp: Array, target: Array, pred: Array, data_range: float = 1.0):
    return (
        ssim(inp, target, data_range),
        ssim(target, target, data_range),
        ssim(pred, target, data_range),
    )
