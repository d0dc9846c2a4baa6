"""Fixed filter banks: binomial Gaussian blur, Laplacian-pyramid detail
extraction (EdgeLoss, reference losses.py:113-138), separable Gaussian SSIM
window (reference metrics.py:197-203), and the 4-direction Sobel bank used by
EDCNN/MAP-NN (reference arch/EDCNN/networks.py:9-85, arch/MAP_NN/networks.py:139-159).

All filters operate on NHWC tensors, applied depthwise (per channel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def binomial5_kernel() -> jnp.ndarray:
    """5x5 binomial kernel: outer product of [.05, .25, .4, .25, .05]."""
    k = jnp.array([0.05, 0.25, 0.4, 0.25, 0.05], dtype=jnp.float32)
    return jnp.outer(k, k)


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Normalized 2-D Gaussian window (SSIM)."""
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


def depthwise_conv2d(x: Array, kernel2d: Array, padding) -> Array:
    """Apply a single 2-D kernel depthwise over all channels of NHWC x."""
    c = x.shape[-1]
    kh, kw = kernel2d.shape
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def gauss_blur5(x: Array) -> Array:
    """Replicate-pad by 2 then 5x5 binomial blur (EdgeLoss conv_gauss)."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    return depthwise_conv2d(xp, binomial5_kernel(), padding="VALID")


def laplacian_detail(x: Array) -> Array:
    """Laplacian-pyramid detail layer: x - blur(zero_stuff(blur(x)[::2] * 4)).

    Matches reference losses.py:126-134 exactly (downsample even pixels,
    zero-stuffed upsample scaled x4, re-blur, subtract).
    """
    filtered = gauss_blur5(x)
    down = filtered[:, ::2, ::2, :]
    stuffed = jnp.zeros_like(filtered)
    stuffed = stuffed.at[:, ::2, ::2, :].set(down * 4.0)
    return x - gauss_blur5(stuffed)


def sobel_kernels() -> jnp.ndarray:
    """Four 3x3 Sobel kernels (horizontal, vertical, two diagonals) stacked
    (4, 3, 3) — the EDCNN trainable-scale Sobel bank directions."""
    h = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=np.float32)
    v = h.T
    d1 = np.array([[0, -1, -2], [1, 0, -1], [2, 1, 0]], dtype=np.float32)
    d2 = np.array([[-2, -1, 0], [-1, 0, 1], [0, 1, 2]], dtype=np.float32)
    return jnp.asarray(np.stack([h, v, d1, d2]))


def sobel_magnitude(x: Array, eps: float = 1e-6) -> Array:
    """Gradient magnitude sqrt(gx^2 + gy^2) per channel (MAP-NN SobelOperator,
    reference arch/MAP_NN/networks.py:139-159 uses 1/4-scaled kernels)."""
    h = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=x.dtype) / 4.0
    gx = depthwise_conv2d(x, h, padding=1)
    gy = depthwise_conv2d(x, h.T, padding=1)
    return jnp.sqrt(gx * gx + gy * gy + eps)
