"""Extended image-quality metrics (the slice of the vendored piq library the
reference carries — module/piq/, 5,136 LoC — that is practically useful for
LDCT evaluation): 3-D SSIM, MS-SSIM, total variation, GMSD, and KID.

All pure JAX, NHWC (or NDHWC for 3-D), jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mtd_gan_tpu.ops.filters import depthwise_conv2d, gaussian_window

Array = jax.Array


# ---------------------------------------------------------------------------
# 3-D SSIM (reference module/pytorch_ssim_3d.py:17-143)
# ---------------------------------------------------------------------------

def _gaussian_window_3d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    w = np.einsum("i,j,k->ijk", g, g, g)
    return jnp.asarray(w, jnp.float32)


def ssim3d(vol1: Array, vol2: Array, data_range: float = 1.0,
           window_size: int = 11) -> Array:
    """Mean 3-D SSIM over NDHWC volumes (Gaussian window, SAME padding)."""
    win = _gaussian_window_3d(window_size)
    c = vol1.shape[-1]
    k = jnp.broadcast_to(win[..., None, None],
                         win.shape + (1, c)).astype(vol1.dtype)
    pad = window_size // 2

    def conv(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), [(pad, pad)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )

    mu1, mu2 = conv(vol1), conv(vol2)
    s1 = conv(vol1 * vol1) - mu1 * mu1
    s2 = conv(vol2 * vol2) - mu2 * mu2
    s12 = conv(vol1 * vol2) - mu1 * mu2
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return jnp.mean(m)


# ---------------------------------------------------------------------------
# MS-SSIM (piq/ms_ssim semantics, 5 scales)
# ---------------------------------------------------------------------------

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_parts(x, y, data_range, win):
    pad = win.shape[0] // 2
    mu1 = depthwise_conv2d(x, win, pad)
    mu2 = depthwise_conv2d(y, win, pad)
    s1 = depthwise_conv2d(x * x, win, pad) - mu1 * mu1
    s2 = depthwise_conv2d(y * y, win, pad) - mu2 * mu2
    s12 = depthwise_conv2d(x * y, win, pad) - mu1 * mu2
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


def ms_ssim(x: Array, y: Array, data_range: float = 1.0) -> Array:
    win = gaussian_window(11, 1.5)
    levels = len(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(levels):
        s, cs = _ssim_parts(x, y, data_range, win)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4
    out = jnp.float32(1.0)
    for v, w in zip(vals, _MSSSIM_WEIGHTS):
        out = out * jnp.clip(v, 0.0) ** w
    return out


# ---------------------------------------------------------------------------
# Total variation, GMSD
# ---------------------------------------------------------------------------

def total_variation(x: Array) -> Array:
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    return jnp.mean(jnp.sum(dh, axis=(1, 2, 3)) + jnp.sum(dw, axis=(1, 2, 3)))


def gmsd(x: Array, y: Array, data_range: float = 1.0, c: float = 0.00261) -> Array:
    """Gradient-magnitude similarity deviation (lower = more similar)."""
    x = x / data_range
    y = y / data_range
    # 2x average-pool downsample (piq prefilter)
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                              "VALID") / 4
    y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                              "VALID") / 4
    px = jnp.asarray([[1, 0, -1], [1, 0, -1], [1, 0, -1]], jnp.float32) / 3
    gx = jnp.sqrt(depthwise_conv2d(x, px, 1) ** 2
                  + depthwise_conv2d(x, px.T, 1) ** 2 + 1e-12)
    gy = jnp.sqrt(depthwise_conv2d(y, px, 1) ** 2
                  + depthwise_conv2d(y, px.T, 1) ** 2 + 1e-12)
    gms = (2 * gx * gy + c) / (gx**2 + gy**2 + c)
    return jnp.sqrt(jnp.mean((gms - jnp.mean(gms)) ** 2))


# ---------------------------------------------------------------------------
# KID (kernel inception distance, polynomial kernel, piq/kid semantics)
# ---------------------------------------------------------------------------

def kid(feats_x: np.ndarray, feats_y: np.ndarray, degree: int = 3,
        gamma=None, coef0: float = 1.0) -> float:
    x = np.asarray(feats_x, np.float64)
    y = np.asarray(feats_y, np.float64)
    d = x.shape[1]
    g = 1.0 / d if gamma is None else gamma
    kxx = (g * x @ x.T + coef0) ** degree
    kyy = (g * y @ y.T + coef0) ** degree
    kxy = (g * x @ y.T + coef0) ** degree
    m, n = x.shape[0], y.shape[0]
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    return float(sum_xx + sum_yy - 2 * kxy.mean())
