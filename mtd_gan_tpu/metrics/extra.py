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
# VIF — visual information fidelity, pixel domain
# (reference module/piq/vif.py:33-125 `vif_p`)
# ---------------------------------------------------------------------------

def _gaussian_kernel2d(size: int, sigma: float) -> jnp.ndarray:
    xs = np.arange(size) - size // 2
    g = np.exp(-(xs[:, None] ** 2 + xs[None, :] ** 2) / (2.0 * sigma**2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def _valid_depthwise(x: Array, k: Array) -> Array:
    c = x.shape[-1]
    kk = jnp.broadcast_to(k[..., None, None], k.shape + (1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def vif_p(pred: Array, target: Array, sigma_n_sq: float = 2.0,
          data_range: float = 1.0) -> Array:
    """Visual Information Fidelity (pixel domain) over NHWC grayscale
    batches; asymmetric — `pred` is the distorted image. Matches piq 0.5.2
    vif_p (reference module/piq/vif.py:33)."""
    if pred.shape[1] < 41 or pred.shape[2] < 41:
        # piq validates min size 41x41 (kernel 17 VALID conv at scale 1 plus
        # three downsamples); fail loudly instead of deep in a conv shape error
        raise ValueError(
            f"vif_p needs inputs of at least 41x41, got {pred.shape[1:3]}"
        )
    eps = 1e-8
    p = pred.astype(jnp.float32) / data_range
    t = target.astype(jnp.float32) / data_range
    num = jnp.zeros((p.shape[0],), jnp.float32)
    den = jnp.zeros((p.shape[0],), jnp.float32)
    for scale in range(1, 5):
        ksize = 2 ** (5 - scale) + 1
        kern = _gaussian_kernel2d(ksize, ksize / 5.0)
        if scale > 1:
            p = _valid_depthwise(p, kern)[:, ::2, ::2]
            t = _valid_depthwise(t, kern)[:, ::2, ::2]
        mu_t = _valid_depthwise(t, kern)
        mu_p = _valid_depthwise(p, kern)
        s_tt = jax.nn.relu(_valid_depthwise(t * t, kern) - mu_t * mu_t)
        s_pp = jax.nn.relu(_valid_depthwise(p * p, kern) - mu_p * mu_p)
        s_tp = _valid_depthwise(t * p, kern) - mu_t * mu_p

        g = s_tp / (s_tt + eps)
        sv = s_pp - g * s_tp
        g = jnp.where(s_tt >= eps, g, 0.0)
        sv = jnp.where(s_tt >= eps, sv, s_pp)
        s_tt = jnp.where(s_tt >= eps, s_tt, 0.0)
        g = jnp.where(s_pp >= eps, g, 0.0)
        sv = jnp.where(s_pp >= eps, sv, 0.0)
        sv = jnp.where(g >= 0, sv, s_pp)
        g = jax.nn.relu(g)
        sv = jnp.where(sv > eps, sv, eps)

        num = num + jnp.sum(
            jnp.log10(1.0 + g**2 * s_tt / (sv + sigma_n_sq)), axis=(1, 2, 3)
        )
        den = den + jnp.sum(jnp.log10(1.0 + s_tt / sigma_n_sq), axis=(1, 2, 3))
    return jnp.mean((num + eps) / (den + eps))


# ---------------------------------------------------------------------------
# FSIM — feature similarity (phase congruency + gradient magnitude)
# (reference module/piq/fsim.py:18-444; grayscale/non-chromatic variant —
# LDCT slices are single-channel)
# ---------------------------------------------------------------------------

def _ifftshift_np(a: np.ndarray) -> np.ndarray:
    return np.roll(a, [-(s // 2) for s in a.shape], axis=tuple(range(a.ndim)))


def _meshgrid_np(h: int, w: int):
    # piq get_meshgrid (functional/base.py:12-31)
    x = (np.arange(-((h - 1) / 2) if h % 2 else -h / 2, h / 2)
         / (h - 1 if h % 2 else h))
    y = (np.arange(-((w - 1) / 2) if w % 2 else -w / 2, w / 2)
         / (w - 1 if w % 2 else w))
    return np.meshgrid(x, y, indexing="ij")


def _fsim_filters(h: int, w: int, scales: int, orientations: int,
                  min_length: int, mult: int, sigma_f: float,
                  delta_theta: float) -> np.ndarray:
    """(O*S, H, W) log-Gabor x angular-spread filter bank
    (reference module/piq/fsim.py:127-210)."""
    theta_sigma = np.pi / (orientations * delta_theta)
    gx, gy = _meshgrid_np(h, w)
    radius = _ifftshift_np(np.sqrt(gx**2 + gy**2))
    theta = _ifftshift_np(np.arctan2(-gy, gx))
    radius[0, 0] = 1.0
    sintheta, costheta = np.sin(theta), np.cos(theta)

    lp = 1.0 / (1.0 + (np.sqrt(gx**2 + gy**2) / 0.45) ** (2 * 15))
    lp = _ifftshift_np(lp)

    log_gabor = []
    for s in range(scales):
        omega0 = 1.0 / (min_length * mult**s)
        g = np.exp(-(np.log(radius / omega0) ** 2) / (2 * np.log(sigma_f) ** 2))
        g = g * lp
        g[0, 0] = 0.0
        log_gabor.append(g)
    spread = []
    for o in range(orientations):
        angl = o * np.pi / orientations
        ds = sintheta * np.cos(angl) - costheta * np.sin(angl)
        dc = costheta * np.cos(angl) + sintheta * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        spread.append(np.exp(-(dtheta**2) / (2 * theta_sigma**2)))
    filters = np.stack(
        [spread[o] * log_gabor[s]
         for o in range(orientations) for s in range(scales)]
    )
    return filters.astype(np.float32)


def _phase_congruency(x: Array, scales: int = 4, orientations: int = 4,
                      min_length: int = 6, mult: int = 2,
                      sigma_f: float = 0.55, delta_theta: float = 1.2,
                      k: float = 2.0) -> Array:
    """(N, H, W) grayscale -> (N, H, W) phase-congruency map
    (reference module/piq/fsim.py:212-338). FFTs run as DFT matmuls —
    XLA's generic TPU FFT is too inaccurate (PERF.md)."""
    from mtd_gan_tpu.ops.dft import fft2_matmul, ifft2_matmul

    eps = np.finfo(np.float32).eps
    n, h, w = x.shape
    filters = jnp.asarray(
        _fsim_filters(h, w, scales, orientations, min_length, mult,
                      sigma_f, delta_theta)
    )  # (O*S, H, W)

    xr, xi = fft2_matmul(x)                               # (N, H, W)
    prod_r = xr[:, None] * filters[None]                  # (N, O*S, H, W)
    prod_i = xi[:, None] * filters[None]
    even, odd = ifft2_matmul(
        prod_r.reshape(-1, h, w), prod_i.reshape(-1, h, w)
    )
    even = even.reshape(n, orientations, scales, h, w)
    odd = odd.reshape(n, orientations, scales, h, w)
    an = jnp.sqrt(even**2 + odd**2)

    # ifft2 of the filters, rescaled (reference :246-249)
    fr, fi = ifft2_matmul(filters, jnp.zeros_like(filters))
    filters_ifft = fr * np.sqrt(h * w)
    filters_ifft = filters_ifft.reshape(1, orientations, scales, h, w)
    f2 = filters.reshape(1, orientations, scales, h, w)
    em_n = jnp.sum(f2[:, :, :1] ** 2, axis=(-2, -1), keepdims=True)

    sum_e = jnp.sum(even, axis=2, keepdims=True)
    sum_o = jnp.sum(odd, axis=2, keepdims=True)
    x_energy = jnp.sqrt(sum_e**2 + sum_o**2) + eps
    mean_e = sum_e / x_energy
    mean_o = sum_o / x_energy
    energy = jnp.sum(
        even * mean_e + odd * mean_o - jnp.abs(even * mean_o - odd * mean_e),
        axis=2, keepdims=True,
    )

    # noise estimation from the smallest-scale response (reference :269-330);
    # every statistic below is (N|1, O, 1, 1, 1) and broadcasts over (H, W)
    abs_eo2 = (even[:, :, :1] ** 2 + odd[:, :, :1] ** 2).reshape(
        n, orientations, 1, 1, h * w
    )
    median_e2n = jnp.median(abs_eo2, axis=-1, keepdims=True)
    mean_e2n = -median_e2n / np.log(0.5)
    noise_power = mean_e2n / em_n

    sum_an2 = jnp.sum(
        jnp.sum(filters_ifft**2, axis=2, keepdims=True),
        axis=(-2, -1), keepdims=True,
    )
    sum_ai_aj = jnp.zeros((1, orientations, 1, 1, 1), jnp.float32)
    for s in range(scales - 1):
        sum_ai_aj = sum_ai_aj + jnp.sum(
            jnp.sum(filters_ifft[:, :, s:s + 1] * filters_ifft[:, :, s + 1:],
                    axis=2, keepdims=True),
            axis=(-2, -1), keepdims=True,
        )
    noise_energy2 = 2 * noise_power * sum_an2 + 4 * noise_power * sum_ai_aj
    tau = jnp.sqrt(noise_energy2 / 2.0)
    noise_energy = tau * np.sqrt(np.pi / 2.0)
    noise_sigma = jnp.sqrt((2.0 - np.pi / 2.0) * tau**2)
    t_thresh = (noise_energy + k * noise_sigma) / 1.7

    energy = jnp.maximum(energy - t_thresh, 0.0)
    energy_all = jnp.sum(energy, axis=(1, 2)) + eps
    an_all = jnp.sum(an, axis=(1, 2)) + eps
    return energy_all / an_all


def fsim(pred: Array, target: Array, data_range: float = 1.0,
         scales: int = 4, orientations: int = 4, min_length: int = 6,
         mult: int = 2, sigma_f: float = 0.55, delta_theta: float = 1.2,
         k: float = 2.0) -> Array:
    """FSIM over NHWC grayscale batches (chromatic=False — CT slices are
    single-channel). Matches piq 0.5.2 fsim (reference module/piq/fsim.py:18)."""
    x = pred.astype(jnp.float32) / data_range * 255.0
    y = target.astype(jnp.float32) / data_range * 255.0
    ksize = max(1, round(min(x.shape[1], x.shape[2]) / 256))
    if ksize > 1:
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, ksize, ksize, 1), (1, ksize, ksize, 1),
            "VALID") / (ksize * ksize)
        y = jax.lax.reduce_window(
            y, 0.0, jax.lax.add, (1, ksize, ksize, 1), (1, ksize, ksize, 1),
            "VALID") / (ksize * ksize)
    xl = x[..., 0]                                        # (N, H, W)
    yl = y[..., 0]

    pc_x = _phase_congruency(xl, scales, orientations, min_length, mult,
                             sigma_f, delta_theta, k)
    pc_y = _phase_congruency(yl, scales, orientations, min_length, mult,
                             sigma_f, delta_theta, k)

    scharr = jnp.asarray(
        np.array([[-3., 0., 3.], [-10., 0., 10.], [-3., 0., 3.]], np.float32)
        / 16.0
    )

    def grad_map(z):
        gx = depthwise_conv2d(z[..., None], scharr, 1)[..., 0]
        gy = depthwise_conv2d(z[..., None], scharr.T, 1)[..., 0]
        return jnp.sqrt(gx**2 + gy**2)

    gm_x, gm_y = grad_map(xl), grad_map(yl)
    t1, t2 = 0.85, 160.0
    pc_sim = (2 * pc_x * pc_y + t1) / (pc_x**2 + pc_y**2 + t1)
    gm_sim = (2 * gm_x * gm_y + t2) / (gm_x**2 + gm_y**2 + t2)
    pc_max = jnp.maximum(pc_x, pc_y)
    score = gm_sim * pc_sim * pc_max
    result = jnp.sum(score, axis=(1, 2)) / jnp.sum(pc_max, axis=(1, 2))
    return jnp.mean(result)


# ---------------------------------------------------------------------------
# HaarPSI — Haar wavelet-based perceptual similarity
# (reference module/piq/haarpsi.py:23-144, grayscale variant)
# ---------------------------------------------------------------------------

def _haar_kernel(size: int) -> np.ndarray:
    k = np.ones((size, size), np.float32) / size
    k[size // 2:, :] *= -1.0
    return k


def haarpsi(pred: Array, target: Array, data_range: float = 1.0,
            scales: int = 3, subsample: bool = True, c: float = 30.0,
            alpha: float = 4.2) -> Array:
    """HaarPSI over NHWC grayscale batches. Matches piq 0.5.2 haarpsi
    (reference module/piq/haarpsi.py:23)."""
    x = pred.astype(jnp.float32) / data_range * 255.0
    y = target.astype(jnp.float32) / data_range * 255.0
    if subsample:
        dpad_h = x.shape[1] % 2
        dpad_w = x.shape[2] % 2
        x = jnp.pad(x, ((0, 0), (0, dpad_h), (0, dpad_w), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, dpad_h), (0, dpad_w), (0, 0)))
        pool = lambda z: jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
        x, y = pool(x), pool(y)

    def coeffs(z):
        outs = []
        for s in range(scales):
            ks = 2 ** (s + 1)
            up, dn = ks // 2 - 1, ks // 2
            zp = jnp.pad(z, ((0, 0), (up, dn), (up, dn), (0, 0)))
            kern_h = jnp.asarray(_haar_kernel(ks))
            outs.append(_valid_depthwise(zp, kern_h))
            outs.append(_valid_depthwise(zp, kern_h.T))
        return jnp.concatenate(outs, axis=-1)  # (..., 2*scales) [s1h s1v s2h s2v s3h s3v]

    cx, cy = coeffs(x), coeffs(y)
    weights = jnp.maximum(jnp.abs(cx[..., 4:6]), jnp.abs(cy[..., 4:6]))
    sims = []
    for o in range(2):
        mx = jnp.abs(cx[..., (o, o + 2)])
        my = jnp.abs(cy[..., (o, o + 2)])
        sm = (2.0 * mx * my + c) / (mx**2 + my**2 + c)
        sims.append(jnp.sum(sm, axis=-1, keepdims=True) / 2.0)
    sim_map = jnp.concatenate(sims, axis=-1)
    eps = np.finfo(np.float32).eps
    score = (jnp.sum(jax.nn.sigmoid(sim_map * alpha) * weights, axis=(1, 2, 3))
             + eps) / (jnp.sum(weights, axis=(1, 2, 3)) + eps)
    score = (jnp.log(score / (1.0 - score)) / alpha) ** 2
    return jnp.mean(score)


# ---------------------------------------------------------------------------
# MDSI — mean deviation similarity index
# (reference module/piq/mdsi.py:18-113, 'sum' combination)
# ---------------------------------------------------------------------------

_LHM = np.array([[0.2989, 0.587, 0.114],
                 [0.3, 0.04, -0.35],
                 [0.34, -0.6, 0.17]], np.float32)


def _pow_complex(base: Array, exp: float):
    """base^exp for possibly-negative real base, as (re, im) — matches piq
    pow_for_complex (module/piq/functional/base.py:61-80)."""
    r = jnp.abs(base) ** exp
    phi = jnp.where(base >= 0, 0.0, np.pi) * exp
    return r * jnp.cos(phi), r * jnp.sin(phi)


def mdsi(pred: Array, target: Array, data_range: float = 1.0,
         c1: float = 140.0, c2: float = 55.0, c3: float = 550.0,
         alpha: float = 0.6, rho: float = 1.0, q: float = 0.25,
         o: float = 0.25) -> Array:
    """MDSI over NHWC batches (grayscale inputs are repeated to RGB, as
    piq does). Matches piq 0.5.2 mdsi with combination='sum' (reference
    module/piq/mdsi.py:18)."""
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
        y = jnp.repeat(y, 3, axis=-1)
    x = x / data_range * 255.0
    y = y / data_range * 255.0

    ksize = max(1, round(min(x.shape[1], x.shape[2]) / 256))
    if ksize > 1:
        up, dn = (ksize - 1) // 2, ksize // 2
        x = jnp.pad(x, ((0, 0), (up, dn), (up, dn), (0, 0)))
        y = jnp.pad(y, ((0, 0), (up, dn), (up, dn), (0, 0)))
        pool = lambda z: jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, ksize, ksize, 1), (1, ksize, ksize, 1),
            "VALID") / (ksize * ksize)
        x, y = pool(x), pool(y)

    lhm = jnp.asarray(_LHM.T)
    xl = x @ lhm                                      # (N, H, W, 3) LHM
    yl = y @ lhm

    prewitt = jnp.asarray(
        np.array([[-1., 0., 1.], [-1., 0., 1.], [-1., 0., 1.]], np.float32) / 3
    )

    def grad(z):                                       # luminance gradient map
        l_ = z[..., :1]
        gx = depthwise_conv2d(l_, prewitt, 1)
        gy = depthwise_conv2d(l_, prewitt.T, 1)
        return jnp.sqrt(gx**2 + gy**2)

    gm_x, gm_y = grad(xl), grad(yl)
    gm_avg = grad((xl + yl) / 2.0)
    sim = lambda a, b, cc: (2.0 * a * b + cc) / (a**2 + b**2 + cc)
    gs = sim(gm_x, gm_y, c1) + sim(gm_x, gm_avg, c2) - sim(gm_y, gm_avg, c2)

    hx, mx = xl[..., 1:2], xl[..., 2:]
    hy, my = yl[..., 1:2], yl[..., 2:]
    cs = (2.0 * (hx * hy + mx * my) + c3) / (hx**2 + hy**2 + mx**2 + my**2 + c3)

    gcs = alpha * gs + (1.0 - alpha) * cs              # (N, H, W, 1)
    re, im = _pow_complex(gcs, q)
    mct_re = jnp.mean(re, axis=(1, 2), keepdims=True)
    mct_im = jnp.mean(im, axis=(1, 2), keepdims=True)
    dev = jnp.sqrt((re - mct_re) ** 2 + (im - mct_im) ** 2)
    score = jnp.mean(dev**rho, axis=(1, 2, 3)) ** (o / rho)
    return jnp.mean(score)


# ---------------------------------------------------------------------------
# BRISQUE — no-reference quality (reference module/piq/brisque.py:20-250)
#
# The 36-dim natural-scene-statistics feature pipeline (MSCN + GGD/AGGD fits
# over 2 scales) is pure math and implemented here; the final score needs
# piq's pretrained SVR (brisque_svm_weights.pt, an external download) and is
# gated on a local copy — see WEIGHTS.md.
# ---------------------------------------------------------------------------

_GAMMA_TABLE = np.arange(0.2, 10.001, 0.001, dtype=np.float64)


def _ggd_parameters(x: Array):
    """Generalized-Gaussian fit via the rho/r(gamma) table lookup
    (reference module/piq/brisque.py:135-151). x: (N, H, W)."""
    from jax.scipy.special import gammaln

    gamma = jnp.asarray(_GAMMA_TABLE, jnp.float32)
    r_table = jnp.exp(
        gammaln(1.0 / gamma) + gammaln(3.0 / gamma) - 2 * gammaln(2.0 / gamma)
    )
    sigma_sq = jnp.mean(x**2, axis=(-1, -2))
    sigma = jnp.sqrt(sigma_sq)
    e = jnp.mean(jnp.abs(x), axis=(-1, -2))
    rho = sigma_sq / e**2
    idx = jnp.argmin(jnp.abs(rho[:, None] - r_table[None]), axis=-1)
    return gamma[idx], sigma


def _aggd_parameters(x: Array):
    """Asymmetric GGD fit (reference module/piq/brisque.py:154-180)."""
    from jax.scipy.special import gammaln

    gamma = jnp.asarray(_GAMMA_TABLE, jnp.float32)
    r_table = jnp.exp(
        2 * gammaln(2.0 / gamma) - gammaln(1.0 / gamma) - gammaln(3.0 / gamma)
    )
    mask_l = (x < 0).astype(jnp.float32)
    mask_r = (x > 0).astype(jnp.float32)
    count_l = jnp.sum(mask_l, axis=(-1, -2))
    count_r = jnp.sum(mask_r, axis=(-1, -2))
    sigma_l = jnp.sqrt(jnp.sum((x * mask_l) ** 2, axis=(-1, -2)) / count_l)
    sigma_r = jnp.sqrt(jnp.sum((x * mask_r) ** 2, axis=(-1, -2)) / count_r)
    gamma_hat = sigma_l / sigma_r
    rho_hat = jnp.mean(jnp.abs(x), axis=(-1, -2)) ** 2 / jnp.mean(
        x**2, axis=(-1, -2)
    )
    rho_norm = (rho_hat * (gamma_hat**3 + 1) * (gamma_hat + 1)) / (
        gamma_hat**2 + 1
    ) ** 2
    idx = jnp.argmin(jnp.abs(rho_norm[:, None] - r_table[None]), axis=-1)
    return gamma[idx], sigma_l, sigma_r


def _natural_scene_statistics(luma: Array, kernel_size: int = 7,
                              sigma: float = 7.0 / 6) -> Array:
    """(N, H, W) luma -> (N, 18) NSS features
    (reference module/piq/brisque.py:183-213)."""
    from jax.scipy.special import gammaln

    kern = _gaussian_kernel2d(kernel_size, sigma)
    pad = kernel_size // 2
    x4 = luma[..., None]
    mu = depthwise_conv2d(x4, kern, pad)[..., 0]
    std = jnp.sqrt(jnp.abs(depthwise_conv2d(x4**2, kern, pad)[..., 0] - mu**2))
    nrm = (luma - mu) / (std + 1.0)

    alpha, sig = _ggd_parameters(nrm)
    feats = [alpha, sig**2]
    for shift in [(0, 1), (1, 0), (1, 1), (-1, 1)]:
        rolled = jnp.roll(nrm, shift, axis=(-2, -1))
        a, s_l, s_r = _aggd_parameters(nrm * rolled)
        eta = (s_r - s_l) * jnp.exp(
            gammaln(2.0 / a) - (gammaln(1.0 / a) + gammaln(3.0 / a)) / 2
        )
        feats.extend((a, eta, s_l**2, s_r**2))
    return jnp.stack(feats, axis=-1)


_BRISQUE_RANGES = np.array(
    [[0.338, 10], [0.017204, 0.806612], [0.236, 1.642],
     [-0.123884, 0.20293], [0.000155, 0.712298], [0.001122, 0.470257],
     [0.244, 1.641], [-0.123586, 0.179083], [0.000152, 0.710456],
     [0.000975, 0.470984], [0.249, 1.555], [-0.135687, 0.100858],
     [0.000174, 0.684173], [0.000913, 0.534174], [0.258, 1.561],
     [-0.143408, 0.100486], [0.000179, 0.685696], [0.000888, 0.536508],
     [0.471, 3.264], [0.012809, 0.703171], [0.218, 1.046],
     [-0.094876, 0.187459], [1.5e-005, 0.442057], [0.001272, 0.40803],
     [0.222, 1.042], [-0.115772, 0.162604], [1.6e-005, 0.444362],
     [0.001374, 0.40243], [0.227, 0.996],
     [-0.117188, 0.09832299999999999], [3e-005, 0.531903],
     [0.001122, 0.369589], [0.228, 0.99], [-0.12243, 0.098658],
     [2.8e-005, 0.530092], [0.001118, 0.370399]], np.float32,
)


def brisque_features(x: Array, kernel_size: int = 7,
                     kernel_sigma: float = 7.0 / 6,
                     data_range: float = 1.0) -> Array:
    """NHWC grayscale batch -> (N, 36) scaled BRISQUE features, matching
    piq's feature pipeline exactly (reference module/piq/brisque.py:51-66,
    216-234). Sizes must be even (2x nearest downsample == ::2 stride)."""
    if x.shape[1] % 2 or x.shape[2] % 2:
        # piq downsamples by interpolating to size//2; the ::2 stride here
        # matches that only for even sizes — reject odd sizes loudly rather
        # than silently deviating (ADVICE r2)
        raise ValueError(
            f"brisque_features needs even H, W; got {x.shape[1:3]}"
        )
    luma = x[..., 0].astype(jnp.float32) / data_range * 255.0
    feats = []
    for _ in range(2):
        feats.append(_natural_scene_statistics(luma, kernel_size, kernel_sigma))
        luma = luma[:, ::2, ::2]
    f = jnp.concatenate(feats, axis=-1)
    rng_ = jnp.asarray(_BRISQUE_RANGES)
    return -1.0 + 2.0 * (f - rng_[:, 0]) / (rng_[:, 1] - rng_[:, 0])


def brisque(x: Array, sv_coef: np.ndarray, sv: np.ndarray,
            gamma: float = 0.05, rho: float = -153.591,
            data_range: float = 1.0) -> Array:
    """Full BRISQUE score given piq's pretrained SVR (sv_coef (M, 1),
    sv (36, M) — brisque_svm_weights.pt; reference module/piq/brisque.py:
    238-250). Lower = better quality."""
    f = brisque_features(x, data_range=data_range)
    sv = jnp.asarray(sv, jnp.float32)            # (36, M)
    dist = jnp.sum((f[:, :, None] - sv[None]) ** 2, axis=1)
    kernel = jnp.exp(-dist * gamma)              # (N, M)
    score = kernel @ jnp.asarray(sv_coef, jnp.float32).reshape(-1)
    return score - rho


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


# ---------------------------------------------------------------------------
# Inception Score (piq/isc semantics)
# ---------------------------------------------------------------------------

def inception_score(features: Array, num_splits: int = 10):
    """Inception Score from raw InceptionV3 logits (N, n_classes), matching
    piq 0.5.2 (reference module/piq/isc.py:20-56): softmax -> per-split
    exp(mean KL(p(y|x) || p(y))) -> (mean, std) over splits (std ddof=1).

    Use features/inception.inception_logits to produce the logits."""
    probas = jax.nn.softmax(jnp.asarray(features, jnp.float32), axis=-1)
    n = probas.shape[0]
    part = n // num_splits
    scores = []
    for i in range(num_splits):
        subset = probas[i * part:(i + 1) * part]
        p_y = jnp.mean(subset, axis=0)
        # kl_div(log p_y, p_yx) summed = sum p_yx * (log p_yx - log p_y)
        kl = jnp.sum(
            subset * (jnp.log(subset + 1e-30) - jnp.log(p_y + 1e-30)[None]),
            axis=-1,
        )
        scores.append(jnp.exp(jnp.mean(kl)))
    scores = jnp.stack(scores)
    return jnp.mean(scores), jnp.std(scores, ddof=1)


def inception_score_diff(pred_logits: Array, target_logits: Array,
                         num_splits: int = 10) -> Array:
    """piq's IS metric value: |IS(target) - IS(pred)|
    (reference module/piq/isc.py:59-99 compute_metric)."""
    p, _ = inception_score(pred_logits, num_splits)
    t, _ = inception_score(target_logits, num_splits)
    return jnp.abs(t - p)


# ---------------------------------------------------------------------------
# VSI — Visual Saliency-induced Index (reference module/piq/vsi.py:18-264)
# ---------------------------------------------------------------------------

_RGB2LMN = np.array([[0.06, 0.63, 0.27],
                     [0.30, 0.04, -0.35],
                     [0.34, -0.6, 0.17]], np.float32)
_RGB2XYZ = np.array([[0.4124564, 0.3575761, 0.1804375],
                     [0.2126729, 0.7151522, 0.0721750],
                     [0.0193339, 0.1191920, 0.9503041]], np.float32)
_D50_2 = np.array([0.9642119944211994, 1.0, 0.8251882845188288], np.float32)


def _rgb2lmn(x: Array) -> Array:                      # NHWC, C=3
    return x @ jnp.asarray(_RGB2LMN).T


def _rgb2lab(x: Array, data_range: float = 255.0) -> Array:
    """sRGB -> CIELAB, D50/2 illuminant (piq colour_conversion.py:22-87)."""
    x = x / data_range
    srgb = jnp.where(x <= 0.04045, x / 12.92,
                     jnp.power(jnp.abs((x + 0.055) / 1.055), 2.4))
    xyz = srgb @ jnp.asarray(_RGB2XYZ).T
    tmp = xyz / jnp.asarray(_D50_2)
    eps_, kappa = 0.008856, 903.3
    tmp = jnp.where(tmp > eps_, jnp.cbrt(tmp), (kappa * tmp + 16.0) / 116.0)
    w = jnp.asarray(np.array([[0, 116.0, 0], [500.0, -500.0, 0],
                              [0, 200.0, -200.0]], np.float32))
    return tmp @ w.T + jnp.asarray(np.array([-16.0, 0, 0], np.float32))


def _resize_align_corners(x: Array, size) -> Array:
    """Bilinear resize with torch align_corners=True semantics (NHWC)."""
    from jax.scipy.ndimage import map_coordinates

    n, h, w, c = x.shape
    oh, ow = size
    rows = jnp.arange(oh) * ((h - 1) / max(oh - 1, 1))
    cols = jnp.arange(ow) * ((w - 1) / max(ow - 1, 1))
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")

    def one(img):  # (H, W)
        return map_coordinates(img, [rr, cc], order=1, mode="nearest")

    return jax.vmap(jax.vmap(one, in_axes=-1, out_axes=-1))(x)


lru_cache_tables = {}


def _sdsp_tables(size: int, omega_0: float, sigma_f: float, sigma_d: float):
    key = (size, omega_0, sigma_f, sigma_d)
    if key not in lru_cache_tables:
        gx, gy = _meshgrid_np(size, size)
        radius = np.sqrt(gx**2 + gy**2)
        r = radius * (radius <= 0.5)
        r = _ifftshift_np(r)
        r[0, 0] = 1.0
        lg = np.exp(-(np.log(r / omega_0) ** 2) / (2 * sigma_f**2))
        lg[0, 0] = 0.0
        coords = (np.stack([gx, gy]) * size + 1).astype(np.float32)
        s_d = np.exp(-np.sum(coords**2, axis=0) / sigma_d**2).astype(np.float32)
        lru_cache_tables[key] = (lg.astype(np.float32), s_d)
    return lru_cache_tables[key]


def _sdsp(x: Array, omega_0=0.021, sigma_f=1.34, sigma_d=145.0,
          sigma_c=0.001) -> Array:
    """SDSP salient-region detection (reference module/piq/vsi.py:197-239).
    x: NHWC RGB in [0, 255]. Returns (N, H, W, 1) saliency in [0, 1]."""
    from mtd_gan_tpu.ops.dft import fft2_matmul, ifft2_matmul

    n, h, w, _ = x.shape
    size = 256
    xs = jax.image.resize(x, (n, size, size, 3), method="bilinear")
    lab = _rgb2lab(xs, data_range=255.0)

    lg, s_d = _sdsp_tables(size, omega_0, sigma_f, sigma_d)
    rows = jnp.transpose(lab, (0, 3, 1, 2)).reshape(n * 3, size, size)
    fr, fi = fft2_matmul(rows)
    lgj = jnp.asarray(lg)
    rr, _ = ifft2_matmul(fr * lgj, fi * lgj)
    rr = rr.reshape(n, 3, size, size)
    s_f = jnp.sqrt(jnp.sum(rr**2, axis=1))            # (N, 256, 256)

    eps_ = np.finfo(np.float32).eps
    mn = jnp.min(lab, axis=(1, 2), keepdims=True)
    mx = jnp.max(lab, axis=(1, 2), keepdims=True)
    normalized = (lab - mn) / (mx - mn + eps_)
    norm = jnp.sum(normalized[..., 1:] ** 2, axis=-1)
    s_c = 1.0 - jnp.exp(-norm / sigma_c**2)

    vs_m = (s_f * jnp.asarray(s_d) * s_c)[..., None]  # (N, 256, 256, 1)
    vs_m = _resize_align_corners(vs_m, (h, w))
    mn = jnp.min(vs_m, axis=(1, 2), keepdims=True)
    mx = jnp.max(vs_m, axis=(1, 2), keepdims=True)
    return (vs_m - mn) / (mx - mn + eps_)


def vsi(pred: Array, target: Array, data_range: float = 1.0,
        c1: float = 1.27, c2: float = 386.0, c3: float = 130.0,
        alpha: float = 0.4, beta: float = 0.02, omega_0: float = 0.021,
        sigma_f: float = 1.34, sigma_d: float = 145.0,
        sigma_c: float = 0.001) -> Array:
    """Visual Saliency-induced Index over NHWC batches (grayscale inputs
    are repeated to RGB, as piq does). Matches piq 0.5.2 vsi
    (reference module/piq/vsi.py:18-119)."""
    if pred.shape[-1] == 1:
        pred = jnp.repeat(pred, 3, axis=-1)
        target = jnp.repeat(target, 3, axis=-1)
    p = pred.astype(jnp.float32) * 255.0 / data_range
    t = target.astype(jnp.float32) * 255.0 / data_range

    vs_p = _sdsp(p, omega_0, sigma_f, sigma_d, sigma_c)
    vs_t = _sdsp(t, omega_0, sigma_f, sigma_d, sigma_c)
    p_lmn = _rgb2lmn(p)
    t_lmn = _rgb2lmn(t)

    h, w = p.shape[1:3]
    ks = max(1, round(min(h, w) / 256))
    if ks > 1:
        up, bp = ks // 2, (ks - 1) // 2
        padhw = [(0, 0), (up, bp), (up, bp), (0, 0)]
        vs_p = jnp.pad(vs_p, padhw, mode="edge")
        vs_t = jnp.pad(vs_t, padhw, mode="edge")
        p_lmn = jnp.pad(p_lmn, padhw, mode="edge")
        t_lmn = jnp.pad(t_lmn, padhw, mode="edge")

        def pool(z):
            return jax.lax.reduce_window(
                z, 0.0, jax.lax.add, (1, ks, ks, 1), (1, ks, ks, 1), "VALID"
            ) / (ks * ks)

        vs_p, vs_t = pool(vs_p), pool(vs_t)
        p_lmn, t_lmn = pool(p_lmn), pool(t_lmn)

    scharr = np.array([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]],
                      np.float32) / 16

    def grad_map(z):  # z: (N, H, W) L channel
        gx = depthwise_conv2d(z[..., None], jnp.asarray(scharr), 1)
        gy = depthwise_conv2d(z[..., None], jnp.asarray(scharr.T), 1)
        return jnp.sqrt(gx**2 + gy**2)

    sim = lambda a, b, c: (2.0 * a * b + c) / (a**2 + b**2 + c)
    gm_p = grad_map(p_lmn[..., 0])
    gm_t = grad_map(t_lmn[..., 0])
    s_vs = sim(vs_p, vs_t, c1)
    s_gm = sim(gm_p, gm_t, c2)
    s_m = sim(p_lmn[..., 1:2], t_lmn[..., 1:2], c3)
    s_n = sim(p_lmn[..., 2:3], t_lmn[..., 2:3], c3)
    s_c = s_m * s_n
    # real part of s_c ** beta for possibly-negative s_c
    s_c_pow = jnp.abs(s_c) ** beta * jnp.cos(
        beta * jnp.arctan2(jnp.zeros_like(s_c), s_c))
    s = s_vs * jnp.abs(s_gm) ** alpha * s_c_pow
    vs_max = jnp.maximum(vs_p, vs_t)
    eps_ = np.finfo(np.float32).eps
    out = (jnp.sum(s * vs_max, axis=(1, 2, 3)) + eps_) / (
        jnp.sum(vs_max, axis=(1, 2, 3)) + eps_)
    return jnp.mean(out)


# ---------------------------------------------------------------------------
# MSID — multi-scale intrinsic distance (reference module/piq/msid.py,
# arXiv:1905.11141). Host-side numpy (like KID): the kNN-graph build is
# sequential and N is corpus-sized (hundreds), so dense numpy beats a
# device round trip; the reference uses scipy.sparse, we use dense arrays.
# ---------------------------------------------------------------------------

_MSID_EPS = 1e-6
_MSID_NORMALIZATION = 1e6


def _msid_knn_adjacency(x: np.ndarray, k: int) -> np.ndarray:
    """Symmetric unweighted kNN adjacency (dense), matching the reference
    construction (msid.py:26-37: k+1 nearest by squared distance, self
    excluded, then symmetrized and re-binarized)."""
    n = len(x)
    dd = np.sum(x * x, axis=1)
    a = np.zeros((n, n), np.float64)
    for i in range(n):
        dists = dd - 2 * x[i] @ x.T
        idx = np.argpartition(dists, k + 1)[:k + 1]
        idx = idx[idx != i]
        a[i, idx] = 1.0
    a = (a + a.T) / 2
    a[a > 0] = 1.0
    return a


def _msid_laplacian(a: np.ndarray, normalized: bool = True) -> np.ndarray:
    deg = a.sum(axis=1)
    if not normalized:
        return np.diag(deg) - a
    inv_sqrt = 1.0 / np.sqrt(deg)
    return np.eye(len(a)) - (a * inv_sqrt[:, None]) * inv_sqrt[None, :]


def _msid_lanczos(a: np.ndarray, m: int, nv: int, rademacher: bool):
    """Block Lanczos with full reorthogonalization over nv random starting
    vectors; returns the (nv, m, m) tridiagonal matrices (msid.py:49-135).
    Draws from the GLOBAL np.random stream in the same order as the
    reference (one randn(n, nv) call), so seeded runs are comparable."""
    n = a.shape[0]
    if rademacher:
        v0 = np.sign(np.random.randn(n, nv))
    else:
        v0 = np.random.randn(n, nv)
    v0 = v0 / np.linalg.norm(v0, axis=0)
    V = np.zeros((n, m, nv))
    T = np.zeros((nv, m, m))
    V[:, 0, :] = v0

    w = a @ v0
    alpha = np.einsum("ij,ij->j", w, v0)
    w = w - alpha[None, :] * v0
    beta = np.sqrt(np.einsum("ij,ij->j", w, w))
    T[:, 0, 0] = alpha
    T[:, 0, 1] = beta
    T[:, 1, 0] = beta
    w = w / beta[None, :]
    V[:, 1, :] = w

    for i in range(1, m):
        v_prev = V[:, i - 1, :]
        v_cur = V[:, i, :]
        w = a @ v_cur - beta[None, :] * v_prev
        alpha = np.einsum("ij,ij->j", w, v_cur)
        T[:, i, i] = alpha
        if i == m - 1:
            break
        w = w - alpha[None, :] * v_cur
        # full reorthogonalization against the basis built so far
        w = w - np.einsum("ijk,jk->ik", V, np.einsum("ijk,ik->jk", V, w))
        beta = np.sqrt(np.einsum("ij,ij->j", w, w))
        w = w / beta[None, :]
        T[:, i, i + 1] = beta
        T[:, i + 1, i] = beta
        # iterate reortho until the basis is orthogonal to w (msid.py:117-128)
        converged = False
        for _ in range(100):
            inner = np.einsum("ijk,ik->jk", V, w)
            if not (inner > 1e-5).sum():
                converged = True
                break
            w = w - np.einsum("ijk,jk->ik", V, inner)
            w = w / np.linalg.norm(w, axis=0)[None, :]
        V[:, i + 1, :] = w
        if (np.abs(beta) > 1e-6).sum() == 0 or not converged:
            break
    return T


def _msid_heat_traces(lap: np.ndarray, m: int, niters: int,
                      ts: np.ndarray, rademacher: bool) -> np.ndarray:
    """Variance-reduced SLQ estimate of tr(exp(-t L)) per temperature
    (msid.py:139-225 _slq_red_var: exp-trace minus linear control variate)."""
    T = _msid_lanczos(lap, m, niters, rademacher)
    eigvals, eigvecs = np.linalg.eigh(T)
    sq_first = eigvecs[:, 0, :] ** 2
    n = lap.shape[0]
    traces = np.zeros((2, len(ts)))
    for fi, f in enumerate((np.exp, lambda z: z)):
        e = f(-np.outer(ts, eigvals)).reshape(len(ts), niters, m)
        traces[fi] = n * (e * sq_first).sum(-1).mean(-1)
    return (traces[0] - traces[1] / np.exp(ts)) - ts * n / np.exp(ts)


def msid_descriptor(x: np.ndarray, ts=None, k: int = 5, m: int = 10,
                    niters: int = 100, rademacher: bool = False,
                    normalized_laplacian: bool = True,
                    normalize: str = "empty") -> np.ndarray:
    """Normalized heat-kernel trace descriptor of one sample set
    (reference msid.py:258-291)."""
    if ts is None:
        ts = np.logspace(-1, 1, 256)
    lap = _msid_laplacian(_msid_knn_adjacency(np.asarray(x, np.float64), k),
                          normalized_laplacian)
    n = lap.shape[0]
    desc = _msid_heat_traces(lap, m, niters, ts, rademacher)
    if normalize == "empty":
        desc = desc / n
    elif normalize == "complete":
        desc = desc / (1 + (n - 1) * np.exp(-(1 + 1 / (n - 1)) * ts))
    elif normalize == "er":
        xs = np.linspace(0, 1, n)
        er_spectrum = 4 / np.sqrt(k) * xs + 1 - 2 / np.sqrt(k)
        desc = desc / (np.exp(-np.outer(ts, er_spectrum)).sum(-1) + _MSID_EPS)
    elif normalize not in ("none", None):
        raise ValueError(f"unknown normalization {normalize!r}")
    return desc * _MSID_NORMALIZATION


def msid(pred_features: np.ndarray, target_features: np.ndarray, ts=None,
         k: int = 5, m: int = 10, niters: int = 100,
         rademacher: bool = False, normalized_laplacian: bool = True,
         normalize: str = "empty", msid_mode: str = "max") -> float:
    """MSID score between two feature sets (reference msid.py:293-397)."""
    if ts is None:
        ts = np.logspace(-1, 1, 256)
    d_p = msid_descriptor(pred_features, ts, k, m, niters, rademacher,
                          normalized_laplacian, normalize)
    d_t = msid_descriptor(target_features, ts, k, m, niters, rademacher,
                          normalized_laplacian, normalize)
    if msid_mode == "l2":
        return float(np.linalg.norm(d_p - d_t))
    if msid_mode == "max":
        c = np.exp(-2 * (ts + 1 / ts))
        return float(np.amax(c * np.abs(d_p - d_t)))
    raise ValueError("msid_mode must be 'l2' or 'max'")


# ---------------------------------------------------------------------------
# GS — geometry score (reference module/piq/gs.py, arXiv:1802.02664).
# The persistence-interval computation requires the `gudhi` witness-complex
# library, which the reference also hard-imports (its module cannot even be
# imported without gudhi). The RLT statistics are pure numpy and tested;
# geometry_score() raises a clear ImportError when gudhi is absent
# (WEIGHTS.md documents the gate).
# ---------------------------------------------------------------------------

def _gs_rlt(intervals, alpha_max: float, i_max: int = 100) -> np.ndarray:
    """Relative living times of beta_1 from H1 persistence intervals
    (paper eqs. (2)-(3); reference gs.py:18-63). Vectorized over the
    switch-point midpoints."""
    ivals = np.array([[lo, alpha_max if np.isinf(hi) else hi]
                      for lo, hi in intervals], np.float64).reshape(-1, 2)
    rlt = np.zeros(i_max)
    if len(ivals) == 0:
        rlt[0] = 1.0
        return rlt
    points = np.sort(np.unique(
        np.concatenate([ivals.flatten(), [0.0, alpha_max]])))
    mids = (points[:-1] + points[1:]) / 2
    spans = np.diff(points)
    # holes alive at each midpoint
    alive = ((mids[:, None] >= ivals[None, :, 0])
             & (mids[:, None] < ivals[None, :, 1])).sum(axis=1)
    for s, span in zip(alive, spans):
        if s < i_max:
            rlt[s] += span
    return rlt / alpha_max


def _gs_witness_intervals(features: np.ndarray, sample_size: int,
                          gamma=None):
    """H1 persistence intervals of a witness complex over random landmarks
    (reference gs.py:86-120). Needs gudhi."""
    try:
        import gudhi
    except ImportError as e:  # pragma: no cover - gudhi absent from image
        raise ImportError(
            "geometry_score needs the `gudhi` library (witness-complex "
            "persistence); the reference's module/piq/gs.py has the same "
            "hard dependency. Install gudhi to enable GS."
        ) from e
    n = features.shape[0]
    if gamma is None:
        gamma = 1.0 / 128 * n / 5000
    idx = np.random.choice(n, sample_size)
    landmarks = features[idx]
    d2 = np.sqrt(np.maximum(
        np.sum(features**2, 1)[:, None] + np.sum(landmarks**2, 1)[None]
        - 2 * features @ landmarks.T, 0.0))
    max_dist = float(np.max(d2))
    order = np.argsort(d2, axis=1)
    sorted_d = np.take_along_axis(d2, order, axis=1)
    table = np.dstack([order, sorted_d])
    wc = gudhi.WitnessComplex(table)
    alpha_max = max_dist * gamma
    st = wc.create_simplex_tree(max_alpha_square=alpha_max,
                                limit_dimension=2)
    st.persistence(homology_coeff_field=2)
    return st.persistence_intervals_in_dimension(1), alpha_max


def geometry_score(pred_features: np.ndarray, target_features: np.ndarray,
                   sample_size: int = 64, num_iters: int = 1000,
                   gamma=None, i_max: int = 100) -> float:
    """Geometry score between two feature sets: 1000 * sum of squared
    differences of mean RLTs (reference gs.py:168-190, Algorithm 2)."""
    def mean_rlt(feats):
        rlts = [
            _gs_rlt(*_gs_witness_intervals(feats, sample_size, gamma), i_max)
            for _ in range(num_iters)
        ]
        return np.vstack(rlts).mean(axis=0)

    mp = mean_rlt(np.asarray(pred_features, np.float64))
    mt = mean_rlt(np.asarray(target_features, np.float64))
    return float(np.sum((mp - mt) ** 2) * 1000)
