"""Lane-packed ResFFT generator inference: G slices ride in the channel dim.

Motivation (PERF.md round-2 decomposition): at C=32 every conv and
elementwise op fills only a quarter of the TPU's 128-wide lanes — the conv
skeleton alone runs ~4x over its HBM floor. Packing `groups` slices into
the channel axis (groups*C = 128 for the flagship config) makes every op
lane-dense while computing EXACTLY the same per-slice math:

* convs/deconvs become grouped convolutions with the per-slice kernel
  tiled along the output-channel axis;
* the spectral 1x1 mix is applied per slice group;
* residuals/activations are elementwise and pack transparently.

Inference-only, parameter-compatible with ResFFTGenerator (the same
params pytree drives both paths; reference arch/Ours/networks.py:38-164)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mtd_gan_tpu.ops import dft

Array = jax.Array


def _gconv(h, kernel, bias, groups, dtype, pad=1):
    kh, kw = kernel.shape[0], kernel.shape[1]
    kg = jnp.concatenate([kernel] * groups, axis=-1)
    y = jax.lax.conv_general_dilated(
        h.astype(dtype), kg.astype(dtype), (1, 1), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + jnp.tile(bias, groups).astype(dtype)


def _gdeconv(h, kernel, bias, groups, dtype, pad=1):
    # mirrors ops.layers.ConvTranspose at stride 1: flipped kernel,
    # padding (k - 1 - p)
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1, :, :]
    kg = jnp.concatenate([flipped] * groups, axis=-1)
    y = jax.lax.conv_general_dilated(
        h.astype(dtype), kg.astype(dtype), (1, 1),
        [(kh - 1 - pad, kh - 1 - pad), (kw - 1 - pad, kw - 1 - pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + jnp.tile(bias, groups).astype(dtype)


def _gfft_block(h, p, groups, c, dtype):
    """Grouped Res-FFT-Conv block (reference arch/Ours/networks.py:15-36):
    out = h + relu(conv3x3(h)) + irfft2(mix([Re;Im] rfft2(h))) per group."""
    n, hh, ww, _ = h.shape
    img = _gconv(h, p["img_kernel"], p["img_bias"], groups, dtype)
    img = jax.nn.relu(img)

    x32 = h.astype(jnp.float32)
    with jax.default_matmul_precision("tensorfloat32"):
        zr, zi = dft.rfft2_matmul(x32)               # (n, H, K, G*C)
        k = zr.shape[2]
        zr = zr.reshape(n, hh, k, groups, c)
        zi = zi.reshape(n, hh, k, groups, c)
        sp = jnp.concatenate([zr, zi], axis=-1)      # (n, H, K, G, 2C)
        sp = sp @ p["fft_kernel"].astype(jnp.float32) + p["fft_bias"].astype(
            jnp.float32
        )
        sp = jax.nn.relu(sp)
        re, im = jnp.split(sp, 2, axis=-1)
        re = re.reshape(n, hh, k, groups * c)
        im = im.reshape(n, hh, k, groups * c)
        fft_out = dft.irfft2_matmul(re, im, (hh, ww)).astype(dtype)
    return h + img + fft_out


@partial(jax.jit, static_argnames=("features", "num_layers", "groups", "dtype"))
def packed_resfft_apply(params, x: Array, features: int = 32,
                        num_layers: int = 10, groups: int = 4,
                        dtype=jnp.bfloat16) -> Array:
    """Run the ResFFT generator on (N, H, W, 1) with N % groups == 0 by
    packing `groups` slices into channels. Numerically identical to
    ResFFTGenerator.apply on the same params (grouped ops compute the same
    per-slice math)."""
    n, hh, ww, _ = x.shape
    assert n % groups == 0, (n, groups)
    c = features
    # pack: (N, H, W, 1) -> (N/G, H, W, G)
    xp = x.reshape(n // groups, groups, hh, ww).transpose(0, 2, 3, 1)
    xp = xp.astype(dtype)

    conv = lambda h, name: _gconv(h, params[name]["kernel"],
                                  params[name]["bias"], groups, dtype)
    deconv = lambda h, name: _gdeconv(h, params[name]["kernel"],
                                      params[name]["bias"], groups, dtype)
    fft = lambda h, i: _gfft_block(h, params[f"fft_{i}"], groups, c, dtype)

    skips = []
    h = xp
    for i in range(num_layers):
        h = jax.nn.relu(conv(h, f"enc_{i}"))
        h = fft(h, i)
        skips.append(h)
    h = jax.nn.relu(conv(h, f"enc_{num_layers}"))
    h = fft(h, num_layers)

    h = jax.nn.relu(deconv(h, f"dec_{num_layers}") + skips[-1])
    for i in range(num_layers - 1, 0, -1):
        h = fft(h, 2 * num_layers - i)
        h = jax.nn.relu(deconv(h, f"dec_{i}") + skips[i - 1])
    h = fft(h, 2 * num_layers)
    out = jax.nn.relu(deconv(h, "dec_0") + xp)       # (N/G, H, W, G)

    # unpack: (N/G, H, W, G) -> (N, H, W, 1)
    return out.transpose(0, 3, 1, 2).reshape(n, hh, ww, 1)
