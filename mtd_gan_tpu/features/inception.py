"""FID InceptionV3 (pt_inception variant) in flax, NHWC.

Parity target: the vendored piq extractor the reference uses for FID
(module/piq/feature_extractors/fid_inception.py — the mseitzer/pytorch-fid
port of TF-Slim InceptionV3: FIDInceptionA/C with count_include_pad=False
average pools, FIDInceptionE_2 with a max pool). Input: [0,1] images,
bilinearly resized to 299x299 and scaled to [-1,1]; output: 2048-d pool3
features. Weights import from pt_inception-2015-12-05 .pth if present,
seeded fallback otherwise (see mtd_gan_tpu.features docstring).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# primitive ops
# ---------------------------------------------------------------------------

def _conv_bn(x: Array, p: Dict, stride=1, padding=0) -> Array:
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    elif isinstance(padding, tuple):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    inv = jax.lax.rsqrt(p["var"] + 1e-3) * p["scale"]
    y = y * inv.astype(y.dtype) + (p["bias"] - p["mean"] * inv).astype(y.dtype)
    return jax.nn.relu(y)


def _maxpool(x, k=3, s=2, pad=0):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), "VALID")


def _avgpool_exclude_pad(x, k=3, s=1, pad=1):
    """Average pool with count_include_pad=False (the FID-variant tweak)."""
    ones = jnp.ones_like(x[..., :1])
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    op = jnp.pad(ones, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    s_sum = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, k, k, 1),
                                  (1, s, s, 1), "VALID")
    c_sum = jax.lax.reduce_window(op, 0.0, jax.lax.add, (1, k, k, 1),
                                  (1, s, s, 1), "VALID")
    return s_sum / c_sum


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------

def _spec():
    """(name, kh, kw, cin, cout) for every BasicConv2d in pt_inception."""
    s = []

    def c(name, kh, kw, cin, cout):
        s.append((name, kh, kw, cin, cout))

    c("Conv2d_1a_3x3", 3, 3, 3, 32)
    c("Conv2d_2a_3x3", 3, 3, 32, 32)
    c("Conv2d_2b_3x3", 3, 3, 32, 64)
    c("Conv2d_3b_1x1", 1, 1, 64, 80)
    c("Conv2d_4a_3x3", 3, 3, 80, 192)

    def inception_a(name, cin, pool):
        c(f"{name}.branch1x1", 1, 1, cin, 64)
        c(f"{name}.branch5x5_1", 1, 1, cin, 48)
        c(f"{name}.branch5x5_2", 5, 5, 48, 64)
        c(f"{name}.branch3x3dbl_1", 1, 1, cin, 64)
        c(f"{name}.branch3x3dbl_2", 3, 3, 64, 96)
        c(f"{name}.branch3x3dbl_3", 3, 3, 96, 96)
        c(f"{name}.branch_pool", 1, 1, cin, pool)

    inception_a("Mixed_5b", 192, 32)
    inception_a("Mixed_5c", 256, 64)
    inception_a("Mixed_5d", 288, 64)

    c("Mixed_6a.branch3x3", 3, 3, 288, 384)
    c("Mixed_6a.branch3x3dbl_1", 1, 1, 288, 64)
    c("Mixed_6a.branch3x3dbl_2", 3, 3, 64, 96)
    c("Mixed_6a.branch3x3dbl_3", 3, 3, 96, 96)

    def inception_c(name, c7):
        c(f"{name}.branch1x1", 1, 1, 768, 192)
        c(f"{name}.branch7x7_1", 1, 1, 768, c7)
        c(f"{name}.branch7x7_2", 1, 7, c7, c7)
        c(f"{name}.branch7x7_3", 7, 1, c7, 192)
        c(f"{name}.branch7x7dbl_1", 1, 1, 768, c7)
        c(f"{name}.branch7x7dbl_2", 7, 1, c7, c7)
        c(f"{name}.branch7x7dbl_3", 1, 7, c7, c7)
        c(f"{name}.branch7x7dbl_4", 7, 1, c7, c7)
        c(f"{name}.branch7x7dbl_5", 1, 7, c7, 192)
        c(f"{name}.branch_pool", 1, 1, 768, 192)

    inception_c("Mixed_6b", 128)
    inception_c("Mixed_6c", 160)
    inception_c("Mixed_6d", 160)
    inception_c("Mixed_6e", 192)

    c("Mixed_7a.branch3x3_1", 1, 1, 768, 192)
    c("Mixed_7a.branch3x3_2", 3, 3, 192, 320)
    c("Mixed_7a.branch7x7x3_1", 1, 1, 768, 192)
    c("Mixed_7a.branch7x7x3_2", 1, 7, 192, 192)
    c("Mixed_7a.branch7x7x3_3", 7, 1, 192, 192)
    c("Mixed_7a.branch7x7x3_4", 3, 3, 192, 192)

    def inception_e(name, cin):
        c(f"{name}.branch1x1", 1, 1, cin, 320)
        c(f"{name}.branch3x3_1", 1, 1, cin, 384)
        c(f"{name}.branch3x3_2a", 1, 3, 384, 384)
        c(f"{name}.branch3x3_2b", 3, 1, 384, 384)
        c(f"{name}.branch3x3dbl_1", 1, 1, cin, 448)
        c(f"{name}.branch3x3dbl_2", 3, 3, 448, 384)
        c(f"{name}.branch3x3dbl_3a", 1, 3, 384, 384)
        c(f"{name}.branch3x3dbl_3b", 3, 1, 384, 384)
        c(f"{name}.branch_pool", 1, 1, cin, 192)

    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)
    return s


def init_inception_params(rng: Optional[jax.Array] = None) -> Dict:
    if rng is None:
        rng = jax.random.PRNGKey(2015)
    params = {}
    for name, kh, kw, cin, cout in _spec():
        rng, k = jax.random.split(rng)
        scale = float(np.sqrt(2.0 / (kh * kw * cin)))
        params[name] = {
            "kernel": jax.random.normal(k, (kh, kw, cin, cout), jnp.float32) * scale,
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        }
    rng, k = jax.random.split(rng)
    params["fc"] = {
        "kernel": jax.random.normal(k, (2048, 1008), jnp.float32) * 0.02,
        "bias": jnp.zeros((1008,), jnp.float32),
    }
    return params


def import_torch_inception(sd) -> Dict:
    params = {}
    for name, *_ in _spec():
        w = np.asarray(sd[f"{name}.conv.weight"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "scale": jnp.asarray(np.asarray(sd[f"{name}.bn.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bn.bias"])),
            "mean": jnp.asarray(np.asarray(sd[f"{name}.bn.running_mean"])),
            "var": jnp.asarray(np.asarray(sd[f"{name}.bn.running_var"])),
        }
    # classifier head (pt_inception FID weights carry fc with 1008 classes;
    # torchvision inception_v3 with 1000) — needed for Inception Score
    if "fc.weight" in sd:
        params["fc"] = {
            "kernel": jnp.asarray(np.asarray(sd["fc.weight"]).T),
            "bias": jnp.asarray(np.asarray(sd["fc.bias"])),
        }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _inception_a(params, prefix, x):
    b1 = _conv_bn(x, params[f"{prefix}.branch1x1"])
    b5 = _conv_bn(x, params[f"{prefix}.branch5x5_1"])
    b5 = _conv_bn(b5, params[f"{prefix}.branch5x5_2"], padding=2)
    bd = _conv_bn(x, params[f"{prefix}.branch3x3dbl_1"])
    bd = _conv_bn(bd, params[f"{prefix}.branch3x3dbl_2"], padding=1)
    bd = _conv_bn(bd, params[f"{prefix}.branch3x3dbl_3"], padding=1)
    bp = _avgpool_exclude_pad(x)
    bp = _conv_bn(bp, params[f"{prefix}.branch_pool"])
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(params, x):
    b3 = _conv_bn(x, params["Mixed_6a.branch3x3"], stride=2)
    bd = _conv_bn(x, params["Mixed_6a.branch3x3dbl_1"])
    bd = _conv_bn(bd, params["Mixed_6a.branch3x3dbl_2"], padding=1)
    bd = _conv_bn(bd, params["Mixed_6a.branch3x3dbl_3"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, prefix, x):
    b1 = _conv_bn(x, params[f"{prefix}.branch1x1"])
    b7 = _conv_bn(x, params[f"{prefix}.branch7x7_1"])
    b7 = _conv_bn(b7, params[f"{prefix}.branch7x7_2"], padding=(0, 3))
    b7 = _conv_bn(b7, params[f"{prefix}.branch7x7_3"], padding=(3, 0))
    bd = _conv_bn(x, params[f"{prefix}.branch7x7dbl_1"])
    bd = _conv_bn(bd, params[f"{prefix}.branch7x7dbl_2"], padding=(3, 0))
    bd = _conv_bn(bd, params[f"{prefix}.branch7x7dbl_3"], padding=(0, 3))
    bd = _conv_bn(bd, params[f"{prefix}.branch7x7dbl_4"], padding=(3, 0))
    bd = _conv_bn(bd, params[f"{prefix}.branch7x7dbl_5"], padding=(0, 3))
    bp = _avgpool_exclude_pad(x)
    bp = _conv_bn(bp, params[f"{prefix}.branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, x):
    b3 = _conv_bn(x, params["Mixed_7a.branch3x3_1"])
    b3 = _conv_bn(b3, params["Mixed_7a.branch3x3_2"], stride=2)
    b7 = _conv_bn(x, params["Mixed_7a.branch7x7x3_1"])
    b7 = _conv_bn(b7, params["Mixed_7a.branch7x7x3_2"], padding=(0, 3))
    b7 = _conv_bn(b7, params["Mixed_7a.branch7x7x3_3"], padding=(3, 0))
    b7 = _conv_bn(b7, params["Mixed_7a.branch7x7x3_4"], stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, prefix, x, pool: str):
    b1 = _conv_bn(x, params[f"{prefix}.branch1x1"])
    b3 = _conv_bn(x, params[f"{prefix}.branch3x3_1"])
    b3 = jnp.concatenate([
        _conv_bn(b3, params[f"{prefix}.branch3x3_2a"], padding=(0, 1)),
        _conv_bn(b3, params[f"{prefix}.branch3x3_2b"], padding=(1, 0)),
    ], axis=-1)
    bd = _conv_bn(x, params[f"{prefix}.branch3x3dbl_1"])
    bd = _conv_bn(bd, params[f"{prefix}.branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate([
        _conv_bn(bd, params[f"{prefix}.branch3x3dbl_3a"], padding=(0, 1)),
        _conv_bn(bd, params[f"{prefix}.branch3x3dbl_3b"], padding=(1, 0)),
    ], axis=-1)
    if pool == "max":  # FIDInceptionE_2 quirk
        bp = _maxpool(x, k=3, s=1, pad=1)
    else:
        bp = _avgpool_exclude_pad(x)
    bp = _conv_bn(bp, params[f"{prefix}.branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3_features(params: Dict, x: Array) -> Array:
    """[0,1] NHWC (any size, 1 or 3 channels) -> (B, 2048) pool3 features."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    n = x.shape[0]
    x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear")
    x = x * 2.0 - 1.0

    h = _conv_bn(x, params["Conv2d_1a_3x3"], stride=2)
    h = _conv_bn(h, params["Conv2d_2a_3x3"])
    h = _conv_bn(h, params["Conv2d_2b_3x3"], padding=1)
    h = _maxpool(h)
    h = _conv_bn(h, params["Conv2d_3b_1x1"])
    h = _conv_bn(h, params["Conv2d_4a_3x3"])
    h = _maxpool(h)
    h = _inception_a(params, "Mixed_5b", h)
    h = _inception_a(params, "Mixed_5c", h)
    h = _inception_a(params, "Mixed_5d", h)
    h = _inception_b(params, h)
    h = _inception_c(params, "Mixed_6b", h)
    h = _inception_c(params, "Mixed_6c", h)
    h = _inception_c(params, "Mixed_6d", h)
    h = _inception_c(params, "Mixed_6e", h)
    h = _inception_d(params, h)
    h = _inception_e(params, "Mixed_7b", h, pool="avg")
    h = _inception_e(params, "Mixed_7c", h, pool="max")
    return jnp.mean(h, axis=(1, 2))


def inception_logits(params: Dict, x: Array) -> Array:
    """[0,1] NHWC batch -> (B, n_classes) raw classifier logits — the input
    piq's Inception Score expects (reference module/piq/isc.py:20-42)."""
    feats = inception_pool3_features(params, x)
    fc = params["fc"]
    return feats @ fc["kernel"] + fc["bias"]
