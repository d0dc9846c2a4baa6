"""Learned full-reference metrics: LPIPS and DISTS.

Parity targets: reference module/piq/perceptual.py:269-306 (LPIPS — VGG16
relu{1_2,2_2,3_3,4_3,5_3} unit-normalized feature MSE, per-channel learned
weights) and :307-377 (DISTS — structure+texture similarity on VGG16
features with L2-pool downsampling and learned alpha/beta weights).

Both metrics need externally trained weights (torchvision vgg16 +
lpips_weights.pt / dists_weights.pt — see WEIGHTS.md); the functions here
take them as explicit arguments so the compute path is fully testable with
random weights and exactly reproducible with the real ones.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtd_gan_tpu.features.vgg import vgg16_features

Array = jax.Array

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_EPS = 1e-10  # piq ContentLoss EPS (perceptual.py)


def _prep(x: Array) -> Array:
    """Grayscale NHWC -> ImageNet-normalized 3-channel NHWC."""
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _unit_normalize(f: Array) -> Array:
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + _EPS)


def lpips(pred: Array, target: Array, vgg16_params,
          layer_weights: Sequence[np.ndarray]) -> Array:
    """LPIPS distance (lower = more similar). `layer_weights` are the 5
    learned per-channel weights from lpips_weights.pt, each (C_l,) or
    (1, C_l, 1, 1) torch-shaped (reference module/piq/perceptual.py:294-305;
    score = sum_l mean_hw(w_l * (f_x - f_y)^2) summed over channels)."""
    fx = vgg16_features(vgg16_params, _prep(pred), pool="max")
    fy = vgg16_features(vgg16_params, _prep(target), pool="max")
    total = 0.0
    for x_l, y_l, w in zip(fx, fy, layer_weights):
        w = jnp.asarray(np.asarray(w, np.float32).reshape(-1))
        d = (_unit_normalize(x_l) - _unit_normalize(y_l)) ** 2
        total = total + jnp.sum(jnp.mean(d * w, axis=(1, 2)), axis=-1)
    return jnp.mean(total)


def dists(pred: Array, target: Array, vgg16_params,
          alpha: Sequence[np.ndarray], beta: Sequence[np.ndarray]) -> Array:
    """DISTS similarity-derived distance (lower = more similar). alpha/beta
    are the learned per-channel weights split by layer, channels
    [3, 64, 128, 256, 512, 512] — the input image is feature 0 (reference
    module/piq/perceptual.py:307-370: 1 - sum_l mean(alpha_l*S_structure +
    beta_l*S_texture))."""
    eps = 1e-6
    px, pt = _prep(pred), _prep(target)
    fx: List[Array] = [px] + vgg16_features(vgg16_params, px, pool="l2")
    fy: List[Array] = [pt] + vgg16_features(vgg16_params, pt, pool="l2")

    structure, texture = [], []
    for x_l, y_l in zip(fx, fy):
        x_mean = jnp.mean(x_l, axis=(1, 2), keepdims=True)
        y_mean = jnp.mean(y_l, axis=(1, 2), keepdims=True)
        structure.append(
            (2.0 * x_mean * y_mean + eps) / (x_mean**2 + y_mean**2 + eps)
        )
        x_var = jnp.mean((x_l - x_mean) ** 2, axis=(1, 2), keepdims=True)
        y_var = jnp.mean((y_l - y_mean) ** 2, axis=(1, 2), keepdims=True)
        xy_cov = jnp.mean(x_l * y_l, axis=(1, 2), keepdims=True) - x_mean * y_mean
        texture.append((2.0 * xy_cov + eps) / (x_var + y_var + eps))

    weights = [jnp.asarray(np.asarray(w, np.float32).reshape(-1))
               for w in list(alpha) + list(beta)]
    total = 0.0
    for d, w in zip(structure + texture, weights):
        total = total + jnp.sum(jnp.mean(d * w, axis=(1, 2)), axis=-1)
    return jnp.mean(1.0 - total)


# ---------------------------------------------------------------------------
# PieAPP — Perceptual Image-Error Assessment through Pairwise Preference
# (reference module/piq/pieapp.py:20-206; weights PieAPPv0.1.pth, see
# WEIGHTS.md). Architecture + scoring implemented here; params explicit.
# ---------------------------------------------------------------------------

_PIEAPP_CONVS = [
    ("conv1", 3, 64), ("conv2", 64, 64), ("conv3", 64, 64),
    ("conv4", 64, 128), ("conv5", 128, 128), ("conv6", 128, 128),
    ("conv7", 128, 256), ("conv8", 256, 256), ("conv9", 256, 256),
    ("conv10", 256, 512), ("conv11", 512, 512),
]
_PIEAPP_FCS = [("fc1_score", 120832, 512), ("fc2_score", 512, 1),
               ("fc1_weight", 2048, 512), ("fc2_weight", 512, 1),
               ("ref_score_subtract", 1, 1)]


def init_pieapp_params(rng=None):
    """Random PieAPP params (for arch tests; real weights via
    import_torch_pieapp)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    params = {}
    for name, cin, cout in _PIEAPP_CONVS:
        rng, k = jax.random.split(rng)
        scale = float(np.sqrt(2.0 / (9 * cin)))
        params[name] = {
            "kernel": jax.random.normal(k, (3, 3, cin, cout)) * scale,
            "bias": jnp.zeros((cout,)),
        }
    for name, cin, cout in _PIEAPP_FCS:
        rng, k = jax.random.split(rng)
        params[name] = {
            "kernel": jax.random.normal(k, (cin, cout)) * float(cin**-0.5),
            "bias": jnp.zeros((cout,)),
        }
    return params


def import_torch_pieapp(sd) -> dict:
    """torch PieAPPv0.1.pth state dict -> jax params (OIHW->HWIO kernels,
    transposed Linear weights). Handles the (1,)-shaped
    ref_score_subtract.weight quirk piq patches (pieapp.py:137)."""
    params = {}
    for name, *_ in _PIEAPP_CONVS:
        w = np.asarray(sd[f"{name}.weight"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
        }
    for name, *_ in _PIEAPP_FCS:
        w = np.asarray(sd[f"{name}.weight"]).reshape(-1, 1).T \
            if name == "ref_score_subtract" \
            else np.asarray(sd[f"{name}.weight"]).T
        params[name] = {
            "kernel": jnp.asarray(w),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
        }
    return params


def _pieapp_conv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + p["bias"].astype(x.dtype))


def _pieapp_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pieapp_flat(x):
    # torch flattens NCHW -> (C, H, W) order; transpose for weight parity
    return x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)


def pieapp_features(params, patches: Array):
    """(P, 64, 64, 3) patches in [0, 255] -> (features, weights) matching
    PieAPPModel.forward (reference pieapp.py:56-82)."""
    p = params
    x3 = _pieapp_conv(p["conv3"], _pieapp_pool(
        _pieapp_conv(p["conv2"], _pieapp_conv(p["conv1"], patches))))
    x5 = _pieapp_conv(p["conv5"], _pieapp_pool(_pieapp_conv(p["conv4"], x3)))
    x7 = _pieapp_conv(p["conv7"], _pieapp_pool(_pieapp_conv(p["conv6"], x5)))
    x9 = _pieapp_conv(p["conv9"], _pieapp_pool(_pieapp_conv(p["conv8"], x7)))
    x11 = _pieapp_flat(_pieapp_conv(
        p["conv11"], _pieapp_pool(_pieapp_conv(p["conv10"], x9))))
    feats = jnp.concatenate(
        [_pieapp_flat(x3), _pieapp_flat(x5), _pieapp_flat(x7),
         _pieapp_flat(x9), x11], axis=1)
    return feats, x11


def _pieapp_crop(x: Array, size: int = 64, stride: int = 27) -> Array:
    """NHWC -> (N, P, size, size, C) patch grid, torch-unfold row-major
    order (reference functional/base.py:89-101)."""
    n, h, w, c = x.shape
    tiles = [
        x[:, i:i + size, j:j + size, :]
        for i in range(0, h - size + 1, stride)
        for j in range(0, w - size + 1, stride)
    ]
    return jnp.stack(tiles, axis=1)


def pieapp(pred: Array, target: Array, params, data_range: float = 1.0,
           stride: int = 27) -> Array:
    """PieAPP score over NHWC batches (grayscale repeated to RGB), matching
    piq's patch-weighted scoring (reference pieapp.py:149-188)."""
    if pred.shape[-1] == 1:
        pred = jnp.repeat(pred, 3, axis=-1)
        target = jnp.repeat(target, 3, axis=-1)
    n = pred.shape[0]
    xp = _pieapp_crop(pred.astype(jnp.float32) / data_range * 255.0,
                      stride=stride)
    xt = _pieapp_crop(target.astype(jnp.float32) / data_range * 255.0,
                      stride=stride)
    np_ = xp.shape[1]
    fp, wp = pieapp_features(params, xp.reshape((-1,) + xp.shape[2:]))
    ft, wt = pieapp_features(params, xt.reshape((-1,) + xt.shape[2:]))

    fdiff = ft - fp
    wdiff = wt - wp
    p = params
    dist = jax.nn.relu(fdiff @ p["fc1_score"]["kernel"]
                       + p["fc1_score"]["bias"])
    dist = 0.01 * (dist @ p["fc2_score"]["kernel"] + p["fc2_score"]["bias"])
    dist = dist @ p["ref_score_subtract"]["kernel"] \
        + p["ref_score_subtract"]["bias"]
    wgt = jax.nn.relu(wdiff @ p["fc1_weight"]["kernel"]
                      + p["fc1_weight"]["bias"])
    wgt = wgt @ p["fc2_weight"]["kernel"] + p["fc2_weight"]["bias"] + 1e-6

    dist = dist.reshape(n, np_)
    wgt = wgt.reshape(n, np_)
    per_image = jnp.sum(dist * wgt, axis=1) / jnp.sum(wgt, axis=1)
    return jnp.mean(per_image)
