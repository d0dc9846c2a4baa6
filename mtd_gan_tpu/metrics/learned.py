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
