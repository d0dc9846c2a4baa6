"""VGG19 feature trunk in flax (NHWC), with torchvision weight import.

Used by: VGGLoss 5-slice perceptual loss (reference losses.py:17-63, slice
boundaries after ReLUs 2/7/12/21/30 of torchvision vgg19.features), the PL
metric (metrics.py:93-106), the TML Gram-texture metric (metrics.py:156-168),
and WGAN-VGG's single-output extractor (arch/WGAN_VGG/networks.py:54-64,
features[:35] = through relu5_4).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# torchvision vgg19.features layout (cfg 'E'): index -> (type, channels)
# conv indices in the sequential container:
VGG19_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
VGG19_CONV_CH = [64, 64, 128, 128, 256, 256, 256, 256,
                 512, 512, 512, 512, 512, 512, 512, 512]
VGG19_POOL_IDX = {4, 9, 18, 27, 36}
# VGGLoss slice boundaries: outputs taken after these sequential indices
VGG_SLICE_ENDS = (1, 6, 11, 20, 29)  # relu1_1, relu2_1, relu3_1, relu4_1, relu5_1


def init_vgg19_params(rng: Optional[jax.Array] = None) -> Dict[str, Dict[str, Array]]:
    """Deterministic fallback weights (He-normal, seeded)."""
    if rng is None:
        rng = jax.random.PRNGKey(19)
    params = {}
    in_ch = 3
    for idx, out_ch in zip(VGG19_CONV_IDX, VGG19_CONV_CH):
        rng, k = jax.random.split(rng)
        scale = float(np.sqrt(2.0 / (3 * 3 * in_ch)))
        params[f"conv{idx}"] = {
            "kernel": jax.random.normal(k, (3, 3, in_ch, out_ch), jnp.float32) * scale,
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        in_ch = out_ch
    return params


def import_torch_vgg19(state_dict) -> Dict[str, Dict[str, Array]]:
    """Convert torchvision vgg19 state_dict (features.N.weight OIHW) ->
    our NHWC param tree."""
    params = {}
    for idx in VGG19_CONV_IDX:
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # (O, I, kh, kw)
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[f"conv{idx}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(b),
        }
    return params


def _conv(x: Array, p: Dict[str, Array]) -> Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _maxpool(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg19_features(
    params: Dict[str, Dict[str, Array]],
    x: Array,
    ends: Sequence[int] = VGG_SLICE_ENDS,
) -> List[Array]:
    """Run the VGG19 trunk on NHWC 3-channel input; return activations after
    each sequential index in `ends` (inclusive). Single-channel CT slices
    should be repeated to 3 channels by the caller (reference repeats,
    losses.py:59)."""
    outs = []
    max_end = max(ends)
    conv_iter = iter(zip(VGG19_CONV_IDX, VGG19_CONV_CH))
    next_conv = next(conv_iter, (None, None))[0]
    h = x
    for idx in range(max_end + 1):
        if idx == next_conv:
            h = _conv(h, params[f"conv{idx}"])
            next_conv = next(conv_iter, (None,))[0]
        elif idx in VGG19_POOL_IDX:
            h = _maxpool(h)
        else:  # ReLU slot
            h = jax.nn.relu(h)
        if idx in ends:
            outs.append(h)
    return outs


# ---------------------------------------------------------------------------
# VGG16 trunk — used by the LPIPS / DISTS metrics (reference
# module/piq/perceptual.py:118-120, layer table :25-44)
# ---------------------------------------------------------------------------

VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_CONV_CH = [64, 64, 128, 128, 256, 256, 256,
                 512, 512, 512, 512, 512, 512]
VGG16_POOL_IDX = {4, 9, 16, 23, 30}
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (LPIPS/DISTS layer set)
VGG16_LPIPS_ENDS = (3, 8, 15, 22, 29)


def init_vgg16_params(rng: Optional[jax.Array] = None) -> Dict[str, Dict[str, Array]]:
    """Deterministic fallback weights (He-normal, seeded)."""
    if rng is None:
        rng = jax.random.PRNGKey(16)
    params = {}
    in_ch = 3
    for idx, out_ch in zip(VGG16_CONV_IDX, VGG16_CONV_CH):
        rng, k = jax.random.split(rng)
        scale = float(np.sqrt(2.0 / (3 * 3 * in_ch)))
        params[f"conv{idx}"] = {
            "kernel": jax.random.normal(k, (3, 3, in_ch, out_ch), jnp.float32) * scale,
            "bias": jnp.zeros((out_ch,), jnp.float32),
        }
        in_ch = out_ch
    return params


def import_torch_vgg16(state_dict) -> Dict[str, Dict[str, Array]]:
    """Convert torchvision vgg16 state_dict (features.N.weight OIHW) ->
    our NHWC param tree."""
    params = {}
    for idx in VGG16_CONV_IDX:
        w = np.asarray(state_dict[f"features.{idx}.weight"])
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[f"conv{idx}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    return params


def _hann_kernel3() -> jnp.ndarray:
    # piq hann_filter(3): hann_window(5, periodic=False)[1:-1] outer product,
    # normalized (reference module/piq/functional/filters.py:15-24)
    w = np.array([0.5, 1.0, 0.5], np.float32)
    k = w[:, None] * w[None, :]
    return jnp.asarray(k / k.sum())


def _l2pool(x: Array) -> Array:
    """L2 pooling with a 3x3 Hann window, stride 2, padding 1 (DISTS's
    MaxPool replacement; reference module/piq/functional/layers.py:8-33)."""
    c = x.shape[-1]
    k = jnp.broadcast_to(_hann_kernel3()[..., None, None],
                         (3, 3, 1, c)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x * x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    return jnp.sqrt(out + 1e-12)


def vgg16_features(
    params: Dict[str, Dict[str, Array]],
    x: Array,
    ends: Sequence[int] = VGG16_LPIPS_ENDS,
    pool: str = "max",
) -> List[Array]:
    """Run the VGG16 trunk on NHWC 3-channel input; return activations after
    each sequential index in `ends` (inclusive). pool: 'max' (LPIPS) or
    'l2' (DISTS replaces MaxPool with Hann L2Pool)."""
    outs = []
    max_end = max(ends)
    conv_iter = iter(VGG16_CONV_IDX)
    next_conv = next(conv_iter, None)
    h = x
    for idx in range(max_end + 1):
        if idx == next_conv:
            h = _conv(h, params[f"conv{idx}"])
            next_conv = next(conv_iter, None)
        elif idx in VGG16_POOL_IDX:
            h = _l2pool(h) if pool == "l2" else _maxpool(h)
        else:  # ReLU slot
            h = jax.nn.relu(h)
        if idx in ends:
            outs.append(h)
    return outs
