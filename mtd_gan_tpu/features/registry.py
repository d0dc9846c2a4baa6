"""Feature-extractor registry: torch-weight discovery + cached param trees.

Search order for torchvision .pth state dicts:
  $MTD_GAN_TPU_WEIGHTS, $TORCH_HOME/hub/checkpoints, ~/.cache/torch/hub/checkpoints
Recognized filenames: vgg19-*.pth, resnet50-*.pth, pt_inception-*.pth.
Fallback: seeded deterministic random weights (functional, reproducible; not
pretrained — see package docstring)."""

from __future__ import annotations

import glob
import os
from functools import lru_cache
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from mtd_gan_tpu.features import inception as inception_lib
from mtd_gan_tpu.features import vgg as vgg_lib
from mtd_gan_tpu.features import resnet as resnet_lib

Array = jax.Array

_STATUS = {}


def _find_weight_file(prefix: str) -> Optional[str]:
    roots = [
        os.environ.get("MTD_GAN_TPU_WEIGHTS"),
        os.path.join(os.environ.get("TORCH_HOME", ""), "hub", "checkpoints"),
        os.path.expanduser("~/.cache/torch/hub/checkpoints"),
    ]
    for root in roots:
        if not root:
            continue
        hits = sorted(glob.glob(os.path.join(root, f"{prefix}*.pth")))
        if hits:
            return hits[0]
    return None


def _load_torch_state_dict(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


@lru_cache(maxsize=1)
def _vgg19_params():
    path = _find_weight_file("vgg19-")
    if path:
        _STATUS["vgg19"] = f"torchvision weights: {path}"
        return vgg_lib.import_torch_vgg19(_load_torch_state_dict(path))
    _STATUS["vgg19"] = "seeded random fallback (no vgg19-*.pth found)"
    return vgg_lib.init_vgg19_params()


@lru_cache(maxsize=1)
def _resnet50_params():
    path = _find_weight_file("resnet50-")
    if path:
        _STATUS["resnet50"] = f"torchvision weights: {path}"
        return resnet_lib.import_torch_resnet50(_load_torch_state_dict(path))
    _STATUS["resnet50"] = "seeded random fallback (no resnet50-*.pth found)"
    return resnet_lib.init_resnet50_params()


@lru_cache(maxsize=1)
def _inception_params():
    path = _find_weight_file("pt_inception-")
    if path:
        _STATUS["inception"] = f"pt_inception weights: {path}"
        return inception_lib.import_torch_inception(_load_torch_state_dict(path))
    _STATUS["inception"] = "seeded random fallback (no pt_inception-*.pth found)"
    return inception_lib.init_inception_params()


def get_inception_feature_fn() -> Callable[[Array], Array]:
    """[0,1] gray/RGB NHWC -> (B, 2048) FID pool3 features."""
    params = _inception_params()
    return jax.jit(lambda x: inception_lib.inception_pool3_features(params, x))


def feature_weights_status() -> dict:
    return dict(_STATUS)


def get_vgg_slices_fn(ends=vgg_lib.VGG_SLICE_ENDS) -> Callable[[Array], List[Array]]:
    """Gray NHWC [B,H,W,1] -> list of VGG19 feature maps (input repeated to
    3 channels, reference losses.py:59)."""
    params = _vgg19_params()

    def fn(x: Array) -> List[Array]:
        x3 = jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
        return vgg_lib.vgg19_features(params, x3, ends)

    return fn


def get_resnet_feature_fn() -> Callable[[Array], List[Array]]:
    """Gray NHWC -> ResNet50 block features (EDCNN CompoundLoss)."""
    params = _resnet50_params()

    def fn(x: Array) -> List[Array]:
        x3 = jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
        return resnet_lib.resnet50_block_features(params, x3)

    return fn


def get_perceptual_fn(kind: str = "wgan_vgg") -> Callable[[Array], Array]:
    """Single-output extractors. 'wgan_vgg' = vgg19 features[:35] (through
    relu5_4; reference arch/WGAN_VGG/networks.py:54-64)."""
    if kind != "wgan_vgg":
        raise KeyError(kind)
    params = _vgg19_params()

    def fn(x: Array) -> Array:
        x3 = jnp.repeat(x, 3, axis=-1) if x.shape[-1] == 1 else x
        return vgg_lib.vgg19_features(params, x3, ends=(34,))[0]

    return fn
