"""Model zoo registry (reference models.py:19-80).

Also repairs reference quirk #3 (SURVEY.md §5): 'MTD_GAN' and 'ED_CNN' are
accepted aliases (the reference CLI dispatches on them but its factory only
knows 'MTD_GAN_Method'/'EDCNN', crashing)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


ALIASES = {
    "MTD_GAN": "MTD_GAN_Method",
    "ED_CNN": "EDCNN",
    "MAP_NN_brain": "MAP_NN",
    "DU_GAN_brain": "DU_GAN",
}


def resolve_alias(name: str) -> str:
    return ALIASES.get(name, name)


def get_model_class(name: str):
    """The registered model class for a reference-compatible name (for
    constructor signature inspection, e.g. the --bf16 dtype probe)."""
    name = resolve_alias(name)
    _ensure_registered()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def get_model(name: str, **kwargs):
    """Build a model by reference-compatible name."""
    return get_model_class(name)(**kwargs)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


_REGISTERED = False


def _ensure_registered():
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True

    from mtd_gan_tpu.models.red_cnn import REDCNNModel
    from mtd_gan_tpu.models.edcnn import EDCNNModel
    from mtd_gan_tpu.models.wgan_vgg import WGANVGGModel
    from mtd_gan_tpu.models.map_nn import MAPNNModel
    from mtd_gan_tpu.models.dugan import DUGANModel
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    _REGISTRY["RED_CNN"] = REDCNNModel
    _REGISTRY["EDCNN"] = EDCNNModel
    _REGISTRY["WGAN_VGG"] = WGANVGGModel
    _REGISTRY["MAP_NN"] = MAPNNModel
    _REGISTRY["DU_GAN"] = DUGANModel
    _REGISTRY["MTD_GAN_Method"] = MTDGANModel

    # transformer family
    try:
        from mtd_gan_tpu.models.ctformer import CTformerModel
        from mtd_gan_tpu.models.restormer import RestormerModel

        _REGISTRY["CTformer"] = CTformerModel
        _REGISTRY["Restormer"] = RestormerModel
    except ImportError:
        pass

    # diffusion family
    try:
        from mtd_gan_tpu.models.diffusion import (
            DDIMModel, DDPMModel, DPMModel, PNDMModel,
        )

        _REGISTRY["DDPM"] = DDPMModel
        _REGISTRY["DDIM"] = DDIMModel
        _REGISTRY["PNDM"] = PNDMModel
        _REGISTRY["DPM"] = DPMModel
    except ImportError:
        pass

    # ablation family
    try:
        from mtd_gan_tpu.models import ablations

        for abl_name, ctor in ablations.ABLATIONS.items():
            _REGISTRY[abl_name] = ctor
    except ImportError:
        pass
