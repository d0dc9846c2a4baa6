"""Pretrained-weight parity tests — run ONLY when the real torchvision
weight files are present (no network egress in this image; see WEIGHTS.md
for SHA-pinned download instructions).

With weights present, PL/TML computed by our jax pipeline are asserted
against the ACTUAL reference implementation (/root/reference/metrics.py
compute_PL/compute_TML) running on the same weights — machine-checked
metric parity, not fabricated state dicts."""

from __future__ import annotations

import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


def _find_vgg19():
    from mtd_gan_tpu.features.registry import _find_weight_file

    return _find_weight_file("vgg19-")


def _torch_vgg19_features_from_sd(sd):
    """torchvision-layout vgg19 `.features` Sequential loaded from a local
    state dict (torchvision itself is absent from the image)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=False))
            in_ch = v
    seq = torch.nn.Sequential(*layers)
    feat_sd = {k[len("features."):]: v for k, v in sd.items()
               if k.startswith("features.")}
    seq.load_state_dict(feat_sd)
    return seq.eval()


@pytest.mark.skipif(_find_vgg19() is None,
                    reason="vgg19-*.pth not present (see WEIGHTS.md)")
def test_pl_tml_reference_parity_with_real_weights(rng):
    from mtd_gan_tpu.features import vgg as vgg_lib
    from mtd_gan_tpu.metrics.perceptual import (perceptual_loss,
                                                texture_matching_loss)

    sd = torch.load(_find_vgg19(), map_location="cpu", weights_only=True)
    seq = _torch_vgg19_features_from_sd(sd)

    # reference metrics.py imports torchvision + piq at module scope
    from tests.ref_oracle import install_reference_stubs

    install_reference_stubs()
    metrics_ref = importlib.import_module("metrics")
    metrics_ref.models.vgg19 = lambda pretrained=True: types.SimpleNamespace(
        features=seq)

    rx, ry = jax.random.split(rng)
    x = jax.random.uniform(rx, (1, 64, 64, 1), jnp.float32)
    y = jnp.clip(x + 0.05 * jax.random.normal(ry, x.shape), 0.0, 1.0)
    pred = jnp.clip(x + 0.02, 0.0, 1.0)

    def t(a):
        return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2)).float()

    with torch.no_grad():
        pl_want = [float(v) for v in
                   metrics_ref.compute_PL(t(x), t(y), t(pred), device="cpu")]
        tml_want = [float(v) for v in
                    metrics_ref.compute_TML(t(x), t(y), t(pred), device="cpu")]

    params = vgg_lib.import_torch_vgg19(
        {k: v.numpy() for k, v in sd.items()})

    def feature_fn(a):
        a3 = jnp.repeat(a, 3, axis=-1)
        return vgg_lib.vgg19_features(params, a3)

    pl_ours = [float(perceptual_loss(x, y, feature_fn)),
               float(perceptual_loss(y, y, feature_fn)),
               float(perceptual_loss(pred, y, feature_fn))]
    tml_ours = [float(texture_matching_loss(x, y, feature_fn)),
                float(texture_matching_loss(y, y, feature_fn)),
                float(texture_matching_loss(pred, y, feature_fn))]
    np.testing.assert_allclose(pl_ours, pl_want, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(tml_ours, tml_want, rtol=2e-3, atol=1e-4)


def _find_pieapp():
    from mtd_gan_tpu.features.registry import _find_weight_file

    return _find_weight_file("PieAPP")


@pytest.mark.skipif(_find_pieapp() is None,
                    reason="PieAPPv0.1.pth not present (see WEIGHTS.md)")
def test_pieapp_real_weight_values(rng):
    """With PieAPPv0.1.pth present, our score matches the reference piq
    PieAPP class end-to-end (reference module/piq/pieapp.py:101-206)."""
    from tests.ref_oracle import install_reference_stubs

    from mtd_gan_tpu.metrics.learned import import_torch_pieapp, pieapp

    install_reference_stubs()
    pieapp_mod = importlib.import_module("module.piq.pieapp")
    sd = torch.load(_find_pieapp(), map_location="cpu")
    sd["ref_score_subtract.weight"] = sd["ref_score_subtract.weight"].squeeze()
    params = import_torch_pieapp(sd)

    x = jax.random.uniform(rng, (2, 96, 96, 1), jnp.float32, 0.1, 0.9)
    y = jnp.clip(x + 0.05 * jax.random.normal(jax.random.PRNGKey(3), x.shape),
                 0, 1)
    ours = float(pieapp(x, y, params))

    model = pieapp_mod.PieAPPModel().eval()
    fixed = dict(sd)
    fixed["ref_score_subtract.weight"] = \
        fixed["ref_score_subtract.weight"].unsqueeze(1)
    model.load_state_dict(fixed)
    crop = importlib.import_module("module.piq.functional").crop_patches
    with torch.no_grad():
        def t(z):
            return torch.from_numpy(
                np.asarray(z).transpose(0, 3, 1, 2)).repeat(1, 3, 1, 1) * 255
        fp, wp = model(crop(t(x), size=64, stride=27))
        ft, wt = model(crop(t(y), size=64, stride=27))
        d, w = model.compute_difference(ft - fp, wt - wp)
        d, w = d.reshape(2, -1), w.reshape(2, -1)
        want = float(torch.stack(
            [(dd * ww).sum() / ww.sum() for dd, ww in zip(d, w)]).mean())
    assert abs(ours - want) / (abs(want) + 1e-6) < 1e-3
