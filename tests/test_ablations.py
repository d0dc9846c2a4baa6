"""Ablation family + model registry tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.models import get_model
from mtd_gan_tpu.models.ablations import ABLATIONS, AblationModel


def _batch(rng, n=1):
    x = jax.random.uniform(rng, (n, 64, 64, 1))
    return x, jnp.clip(x + 0.02, 0.0, 1.0)


SMALL = dict(gen_features=4, disc_features=4, num_layers=1)


@pytest.mark.parametrize("name,heads,n_outputs", [
    ("Ablation_CLS", ("cls",), 1),
    ("Ablation_SEG", ("seg",), 1),
    ("Ablation_CLS_SEG", ("cls", "seg"), 2),
    ("Ablation_SEG_REC", ("seg", "rec"), 2),
])
def test_partial_discriminator_outputs(rng, name, heads, n_outputs):
    model = ABLATIONS[name](**SMALL)
    gv = model.init(rng)
    x, y = _batch(rng)
    outs, _ = model._apply_d(gv.params_d, gv.state_d, x, rng, train=False)
    assert len(outs) == n_outputs
    d, (sp, det) = model.d_loss(gv.params_d, gv.params_g, gv.state_d, rng, x, y)
    assert np.isfinite(float(d))
    g, _ = model.g_loss(gv.params_g, gv.params_d, gv.state_d, rng, x, y)
    assert np.isfinite(float(g))


def test_full_ablation_with_nds_rc(rng):
    model = ABLATIONS["Ablation_CLS_SEG_REC_NDS_RC"](**SMALL)
    gv = model.init(rng)
    x, y = _batch(rng)
    d, (_, det) = model.d_loss(gv.params_d, gv.params_g, gv.state_d, rng, x, y)
    assert "D/consist_loss_real_enc" in det and "D/rec_loss_real" in det
    assert np.isfinite(float(d))


def test_resfft_ablation_uses_fft_generator(rng):
    model = ABLATIONS["Ablation_CLS_SEG_REC_NDS_RC_ResFFT"](**SMALL)
    gv = model.init(rng)
    assert any(k.startswith("fft_") for k in gv.params_g.keys())


def test_registry_all_names():
    names = [
        "RED_CNN", "EDCNN", "CTformer", "Restormer", "WGAN_VGG", "MAP_NN",
        "DU_GAN", "MTD_GAN_Method", "DDPM", "DDIM", "PNDM", "DPM",
    ] + list(ABLATIONS)
    from mtd_gan_tpu.models import _ensure_registered, _REGISTRY

    _ensure_registered()
    for n in names:
        assert n in _REGISTRY, n
    # aliases (reference quirk #3 repaired)
    assert type(get_model("MTD_GAN")).__name__ == "MTDGANModel"
    assert type(get_model("ED_CNN", use_feature_loss=False)).__name__ == "EDCNNModel"
