"""Engine loop integration tests: train/validate/run_test on tiny models +
synthetic data, exercising family dispatch, artifacts, and metrics CSV."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.engine.loops import (build_trainer, family_of, run_test,
                                      train_one_epoch, validate)
from mtd_gan_tpu.data.transforms import make_eval_preprocess, make_train_preprocess
from mtd_gan_tpu.models.red_cnn import REDCNNModel
from mtd_gan_tpu.models.mtd_gan import MTDGANModel


class _Args:
    optimizer = "adamw"
    lr = 1e-3
    method = "pcgrad"


def _hu_batch(np_rng, n=2, size=128):
    yy, xx = np.mgrid[:size, :size]
    disk = ((yy - size // 2) ** 2 + (xx - size // 2) ** 2) < (size // 3) ** 2
    hu = np.full((n, size, size, 1), -1000, np.int16)
    hu[:, disk, :] = 40
    noisy = hu + np_rng.integers(-30, 30, hu.shape).astype(np.int16)
    return noisy, hu


def test_family_dispatch():
    assert family_of("RED_CNN") == "cnn"
    assert family_of("CTformer") == "tr"
    assert family_of("MTD_GAN_Method") == "mtd"
    assert family_of("Ablation_CLS") == "mtd"
    assert family_of("DDPM") == "dn"
    assert family_of("DU_GAN") == "dugan"


def test_train_validate_cnn(rng, np_rng, tmp_path):
    model = REDCNNModel(out_ch=8)
    trainer = build_trainer("RED_CNN", model, _Args())
    state = trainer.create_state(rng)

    pre = make_train_preprocess("window_patch", "mayo", num_samples=2)
    hu_x, hu_y = _hu_batch(np_rng)
    loader = [(hu_x, hu_y)] * 2
    state, stats, rng = train_one_epoch(trainer, state, loader, pre, rng, 0)
    assert np.isfinite(stats["loss"])

    eval_pre = make_eval_preprocess("window", "mayo")
    vstats = validate(model, state, [(hu_x, hu_y)], eval_pre, "cnn", 0,
                      save_dir=str(tmp_path))
    assert np.isfinite(vstats["loss"])
    assert os.path.exists(tmp_path / "epoch_0_pred.png")


def test_run_test_writes_artifacts(rng, np_rng, tmp_path):
    model = REDCNNModel(out_ch=8)
    trainer = build_trainer("RED_CNN", model, _Args())
    state = trainer.create_state(rng)
    eval_pre = make_eval_preprocess("window", "mayo")
    hu_x, hu_y = _hu_batch(np_rng, n=1)
    loader = [(hu_x, hu_y, ["/fake/path/slice1.IMA"]),
              (hu_x, hu_y, ["/fake/path/slice2.IMA"])]
    summary = run_test(model, state, loader, eval_pre, "cnn",
                       save_dir=str(tmp_path), compute_fid_metric=False,
                       compute_feature_metrics=False)
    assert summary["gt_psnr"] == pytest.approx(100.0, abs=1e-3)
    assert summary["gt_ssim"] == pytest.approx(1.0, abs=1e-5)
    assert os.path.exists(tmp_path / "pred_results.csv")
    assert os.path.exists(tmp_path / "png" / "slice1.IMA.png")
    with open(tmp_path / "test_summary.json") as f:
        assert "pred_psnr" in json.load(f)


def test_mtd_family_trainer_dispatch(rng, np_rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = build_trainer("MTD_GAN_Method", model, _Args())
    from mtd_gan_tpu.engine.gan import MTDGANTrainer

    assert isinstance(trainer, MTDGANTrainer)
    # no method -> MTDGANTrainer with plain summed backward
    class _NoMethod(_Args):
        method = ""

    trainer2 = build_trainer("MTD_GAN_Method", model, _NoMethod())
    assert isinstance(trainer2, MTDGANTrainer) and trainer2.method is None

    # ablations (scalar d_loss) -> adversarial trainer, 1 critic step
    from mtd_gan_tpu.engine.wgan import AdversarialTrainer
    from mtd_gan_tpu.models.ablations import ABLATIONS

    abl = ABLATIONS["Ablation_CLS"](gen_features=4, disc_features=4,
                                    num_layers=1)
    trainer3 = build_trainer("Ablation_CLS", abl, _Args())
    assert isinstance(trainer3, AdversarialTrainer) and trainer3.n_critic == 1


def test_tr_family_sliding_window_eval(rng, np_rng, tmp_path):
    """CTformer eval reconstructs full slices via the on-device tiler
    (reference engine.py:345: roi 64, overlap 0.3)."""
    from mtd_gan_tpu.models.ctformer import CTformerModel

    model = CTformerModel()  # 64x64 contract, tiny depth already
    trainer = build_trainer("CTformer", model, _Args())
    state = trainer.create_state(rng)
    eval_pre = make_eval_preprocess("window", "mayo")
    hu_x, hu_y = _hu_batch(np_rng, n=1)
    vstats = validate(model, state, [(hu_x, hu_y)], eval_pre, "tr", 0,
                      save_dir=str(tmp_path), tr_sw_batch=8)
    assert np.isfinite(vstats["loss"])
    assert os.path.exists(tmp_path / "epoch_0_pred.png")


def test_run_test_with_feature_metrics(rng, np_rng, tmp_path):
    """PL/TML/FID columns in the sweep (256px so TML's deepest VGG slice
    still fits a 16x16 patch grid)."""
    model = REDCNNModel(out_ch=8)
    trainer = build_trainer("RED_CNN", model, _Args())
    state = trainer.create_state(rng)
    eval_pre = make_eval_preprocess("window", "mayo")
    hu_x, hu_y = _hu_batch(np_rng, n=1, size=256)
    loader = [(hu_x, hu_y, ["/fake/a.IMA"]), (hu_x, hu_y, ["/fake/b.IMA"])]
    summary = run_test(model, state, loader, eval_pre, "cnn",
                       save_dir=str(tmp_path), compute_fid_metric=True,
                       compute_feature_metrics=True)
    assert summary["gt_pl"] == 0.0 and summary["gt_tml"] == 0.0
    assert summary["gt_fid"] < 1e-6
    for k in ("pred_pl", "pred_tml", "pred_fid", "input_pl"):
        assert np.isfinite(summary[k]), k


def test_dn_predictor_fresh_noise_per_slice(rng):
    """Regression: the diffusion test sweep must draw FRESH noise per slice
    (reference engine.py:860-866 calls torch.randn anew per forward); one
    captured key would give every slice an identical trajectory and bias
    corpus-level FID."""
    from mtd_gan_tpu.engine.loops import _predictor_for

    class _FakeDN:
        def sample(self, params, r, z):
            return jax.random.normal(r, z.shape)

    class _FakeState:
        params = {}

    predictor = _predictor_for(_FakeDN(), _FakeState(), "dn", rng)
    z = jnp.zeros((1, 8, 8, 1))
    a, b = predictor(z), predictor(z)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_family_of_resolves_aliases():
    """Regression: aliased names must dispatch to the right trainer family
    (previously 'MTD_GAN' fell through to the supervised family and crashed)."""
    assert family_of("MTD_GAN") == "mtd"
    assert family_of("ED_CNN") == "cnn"
    assert family_of("MAP_NN_brain") == "wgan"
    assert family_of("DU_GAN_brain") == "dugan"


def test_run_test_grouped_matches_per_slice(rng, np_rng, tmp_path):
    """The eval_batch>1 sweep (grouped forward, padded tail) must produce
    the SAME per-slice csv rows as the per-slice sweep — grouping is an
    internal throughput lever, not a semantics change."""
    import csv

    model = REDCNNModel(out_ch=8)
    trainer = build_trainer("RED_CNN", model, _Args())
    state = trainer.create_state(rng)
    eval_pre = make_eval_preprocess("window", "mayo")

    def loader():
        for i in range(5):  # 5 % 3 != 0 -> exercises the padded tail
            hu_x, hu_y = _hu_batch(np_rng2, n=1)
            yield (hu_x, hu_y, [f"/fake/s{i}.IMA"])

    rows = {}
    for eb, sub in ((1, "a"), (3, "b")):
        np_rng2 = np.random.default_rng(7)
        run_test(model, state, loader(), eval_pre, "cnn",
                 save_dir=str(tmp_path / sub), compute_fid_metric=False,
                 compute_feature_metrics=False, eval_batch=eb)
        with open(tmp_path / sub / "pred_results.csv") as f:
            rows[sub] = list(csv.DictReader(f))

    assert len(rows["a"]) == len(rows["b"]) == 5
    for ra, rb in zip(rows["a"], rows["b"]):
        assert ra["filename"] == rb["filename"]
        for k in ra:
            if k != "filename":
                assert float(ra[k]) == pytest.approx(float(rb[k]),
                                                     rel=1e-5, abs=1e-6), k
    # no padded extras leaked into artifacts
    assert len(os.listdir(tmp_path / "b" / "png")) == 5


def test_run_test_dn_grouped_matches_per_slice(rng, np_rng, tmp_path):
    """Round 5: the diffusion family joins the grouped sweep — eval_batch>1
    must produce the SAME per-slice csv rows as the batch-1 sweep (per-slice
    fold_in keys ride the slice's global sweep position, so trajectories
    are identical; reference engine.py:860-866 semantics preserved)."""
    import csv

    from mtd_gan_tpu.models.diffusion import DDIMModel

    model = DDIMModel(channels=(8, 16, 16), num_head_channels=16,
                      norm_groups=4)
    model.n_inference_steps = 3

    class _DNState:
        params = model.init(jax.random.PRNGKey(0), (1, 64, 64, 1))

    eval_pre = make_eval_preprocess("window", "mayo")

    def loader():
        for i in range(5):  # 5 % 3 != 0 -> padded tail
            hu_x, hu_y = _hu_batch(np_rng2, n=1, size=64)
            yield (hu_x, hu_y, [f"/fake/s{i}.IMA"])

    rows = {}
    for eb, sub in ((1, "a"), (3, "b")):
        np_rng2 = np.random.default_rng(7)
        run_test(model, _DNState(), loader(), eval_pre, "dn",
                 save_dir=str(tmp_path / sub), compute_fid_metric=False,
                 compute_feature_metrics=False, eval_batch=eb,
                 rng=jax.random.PRNGKey(11))
        with open(tmp_path / sub / "pred_results.csv") as f:
            rows[sub] = list(csv.DictReader(f))

    assert len(rows["a"]) == len(rows["b"]) == 5
    for ra, rb in zip(rows["a"], rows["b"]):
        assert ra["filename"] == rb["filename"]
        for k in ra:
            if k != "filename":
                assert float(ra[k]) == pytest.approx(float(rb[k]),
                                                     rel=1e-5, abs=1e-6), k
