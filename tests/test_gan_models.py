"""GAN baseline family tests: EDCNN / WGAN-VGG / MAP-NN / DU-GAN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.engine import AdversarialTrainer, DUGANTrainer, SupervisedTrainer
from mtd_gan_tpu.models.dugan import DUGANModel, REDCNNGenerator, cutmix_mask
from mtd_gan_tpu.models.edcnn import EDCNNModel, edcnn_sobel_bank
from mtd_gan_tpu.models.map_nn import CPCE2D, MAPNNModel
from mtd_gan_tpu.models.wgan_vgg import WGANVGGModel, wgan_gradient_penalty


def _batch(rng, n=1):
    x = jax.random.uniform(rng, (n, 64, 64, 1))
    return x, jnp.clip(x + 0.02, 0.0, 1.0)


def test_edcnn_sobel_bank_matches_reference_pattern():
    bank = edcnn_sobel_bank(3, 8, 1)  # HWIO
    w = bank.transpose(3, 2, 0, 1)  # OIHW for readable checks
    np.testing.assert_array_equal(w[0, 0], [[-1, -2, -1], [0, 0, 0], [1, 2, 1]])
    np.testing.assert_array_equal(w[1, 0], [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    np.testing.assert_array_equal(w[2, 0], [[-2, -1, 0], [-1, 0, 1], [0, 1, 2]])
    np.testing.assert_array_equal(w[3, 0], [[0, 1, 2], [-1, 0, 1], [-2, -1, 0]])
    np.testing.assert_array_equal(w[4], w[0])  # cycle


def test_edcnn_forward_and_loss(rng):
    model = EDCNNModel(out_ch=8, sobel_ch=8, use_feature_loss=False)
    params = model.init(rng)
    x, y = _batch(rng, 2)
    out = model.apply(params, x)
    assert out.shape == x.shape
    # the output activation is LeakyReLU (reference EDCNN `self.relu`,
    # arch/EDCNN/networks.py:124,159): negatives leak at slope 0.01
    # instead of clamping, so they stay small but nonzero
    assert bool(jnp.all(jnp.isfinite(out)))
    assert bool(jnp.all(out > -0.5))
    loss, _ = model.loss(params, x, y)
    assert np.isfinite(float(loss))


def test_wgan_gp_on_linear_disc(rng):
    """For D(x) = sum(x), grad wrt x is all-ones; ||grad||_2 = 64 per 4x4x4
    sample -> penalty = 10*(8-1)^2 with 64 elements => analytic check."""
    real = jnp.zeros((2, 4, 4, 4))
    fake = jnp.ones((2, 4, 4, 4))
    gp = wgan_gradient_penalty(lambda z: jnp.sum(z, axis=(1, 2, 3)), rng, real, fake)
    np.testing.assert_allclose(float(gp), 10 * (np.sqrt(64) - 1) ** 2, rtol=1e-5)


def test_wgan_vgg_losses(rng):
    model = WGANVGGModel(use_perceptual=False)  # skip VGG for speed
    gv = model.init(rng)
    x, y = _batch(rng)
    d, (sp, det) = model.d_loss(gv.params_d, gv.params_g, gv.state_d, rng, x, y)
    assert np.isfinite(float(d))
    assert "D/gp_loss" in det
    g, _ = model.g_loss(gv.params_g, gv.params_d, gv.state_d, rng, x, y)
    assert np.isfinite(float(g))


def test_wgan_trainer_runs_4_critic_steps(rng):
    model = WGANVGGModel(use_perceptual=False)
    trainer = AdversarialTrainer(model, lr=1e-4)
    assert trainer.n_critic == 4
    state = trainer.create_state(rng)
    x, y = _batch(rng)
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_cpce_clamps_and_shapes(rng):
    net = CPCE2D(features=8)
    x = jax.random.uniform(rng, (1, 64, 64, 1)) * 2  # >1 to exercise clamp
    params = jax.jit(net.init)(rng, x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == x.shape
    assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0


def test_map_nn_weight_tied_depth(rng):
    model = MAPNNModel(depth=5)
    gv = model.init(rng)
    # weight tying: a single CPCE_2D param subtree
    assert set(gv.params_g.keys()) == {"CPCE_2D"}
    x, y = _batch(rng)
    g, (_, det) = model.g_loss(gv.params_g, gv.params_d, gv.state_d, rng, x, y)
    assert np.isfinite(float(g)) and "G/edge_loss" in det


def test_dugan_redcnn_generator_residuals(rng):
    gen = REDCNNGenerator(features=4, num_layers=2)
    x = jax.random.uniform(rng, (1, 32, 32, 1))
    params = jax.jit(gen.init)(rng, x)["params"]
    out = gen.apply({"params": params}, x)
    assert out.shape == x.shape


def test_cutmix_mask_properties(rng):
    mask = cutmix_mask(rng, (2, 64, 64, 1))
    vals = np.unique(np.asarray(mask))
    assert set(vals.tolist()) <= {0.0, 1.0}
    # all batch entries share the same mask (reference: one mask per call)
    np.testing.assert_array_equal(np.asarray(mask[0]), np.asarray(mask[1]))


def test_dugan_trainer_step(rng):
    model = DUGANModel(gen_features=4, num_layers=2, conv_dim=8)
    trainer = DUGANTrainer(model, lr=1e-4)
    state = trainer.create_state(rng)
    x, y = _batch(rng)
    state, metrics = trainer.train_step(state, x, y)
    for k in ["d_img_loss", "d_grad_loss", "g_loss"]:
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1


def test_wgan_hoisted_step_matches_two_forward(rng):
    """The single-G-forward step (fake hoisted out of the critic scan, vjp
    reused for the G update) walks the same trajectory as the classic
    per-loss forwards — params_g is constant across the critic updates."""
    mh = WGANVGGModel(use_perceptual=False)
    mc = WGANVGGModel(use_perceptual=False)
    th = AdversarialTrainer(mh, lr=1e-4)
    tc = AdversarialTrainer(mc, lr=1e-4, hoist=False)
    sh = th.create_state(rng)
    sc = tc.create_state(rng)
    x, y = _batch(rng)
    for _ in range(2):
        sh, mth = th.train_step(sh, x, y)
        sc, mtc = tc.train_step(sc, x, y)
    for k in ("d_loss", "g_loss"):
        np.testing.assert_allclose(float(mth[k]), float(mtc[k]),
                                   rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        (sh.params_g, sh.params_d), (sc.params_g, sc.params_d))


def test_dugan_hoisted_step_matches_two_forward(rng):
    """Same trajectory-equality pin for DU-GAN's three-optimizer step."""
    kw = dict(gen_features=4, num_layers=2, conv_dim=8)
    th = DUGANTrainer(DUGANModel(**kw), lr=1e-4)
    tc = DUGANTrainer(DUGANModel(**kw), lr=1e-4, hoist=False)
    sh = th.create_state(rng)
    sc = tc.create_state(rng)
    x, y = _batch(rng)
    for _ in range(2):
        sh, mth = th.train_step(sh, x, y)
        sc, mtc = tc.train_step(sc, x, y)
    for k in ("d_img_loss", "d_grad_loss", "g_loss"):
        np.testing.assert_allclose(float(mth[k]), float(mtc[k]),
                                   rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        (sh.params_g, sh.params_img_d, sh.params_grad_d),
        (sc.params_g, sc.params_img_d, sc.params_grad_d))
