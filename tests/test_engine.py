"""Engine tests: jitted train steps run, losses move, DP sharding works on
the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.engine import MTDGANTrainer, SupervisedTrainer
from mtd_gan_tpu.models.mtd_gan import MTDGANModel
from mtd_gan_tpu.models.red_cnn import REDCNNModel
from mtd_gan_tpu.parallel.mesh import make_mesh, shard_batch
from mtd_gan_tpu import optim as optim_lib


def _toy_batch(rng, n=2):
    x = jax.random.uniform(rng, (n, 64, 64, 1))
    y = jnp.clip(x + 0.02, 0.0, 1.0)
    return x, y


def test_supervised_trainer_learns(rng):
    model = REDCNNModel(out_ch=8)
    trainer = SupervisedTrainer(model, lr=1e-3)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng)
    first = None
    for _ in range(5):
        state, metrics = trainer.train_step(state, x, y)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_mtd_gan_trainer_pcgrad_step(rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="pcgrad", lr=1e-4)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=1)
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(state.step) == 1
    # second step exercises donated buffers
    state, metrics = trainer.train_step(state, x, y)
    assert int(state.step) == 2


def test_mtd_gan_trainer_no_method(rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method=None)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=1)
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["d_loss"]))


def test_mtd_gan_trainer_uw_updates_logsigma(rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="uw")
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=1)
    state, _ = trainer.train_step(state, x, y)
    assert not np.allclose(np.asarray(state.mto_state.logsigma), 0.0)


def test_supervised_dp_mesh(rng):
    mesh = make_mesh(8)
    model = REDCNNModel(out_ch=8)
    trainer = SupervisedTrainer(model, lr=1e-3, mesh=mesh)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=8)
    x, y = shard_batch(mesh, (x, y))
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
    # params replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scheduler_parity():
    # poly: warmup 10, decay from epoch 50, total 500, min factor 1e-5
    sched = optim_lib.get_scheduler("poly_lr", base_lr=1e-4, epochs=500)
    assert sched(0) == 0.0
    assert abs(sched(5) - 0.5e-4) < 1e-12
    assert abs(sched(10) - 1e-4) < 1e-12  # factor 1.0 right after warmup
    assert abs(sched(50) - 1e-4) < 1e-12  # decay starts at epochs/10
    assert abs(sched(275) - 1e-4 * 0.5) < 1e-9  # halfway through decay
    cs = optim_lib.get_scheduler("cosine_annealing_warm_restart", 1e-6, 500)
    assert abs(cs(10) - 1e-3) < 1e-9  # peak after T_up
    assert cs(100) == cs(0)  # restart
    assert abs(cs(110) - 0.6e-3) < 1e-7  # gamma-decayed peak in cycle 2


def test_mtd_gan_dp_mesh(rng):
    mesh = make_mesh(4)
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="pcgrad", mesh=mesh)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=4)
    x, y = shard_batch(mesh, (x, y))
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["d_loss"]))
    leaf = jax.tree_util.tree_leaves(state.params_g)[0]
    assert len(leaf.sharding.device_set) == 4


@pytest.mark.parametrize("method", ["cagrad", "mgda", "nashmtl", "imtl", "dwa"])
def test_mtd_gan_trainer_all_solver_methods(rng, method):
    """One real train step through each Gram-matrix-solver MTO method."""
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method=method, lr=1e-4)
    state = trainer.create_state(rng)
    x, y = _toy_batch(rng, n=1)
    state, metrics = trainer.train_step(state, x, y)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_surgery_frozen_params_not_decayed(rng):
    """Regression: params outside the surgery gradient set (c_fc under
    pcgrad) must not move at all — the reference optimizer skips them
    (no weight decay either)."""
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    trainer = MTDGANTrainer(model, method="pcgrad", lr=1e-2)
    state = trainer.create_state(rng)
    before = np.asarray(state.params_d["c_fc"]["kernel"])
    x, y = _toy_batch(rng, n=1)
    for _ in range(2):
        state, _ = trainer.train_step(state, x, y)
    np.testing.assert_array_equal(
        before, np.asarray(state.params_d["c_fc"]["kernel"]))
    # shared params did move (fresh key: the fixture rng buffer was donated
    # into the train state)
    fresh = trainer.model.init(jax.random.PRNGKey(0))
    assert not np.allclose(
        np.asarray(state.params_d["conv11"]["kernel"]),
        np.asarray(fresh.params_d["conv11"]["kernel"]))


def test_mtd_gan_bf16_compute_mode(rng):
    """bf16 compute / fp32 master params (train.py --bf16): params and grads
    stay fp32, losses are computed fp32 and track the fp32 model loosely."""
    kw = dict(gen_features=4, disc_features=4, num_layers=1)
    m32 = MTDGANModel(**kw)
    m16 = MTDGANModel(dtype=jnp.bfloat16, **kw)
    x, y = _toy_batch(rng, n=2)

    t32 = MTDGANTrainer(m32, method="pcgrad", lr=1e-4)
    t16 = MTDGANTrainer(m16, method="pcgrad", lr=1e-4)
    s32 = t32.create_state(rng)
    s16 = t16.create_state(rng)
    # identical master params (init is fp32 in both)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s32.params_d, s16.params_d)

    for i in range(3):
        s32, mt32 = t32.train_step(s32, x, y)
        s16, mt16 = t16.train_step(s16, x, y)
    # master params remain fp32 after bf16-compute steps
    for leaf in jax.tree_util.tree_leaves(s16.params_g):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(s16.params_d):
        assert leaf.dtype == jnp.float32
    # losses are fp32 scalars and track the fp32 trajectory loosely
    assert mt16["g_loss"].dtype == jnp.float32
    for k in ("d_loss", "g_loss"):
        a, b = float(mt32[k]), float(mt16[k])
        assert np.isfinite(b)
        assert abs(a - b) / (abs(a) + 1e-6) < 0.05, (k, a, b)


def test_hoisted_step_matches_two_forward(rng):
    """The single-G-forward fast path (hoist=auto: fake computed once, its
    vjp reused for the G update) walks the same trajectory as the classic
    two-forward step — the chain rule through `fake` is the same math."""
    kw = dict(gen_features=4, disc_features=4, num_layers=1)
    th = MTDGANTrainer(MTDGANModel(**kw), method="pcgrad", lr=1e-4)
    tc = MTDGANTrainer(MTDGANModel(**kw), method="pcgrad", lr=1e-4,
                       hoist=False)
    sh = th.create_state(rng)
    sc = tc.create_state(rng)
    x, y = _toy_batch(rng, n=2)
    for _ in range(3):
        sh, mh = th.train_step(sh, x, y)
        sc, mc = tc.train_step(sc, x, y)
    for k in ("d_loss", "g_loss"):
        np.testing.assert_allclose(
            float(mh[k]), float(mc[k]), rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        sh.params_g, sc.params_g)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        sh.params_d, sc.params_d)


@pytest.mark.parametrize("policy", ["save_spectral_full", "save_all_named"])
def test_named_remat_policies_match_default_remat(rng, policy):
    """The named-saving remat policies (zero spectral / zero total forward
    recompute in the G backward) are pure memory/speed policies — the
    trajectory must be identical to the default full-remat step."""
    kw = dict(gen_features=4, disc_features=4, num_layers=1)
    ta = MTDGANTrainer(MTDGANModel(**kw), method="pcgrad", lr=1e-4,
                       g_remat=policy)
    tb = MTDGANTrainer(MTDGANModel(**kw), method="pcgrad", lr=1e-4)
    sa = ta.create_state(rng)
    sb = tb.create_state(rng)
    x, y = _toy_batch(rng, n=2)
    for _ in range(2):
        sa, ma = ta.train_step(sa, x, y)
        sb, mb = tb.train_step(sb, x, y)
    for k in ("d_loss", "g_loss"):
        np.testing.assert_allclose(
            float(ma[k]), float(mb[k]), rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        sa.params_g, sb.params_g)


def test_pallas_packed_training_forward_matches_einsum(rng):
    """g_forward="pallas_packed": the hoisted step's primal G forward runs
    the pack=2 Pallas pipeline behind a custom_vjp (backward = einsum graph,
    VERDICT r3 item 1). One step must track the einsum-forward step: same
    losses to bf16-forward tolerance, grads identical by construction."""
    from mtd_gan_tpu.engine.gan import MTDGANTrainer
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    x = jax.random.uniform(jax.random.PRNGKey(7), (4, 64, 64, 1))
    y = jnp.clip(x + 0.05, 0, 1)

    def run(g_forward):
        model = MTDGANModel(gen_features=8, disc_features=8, num_layers=2,
                            remat=False)
        tr = MTDGANTrainer(model, method="pcgrad", g_remat=False,
                           g_forward=g_forward)
        state = tr.create_state(rng)
        state, m = tr.train_step(state, x, y)
        return m

    m_ref = run("einsum")
    m_pal = run("pallas_packed")
    np.testing.assert_allclose(float(m_pal["d_loss"]), float(m_ref["d_loss"]),
                               rtol=5e-3)
    np.testing.assert_allclose(float(m_pal["g_loss"]), float(m_ref["g_loss"]),
                               rtol=5e-3)
