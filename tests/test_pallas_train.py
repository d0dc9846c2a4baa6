"""Parity tests for the fused Pallas TRAINING path (ops/pallas_train.py):
block-level custom_vjp — packed forward + fused per-block backward kernel.

Reference targets: the generator fwd/bwd inside /root/reference/engine.py:26-76
for arch/Ours/networks.py:95-164 (interpret mode on CPU; the on-chip numbers
live in PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.models.mtd_gan import MTDGANModel
from mtd_gan_tpu.ops.pallas_train import resfft_generator_train

L, F, H, PW, N = 2, 8, 32, 32, 4


@pytest.fixture(scope="module")
def fp32_setup():
    model = MTDGANModel(gen_features=F, disc_features=8, num_layers=L,
                        dtype=jnp.float32)
    params = jax.jit(model.Generator.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, PW, 1), jnp.float32)
    )["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, H, PW, 1), jnp.float32)
    y = jnp.clip(x + 0.05, 0, 1)
    return model, params, x, y


def test_train_path_primal_matches_einsum(fp32_setup):
    model, params, x, _ = fp32_setup
    oe = jax.jit(
        lambda p: model.Generator.apply({"params": p}, x))(params)
    op = jax.jit(
        lambda p: resfft_generator_train(p, x, num_layers=L,
                                         act_dtype=jnp.float32))(params)
    np.testing.assert_allclose(np.asarray(op, np.float32),
                               np.asarray(oe, np.float32), atol=2e-4)


def test_train_path_grads_match_einsum_fp32(fp32_setup):
    """Every param cotangent of the fused Pallas backward (conv adjoints,
    self-adjoint DFT pairs, in-kernel weight-grad contractions) must match
    jax.grad through the fp32 einsum graph. f32 activations isolate the
    kernel math from boundary-dtype accumulation differences; the bf16x2
    factor packs bound the tolerance."""
    model, params, x, y = fp32_setup

    def loss(gen):
        return lambda p: jnp.mean((gen(p) - y) ** 2)

    ge = jax.jit(jax.grad(loss(
        lambda p: model.Generator.apply({"params": p}, x))))(params)
    gp = jax.jit(jax.grad(loss(
        lambda p: resfft_generator_train(p, x, num_layers=L,
                                         act_dtype=jnp.float32))))(params)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    for kp_, ve in jax.tree_util.tree_leaves_with_path(ge):
        ks = jax.tree_util.keystr(kp_)
        ve = np.asarray(ve, np.float32)
        vp = np.asarray(flat_p[ks], np.float32)
        scale = np.abs(ve).max() + 1e-8
        rel = np.abs(vp - ve).max() / scale
        assert rel < 5e-2, f"{ks}: relerr {rel:.3e} (scale {scale:.3e})"


def test_train_path_bias_grads_accumulate_f32():
    """Under bf16 compute the einsum graph's bias grads are bf16-ACCUMULATED
    reduce sums (they stagnate at power-of-2 values); the Pallas backward
    sums cotangents in f32. Pin that the Pallas bias grad matches the
    fp32-accumulated truth, not the stagnated bf16 sum."""
    model32 = MTDGANModel(gen_features=F, disc_features=8, num_layers=L,
                          dtype=jnp.float32)
    params = jax.jit(model32.Generator.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, PW, 1), jnp.float32)
    )["params"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, H, PW, 1), jnp.float32)
    y = jnp.clip(x + 0.05, 0, 1)
    ge = jax.jit(jax.grad(lambda p: jnp.mean(
        (model32.Generator.apply({"params": p}, x) - y) ** 2)))(params)
    gp = jax.jit(jax.grad(lambda p: jnp.mean(
        (resfft_generator_train(p, x, num_layers=L).astype(jnp.float32)
         - y) ** 2)))(params)
    a = np.asarray(gp["fft_0"]["img_bias"], np.float32)
    b = np.asarray(ge["fft_0"]["img_bias"], np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
    assert rel < 0.2, rel  # bf16 boundaries; fp32-accumulated truth


def test_train_path_single_pass_tables(fp32_setup):
    """precision="bf16" (single-pass factor tables, the r5 budget's
    candidate default) must stay at the same grad-error floor as bf16x2
    vs the fp32 einsum oracle — the on-chip numbers live in PERF.md
    (tools/precision_sweep_train.py); this pins the plumbing."""
    model, params, x, y = fp32_setup

    def loss(gen):
        return lambda p: jnp.mean((gen(p) - y) ** 2)

    ge = jax.jit(jax.grad(loss(
        lambda p: model.Generator.apply({"params": p}, x))))(params)
    gp = jax.jit(jax.grad(loss(
        lambda p: resfft_generator_train(p, x, num_layers=L,
                                         precision="bf16",
                                         act_dtype=jnp.float32))))(params)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp)}
    for kp_, ve in jax.tree_util.tree_leaves_with_path(ge):
        ks = jax.tree_util.keystr(kp_)
        ve = np.asarray(ve, np.float32)
        vp = np.asarray(flat_p[ks], np.float32)
        rel = np.abs(vp - ve).max() / (np.abs(ve).max() + 1e-8)
        assert rel < 5e-2, f"{ks}: relerr {rel:.3e}"


def test_trainer_g_precision_validated():
    from mtd_gan_tpu.engine.gan import MTDGANTrainer

    model = MTDGANModel(gen_features=8, disc_features=8, num_layers=2)
    with pytest.raises(ValueError):
        MTDGANTrainer(model, method="pcgrad", g_precision="sp:11111")
    tr = MTDGANTrainer(model, method="pcgrad", g_precision="bf16")
    assert tr.g_precision == "bf16"


def test_pallas_train_step_matches_einsum():
    """g_forward="pallas": one full PCGrad step through the fused fwd+bwd
    kernels must track the einsum step's losses (bf16-forward tolerance)."""
    from mtd_gan_tpu.engine.gan import MTDGANTrainer

    x = jax.random.uniform(jax.random.PRNGKey(7), (4, 64, 64, 1))
    y = jnp.clip(x + 0.05, 0, 1)

    def run(g_forward, steps=2):
        model = MTDGANModel(gen_features=8, disc_features=8, num_layers=2,
                            remat=False)
        tr = MTDGANTrainer(model, method="pcgrad", g_remat=False,
                           g_forward=g_forward)
        state = tr.create_state(jax.random.PRNGKey(3))
        ms = []
        for _ in range(steps):
            state, m = tr.train_step(state, x, y)
            ms.append(m)
        return ms

    m_ref = run("einsum")
    m_pal = run("pallas")
    for mr, mp in zip(m_ref, m_pal):
        np.testing.assert_allclose(float(mp["d_loss"]), float(mr["d_loss"]),
                                   rtol=1e-2)
        np.testing.assert_allclose(float(mp["g_loss"]), float(mr["g_loss"]),
                                   rtol=1e-2)
        assert np.isfinite(float(mp["d_loss"]))
        assert np.isfinite(float(mp["g_loss"]))
