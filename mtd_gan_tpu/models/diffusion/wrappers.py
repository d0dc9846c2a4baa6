"""Diffusion model wrappers: DDPM / DDIM / PNDM / DPM.

Parity target: reference arch/Diffusion/networks.py:13-125 + the engine's
diffusion loops (engine.py:789-897):
  * training: eps-prediction MSE — noisy = add_noise(n_100, eps, t);
    UNet([noisy ; n_20] concat, t) vs eps (inferer.py:40-69).
  * sampling: full reverse chain from pure noise conditioned by concat
    (inferer.py:72-126); DDPM 1000 steps, DDIM/PNDM/DPM 50.
The whole reverse chain is one lax.scan program (SURVEY.md §7 hard part (g)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from mtd_gan_tpu.models.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    PNDMScheduler,
)
from mtd_gan_tpu.models.diffusion.unet import DiffusionUNet

Array = jax.Array


class _DiffusionBase:
    n_inference_steps: int = 50

    def __init__(self, channels=(128, 256, 256), num_head_channels=256,
                 norm_groups=32, dtype=None):
        self.unet = DiffusionUNet(
            in_channels=2, out_channels=1, channels=channels,
            attention_levels=(False, True, True), num_res_blocks=1,
            num_head_channels=num_head_channels, norm_groups=norm_groups,
            dtype=dtype,
        )
        self.scheduler = self._make_scheduler()

    def _make_scheduler(self):
        raise NotImplementedError

    def init(self, rng, sample_shape=(1, 64, 64, 1)):
        x = jnp.zeros(sample_shape[:3] + (2,), jnp.float32)
        t = jnp.zeros((sample_shape[0],), jnp.int32)
        return jax.jit(self.unet.init)(rng, x, t)["params"]

    def loss(self, params, x, y, rng):
        """eps-MSE: x = condition (n_20), y = target (n_100)."""
        r_noise, r_t = jax.random.split(rng)
        noise = jax.random.normal(r_noise, y.shape, y.dtype)
        t = jax.random.randint(
            r_t, (y.shape[0],), 0, self.scheduler.num_train_timesteps
        )
        noisy = self.scheduler.add_noise(y, noise, t)
        eps_pred = self.unet.apply(
            {"params": params}, jnp.concatenate([noisy, x], axis=-1), t
        )
        val = jnp.mean((eps_pred - noise) ** 2)
        return val, {"loss": val}

    def sample(self, params, rng, condition: Array,
               segment_len: int | None = None) -> Array:
        """Full reverse chain from noise, conditioned by channel concat.

        Long chains on large images run as host-synced segments: the
        single 1000-step DDPM program at 512x512 crashed the TPU worker
        (a ~280 s device launch — PERF.md r2), so when steps x pixels is
        large the SAME scan body runs in segment_len-step programs with
        the carry threaded through (bit-identical math). Pass
        segment_len=0 to force the single-program path."""
        if segment_len is None:
            work = self.n_inference_steps * condition.shape[1] * condition.shape[2]
            if self.n_inference_steps >= 200 and work >= 200 * 256 * 256:
                segment_len = 100
        if segment_len:
            return self._sample_segmented(params, rng, condition, segment_len)
        return self._sample_one_program(params, rng, condition)

    def _eps_fn(self, params, condition):
        def eps_fn(xt, t):
            tb = jnp.full((xt.shape[0],), t, jnp.int32)
            return self.unet.apply(
                {"params": params}, jnp.concatenate([xt, condition], axis=-1), tb
            )

        return eps_fn

    @partial(jax.jit, static_argnums=0)
    def _sample_one_program(self, params, rng, condition: Array) -> Array:
        noise = jax.random.normal(rng, condition.shape, condition.dtype)
        return self.scheduler.sample(rng, self._eps_fn(params, condition),
                                     noise, self.n_inference_steps)

    def _sample_segmented(self, params, rng, condition: Array,
                          segment_len: int) -> Array:
        noise = jax.jit(
            lambda r: jax.random.normal(r, condition.shape, condition.dtype)
        )(rng)
        return self.scheduler.sample_segmented(
            rng, self._eps_fn(params, condition), noise,
            self.n_inference_steps, segment_len=segment_len,
        )

    # -- batched per-slice-keyed sampling (round 5) -----------------------

    def sample_batched(self, params, rngs, condition: Array,
                       segment_len: int | None = None) -> Array:
        """Batch the reverse chain over test slices at IDENTICAL per-slice
        math (VERDICT r4 item 4).

        condition: (B, H, W, 1); rngs: (B,) stacked PRNG keys. Slice i's
        trajectory is bit-equal to ``sample(params, rngs[i],
        condition[i:i+1])``: the whole chain is vmapped over the slice
        axis with each mapped element keeping its (1, H, W, 1) shape and
        its own key, so every noise draw and scan carry matches the
        batch-1 path (test-pinned, tests/test_diffusion.py). The reference
        samples batch-1 per test slice (engine.py:860-866); on TPU the
        chain batches trivially and the sweep cost drops ~B-fold."""
        cond = condition[:, None]  # (B, 1, H, W, 1)
        if segment_len is None:
            work = self.n_inference_steps * condition.shape[1] * condition.shape[2]
            if self.n_inference_steps >= 200 and work >= 200 * 256 * 256:
                segment_len = 100
        if not segment_len:
            out = self._sample_batched_one(params, rngs, cond)
            return out[:, 0]
        n = self.n_inference_steps
        carry, xs = self._scan_init_batched(rngs, n, cond)
        total = jax.tree_util.tree_leaves(xs)[0].shape[1]
        for i in range(0, total, segment_len):
            xs_seg = jax.tree_util.tree_map(
                lambda a: a[:, i:i + segment_len], xs)
            carry = self._seg_batched(params, carry, xs_seg, n, cond)
            jax.block_until_ready(carry[0])
        return carry[0][:, 0]

    @partial(jax.jit, static_argnums=0)
    def _sample_batched_one(self, params, rngs, cond):
        def one(r, cnd):
            noise = jax.random.normal(r, cnd.shape, cnd.dtype)
            return self.scheduler.sample(
                r, self._eps_fn(params, cnd), noise, self.n_inference_steps)

        return jax.vmap(one)(rngs, cond)

    @partial(jax.jit, static_argnums=(0, 2))
    def _scan_init_batched(self, rngs, n, cond):
        def one(r, cnd):
            noise = jax.random.normal(r, cnd.shape, cnd.dtype)
            return self.scheduler._scan_init(noise, r, n)

        return jax.vmap(one)(rngs, cond)

    @partial(jax.jit, static_argnums=(0, 4))
    def _seg_batched(self, params, carry, xs_seg, n, cond):
        def one(c, x_seg, cnd):
            body = self.scheduler._scan_body(self._eps_fn(params, cnd), n)
            c2, _ = jax.lax.scan(body, c, x_seg)
            return c2

        return jax.vmap(one)(carry, xs_seg, cond)

    # engine-compat: forward == sample (reference networks.py:32-38)
    def apply(self, params, x, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self.sample(params, rng, x)


class DDPMModel(_DiffusionBase):
    name = "DDPM"
    n_inference_steps = 1000

    def _make_scheduler(self):
        return DDPMScheduler()


class DDIMModel(_DiffusionBase):
    name = "DDIM"
    n_inference_steps = 50

    def _make_scheduler(self):
        return DDIMScheduler()


class PNDMModel(_DiffusionBase):
    name = "PNDM"
    n_inference_steps = 50

    def _make_scheduler(self):
        return PNDMScheduler()


class DPMModel(_DiffusionBase):
    name = "DPM"
    n_inference_steps = 50

    def _make_scheduler(self):
        return DPMSolverMultistepScheduler()
