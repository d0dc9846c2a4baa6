"""Diffusion noise schedulers in functional JAX form.

Parity targets (reference arch/Diffusion/generative/networks/schedulers/):
  DDPMScheduler  -> ddpm.py   (linear betas 1e-4..2e-2, T=1000, epsilon
                   prediction, clip_sample, FIXED_SMALL variance)
  DDIMScheduler  -> ddim.py   (eta=0 deterministic, clip_sample)
  PNDMScheduler  -> pndm.py   (skip_prk_steps=True -> PLMS linear multistep
                   with 1/2/3/4-order Adams-Bashforth warmup, formula (9))
  DPMSolverMultistepScheduler -> dpm_multi.py (DPM-Solver++(2M), data
                   prediction, lower-order final)

Design: each scheduler is a frozen dataclass of static config + precomputed
tables; `sample(...)` runs the whole reverse chain under lax.scan with an
explicit carry (history buffers replace the reference's Python-side
`self.ets` mutation), so a 1000-step DDPM chain is ONE compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def linear_betas(num_train_timesteps: int = 1000, beta_start: float = 1e-4,
                 beta_end: float = 2e-2) -> np.ndarray:
    return np.linspace(beta_start, beta_end, num_train_timesteps,
                       dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class BaseScheduler:
    num_train_timesteps: int = 1000
    clip_sample: bool = True

    def __post_init__(self):
        betas = linear_betas(self.num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        object.__setattr__(self, "_betas", jnp.asarray(betas))
        object.__setattr__(self, "_alphas_cumprod", jnp.asarray(alphas_cumprod))

    @property
    def betas(self) -> Array:
        return self._betas

    @property
    def alphas_cumprod(self) -> Array:
        return self._alphas_cumprod

    def add_noise(self, x0: Array, noise: Array, t: Array) -> Array:
        """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps."""
        acp = self._alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        return (
            jnp.sqrt(acp).reshape(shape) * x0
            + jnp.sqrt(1.0 - acp).reshape(shape) * noise
        )

    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        ratio = self.num_train_timesteps // num_inference_steps
        return (np.arange(0, num_inference_steps) * ratio)[::-1].copy()

    # -- generic sampling over per-scheduler scan pieces ------------------
    # Each scheduler defines _scan_init(noise, rng, n) -> (carry0, xs) and
    # _scan_body(eps_fn, n) -> body; carry[0] is always the sample. This
    # lets the reverse chain run either as ONE lax.scan program or as
    # host-synced SEGMENTS of the same body (the 1000-step DDPM chain at
    # 512x512 crashed the TPU worker as a single ~280 s device program —
    # PERF.md r2; VERDICT r3 item 5).

    def sample(self, rng: Array, eps_fn: Callable[[Array, Array], Array],
               noise: Array, num_inference_steps: Optional[int] = None) -> Array:
        n = num_inference_steps or self.default_inference_steps
        carry0, xs = self._scan_init(noise, rng, n)
        carry, _ = jax.lax.scan(self._scan_body(eps_fn, n), carry0, xs)
        return carry[0]

    def sample_segmented(self, rng: Array, eps_fn, noise: Array,
                         num_inference_steps: Optional[int] = None,
                         segment_len: int = 100) -> Array:
        """Host-synced segmented reverse chain: identical math to
        :meth:`sample` (the carry threads across segments), but each
        segment is its own device program so no single launch exceeds
        runtime watchdogs. eps_fn must be jittable; params it closes over
        are traced per segment shape (one compile for equal segments)."""
        n = num_inference_steps or self.default_inference_steps
        carry0, xs = self._scan_init(noise, rng, n)
        body = self._scan_body(eps_fn, n)

        @jax.jit
        def seg(carry, xs_seg):
            carry, _ = jax.lax.scan(body, carry, xs_seg)
            return carry

        total = jax.tree_util.tree_leaves(xs)[0].shape[0]
        carry = carry0
        for i in range(0, total, segment_len):
            xs_seg = jax.tree_util.tree_map(
                lambda a: a[i:i + segment_len], xs)
            carry = seg(carry, xs_seg)
            jax.block_until_ready(carry[0])
        return carry[0]

    def _pred_x0(self, sample: Array, eps: Array, acp_t: Array) -> Array:
        x0 = (sample - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0


@dataclasses.dataclass(frozen=True)
class DDPMScheduler(BaseScheduler):
    default_inference_steps: int = 1000

    def _scan_init(self, noise, rng, n):
        return (noise, rng), jnp.asarray(self.inference_timesteps(n))

    def _scan_body(self, eps_fn, n):
        acp = self._alphas_cumprod
        betas = self._betas

        def body(carry, t):
            x, rng = carry
            rng, r_noise = jax.random.split(rng)
            eps = eps_fn(x, t)
            acp_t = acp[t]
            acp_prev = jnp.where(t > 0, acp[t - 1], 1.0)
            x0 = self._pred_x0(x, eps, acp_t)
            # posterior mean coefficients (DDPM eq. 7)
            beta_t = betas[t]
            coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
            coef_xt = jnp.sqrt(1.0 - beta_t) * (1.0 - acp_prev) / (1.0 - acp_t)
            mean = coef_x0 * x0 + coef_xt * x
            # FIXED_SMALL variance, no noise at t == 0
            var = beta_t * (1.0 - acp_prev) / (1.0 - acp_t)
            z = jax.random.normal(r_noise, x.shape, x.dtype)
            x = mean + jnp.where(t > 0, jnp.sqrt(jnp.clip(var, 1e-20)), 0.0) * z
            return (x, rng), None

        return body


@dataclasses.dataclass(frozen=True)
class DDIMScheduler(BaseScheduler):
    default_inference_steps: int = 50
    eta: float = 0.0

    def _scan_init(self, noise, rng, n):
        return (noise, rng), jnp.asarray(self.inference_timesteps(n))

    def _scan_body(self, eps_fn, n):
        ratio = self.num_train_timesteps // n
        acp = self._alphas_cumprod

        def body(carry, t):
            x, rng = carry
            rng, r_noise = jax.random.split(rng)
            eps = eps_fn(x, t)
            acp_t = acp[t]
            t_prev = t - ratio
            acp_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
            x0 = self._pred_x0(x, eps, acp_t)
            # recompute eps from (possibly clipped) x0 as the reference does
            eps_hat = (x - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
            var = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
            std = self.eta * jnp.sqrt(jnp.clip(var, 0.0))
            direction = jnp.sqrt(jnp.clip(1.0 - acp_prev - std**2, 0.0)) * eps_hat
            x = jnp.sqrt(acp_prev) * x0 + direction
            if self.eta > 0:
                x = x + std * jax.random.normal(r_noise, x.shape, x.dtype)
            return (x, rng), None

        return body


@dataclasses.dataclass(frozen=True)
class PNDMScheduler(BaseScheduler):
    """PLMS variant (skip_prk_steps=True, reference pndm.py:140-145)."""

    default_inference_steps: int = 50
    clip_sample: bool = False  # reference PNDM applies no x0 clipping in PLMS

    def _scan_init(self, noise, rng, n):
        ts = np.asarray(self.inference_timesteps(n), dtype=np.int32)
        counters = np.arange(len(ts), dtype=np.int32)
        ets0 = jnp.zeros((4,) + noise.shape, noise.dtype)
        carry0 = (noise, jnp.zeros_like(noise), ets0,
                  jnp.zeros((), jnp.int32))
        return carry0, (jnp.asarray(counters), jnp.asarray(ts))

    def _scan_body(self, eps_fn, n):
        ratio = self.num_train_timesteps // n
        acp = self._alphas_cumprod

        def prev_sample(sample, t, t_prev, eps):
            acp_t = acp[t]
            acp_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
            beta_t = 1.0 - acp_t
            beta_prev = 1.0 - acp_prev
            sample_coeff = jnp.sqrt(acp_prev / acp_t)
            denom = acp_t * jnp.sqrt(beta_prev) + jnp.sqrt(
                acp_t * beta_t * acp_prev
            )
            return sample_coeff * sample - (acp_prev - acp_t) * eps / denom

        # counter semantics of the reference PLMS loop (pndm.py:255-276):
        # counter 0: plain eps, remember sample; counter 1: re-step from the
        # REMEMBERED sample with averaged eps at the SAME t; counters >= 2:
        # Adams-Bashforth of order min(len(ets), 4).
        def body(carry, inp):
            x, cur_sample, ets, n_ets = carry
            counter, t = inp
            eps = eps_fn(x, t)

            is1 = counter == 1
            t_eff = jnp.where(is1, t + ratio, t)
            t_prev = jnp.where(is1, t, t_eff - ratio)

            # history update (skipped at counter == 1)
            new_ets = jnp.where(is1, ets, jnp.roll(ets, -1, axis=0).at[-1].set(eps))
            new_n = jnp.where(is1, n_ets, jnp.minimum(n_ets + 1, 4))

            e1 = new_ets[-1]
            e2 = new_ets[-2]
            e3 = new_ets[-3]
            e4 = new_ets[-4]
            eps_used = jnp.select(
                [
                    (new_n == 1) & (counter == 0),
                    is1,
                    new_n == 2,
                    new_n == 3,
                ],
                [
                    eps,
                    (eps + e1) / 2.0,
                    (3 * e1 - e2) / 2.0,
                    (23 * e1 - 16 * e2 + 5 * e3) / 12.0,
                ],
                (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24.0,
            )
            base = jnp.where(is1, cur_sample, x)
            new_cur = jnp.where(counter == 0, x, cur_sample)
            x_next = prev_sample(base, t_eff, t_prev, eps_used)
            return (x_next, new_cur, new_ets, new_n), None

        # one pass over the PLMS timesteps; counter 1 re-steps the FIRST
        # transition from the remembered sample with the averaged eps
        # (reference pndm.py:255-276 — eps there is evaluated at the SECOND
        # timestep, t_eff/t_prev shifted up by one ratio)
        return body


@dataclasses.dataclass(frozen=True)
class DPMSolverMultistepScheduler(BaseScheduler):
    """DPM-Solver++(2M): 2nd-order multistep, data (x0) prediction,
    lower-order final step (reference dpm_multi.py defaults)."""

    default_inference_steps: int = 50
    clip_sample: bool = False

    def _scan_init(self, noise, rng, n):
        ts = np.linspace(0, self.num_train_timesteps - 1, n + 1).round()[::-1][
            :-1
        ].astype(np.int64)
        carry0 = (noise, jnp.zeros_like(noise), jnp.zeros((), bool))
        return carry0, jnp.arange(len(ts))

    def _scan_body(self, eps_fn, n):
        acp_full = np.asarray(self._alphas_cumprod)
        # timesteps: linspace over [0, T-1], descending (diffusers/MONAI style)
        ts = np.linspace(0, self.num_train_timesteps - 1, n + 1).round()[::-1][
            :-1
        ].astype(np.int64)
        # sigma/alpha/lambda tables at the n+1 boundary points (append t=0)
        t_bound = np.concatenate([ts, [0]])
        alpha_t = np.sqrt(acp_full[t_bound])
        sigma_t = np.sqrt(1.0 - acp_full[t_bound])
        lam = np.log(alpha_t) - np.log(sigma_t)

        alpha_t = jnp.asarray(alpha_t)
        sigma_t = jnp.asarray(sigma_t)
        lam = jnp.asarray(lam)
        ts_j = jnp.asarray(ts)

        def body(carry, i):
            x, x0_prev, has_prev = carry
            t = ts_j[i]
            eps = eps_fn(x, t)
            a_i, s_i = alpha_t[i], sigma_t[i]
            x0 = (x - s_i * eps) / a_i
            if self.clip_sample:
                x0 = jnp.clip(x0, -1.0, 1.0)

            h = lam[i + 1] - lam[i]
            a_next, s_next = alpha_t[i + 1], sigma_t[i + 1]
            # first-order (DPM-Solver++(1)) update
            first = (s_next / s_i) * x - a_next * jnp.expm1(-h) * x0
            # second-order multistep correction
            h_prev = lam[i] - lam[jnp.maximum(i - 1, 0)]
            r = h_prev / jnp.where(h == 0, 1.0, h)
            d1 = (x0 - x0_prev) / jnp.where(r == 0, 1.0, r)
            second = first - 0.5 * a_next * jnp.expm1(-h) * d1
            # use 2nd order when history exists and not the final step
            use_second = has_prev & (i < len(ts) - 1)
            x_next = jnp.where(use_second, second, first)
            return (x_next, x0, jnp.ones((), bool)), None

        return body
