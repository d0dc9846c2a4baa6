"""Trainers for the scalar-d_loss GAN families.

AdversarialTrainer — WGAN-VGG / MAP-NN (reference engine.py:419-653):
  n_critic D updates on the same batch, then one G update, all inside ONE
  jitted step (the D loop is a lax.scan over the repeated update).
DUGANTrainer — DU-GAN (reference engine.py:658-784): three optimizers
  (image D, gradient D, G), one update each per step.
"""

from __future__ import annotations

import inspect
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtd_gan_tpu import optim as optim_lib
from mtd_gan_tpu.parallel.mesh import batch_sharding, replicated_sharding


@struct.dataclass
class AdvTrainState:
    params_g: Any
    params_d: Any
    state_d: Any
    opt_g: Any
    opt_d: Any
    rng: jax.Array
    step: jax.Array


class AdversarialTrainer:
    def __init__(self, model, optimizer="adamw", lr=1e-4, weight_decay=5e-4,
                 n_critic=None, mesh=None, hoist: Optional[bool] = None):
        self.model = model
        self.n_critic = n_critic or getattr(model, "d_steps_per_g", 1)
        self.tx_g = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.tx_d = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.mesh = mesh
        # hoist: compute G(x) ONCE per step instead of n_critic+1 times —
        # params_g is constant across the critic scan, so the value is
        # identical, and the G update reuses the forward's vjp (same
        # pattern as engine/gan.py). None = auto (on when the model's loss
        # API supports it); False forces the classic per-loss forwards.
        self.hoist = hoist
        self._step_fn = None

    def create_state(self, rng, patch_shape=(1, 64, 64, 1)) -> AdvTrainState:
        gv = self.model.init(rng, patch_shape)
        state = AdvTrainState(
            params_g=gv.params_g, params_d=gv.params_d, state_d=gv.state_d,
            opt_g=self.tx_g.init(gv.params_g), opt_d=self.tx_d.init(gv.params_d),
            rng=jax.random.fold_in(rng, 0), step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        self._step_fn = self._build_step()
        return state

    def _build_step(self):
        model = self.model
        hoist = (
            "fake" in inspect.signature(model.d_loss).parameters
            and hasattr(model, "g_loss_terms")
        )
        if self.hoist is not None:
            hoist = hoist and self.hoist

        def step(state: AdvTrainState, x, y):
            rng, rng_g, *rng_ds = jax.random.split(state.rng, 2 + self.n_critic)

            if hoist:
                # ONE G forward per step: the critic scan consumes its
                # stop-gradient value (params_g is a loop constant), the G
                # update reuses its vjp pull
                fake_raw, g_pull = jax.vjp(
                    lambda pg: model.Generator.apply({"params": pg}, x),
                    state.params_g,
                )
                fake_kw = {"fake": jax.lax.stop_gradient(fake_raw)}
            else:
                fake_kw = {}

            def d_once(carry, rng_d):
                params_d, state_d, opt_d = carry

                def loss_fn(pd):
                    loss, (sp, det) = model.d_loss(
                        pd, state.params_g, state_d, rng_d, x, y, **fake_kw
                    )
                    return loss, (sp, det)

                (loss, (sp, det)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params_d)
                updates, opt_d = self.tx_d.update(grads, opt_d, params_d)
                params_d = optax.apply_updates(params_d, updates)
                return (params_d, sp, opt_d), (loss, det)

            (params_d, state_d, opt_d), (d_losses, d_details) = jax.lax.scan(
                d_once, (state.params_d, state.state_d, state.opt_d),
                jnp.stack(rng_ds),
            )

            if hoist:
                def terms_fn(f):
                    total, (sp, det) = model.g_loss_terms(
                        f, params_d, state_d, rng_g, x, y
                    )
                    return total, (sp, det)

                (g_total, (state_d, g_details)), dfake = jax.value_and_grad(
                    terms_fn, has_aux=True
                )(fake_raw)
                (grads,) = g_pull(dfake)
            else:
                def g_loss_fn(pg):
                    total, (sp, det) = model.g_loss(
                        pg, params_d, state_d, rng_g, x, y
                    )
                    return total, (sp, det)

                (g_total, (state_d, g_details)), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True
                )(state.params_g)
            updates, opt_g = self.tx_g.update(grads, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)

            new_state = state.replace(
                params_g=params_g, params_d=params_d, state_d=state_d,
                opt_g=opt_g, opt_d=opt_d, rng=rng, step=state.step + 1,
            )
            metrics = {k: v[-1] for k, v in d_details.items()}
            metrics.update(g_details)
            metrics["d_loss"] = d_losses[-1]
            metrics["g_loss"] = g_total
            return new_state, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl, data = replicated_sharding(self.mesh), batch_sharding(self.mesh)
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, data, data),
                       out_shardings=(repl, repl))

    def train_step(self, state, x, y):
        return self._step_fn(state, x, y)

    def set_epoch_lr(self, state, lr: float):
        optim_lib.set_learning_rate(state.opt_g, lr)
        optim_lib.set_learning_rate(state.opt_d, lr)
        return state


@struct.dataclass
class DUGANTrainState:
    params_g: Any
    params_img_d: Any
    params_grad_d: Any
    state_img_d: Any
    state_grad_d: Any
    opt_g: Any
    opt_img_d: Any
    opt_grad_d: Any
    rng: jax.Array
    step: jax.Array


class DUGANTrainer:
    def __init__(self, model, optimizer="adamw", lr=1e-4, weight_decay=5e-4,
                 mesh=None, hoist: Optional[bool] = None):
        self.model = model
        self.tx_g = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.tx_img = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.tx_grad = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.mesh = mesh
        # hoist: one G forward serves both D losses + the G update's vjp
        # (see AdversarialTrainer); None = auto, False = classic forwards
        self.hoist = hoist
        self._step_fn = None

    def create_state(self, rng, patch_shape=(1, 64, 64, 1)) -> DUGANTrainState:
        v = self.model.init(rng, patch_shape)
        state = DUGANTrainState(
            params_g=v["params_g"],
            params_img_d=v["params_img_d"], params_grad_d=v["params_grad_d"],
            state_img_d=v["state_img_d"], state_grad_d=v["state_grad_d"],
            opt_g=self.tx_g.init(v["params_g"]),
            opt_img_d=self.tx_img.init(v["params_img_d"]),
            opt_grad_d=self.tx_grad.init(v["params_grad_d"]),
            rng=jax.random.fold_in(rng, 0), step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        self._step_fn = self._build_step()
        return state

    def _build_step(self):
        model = self.model
        hoist = (
            "fake" in inspect.signature(model.image_d_loss).parameters
            and hasattr(model, "g_loss_terms")
        )
        if self.hoist is not None:
            hoist = hoist and self.hoist

        def step(state: DUGANTrainState, x, y):
            rng, r_img, r_grad, r_g = jax.random.split(state.rng, 4)

            if hoist:
                fake_raw, g_pull = jax.vjp(
                    lambda pg: model.Generator.apply({"params": pg}, x),
                    state.params_g,
                )
                fake_kw = {"fake": jax.lax.stop_gradient(fake_raw)}
            else:
                fake_kw = {}

            def img_loss(p):
                return model.image_d_loss(p, state.params_g, state.state_img_d,
                                          r_img, x, y, **fake_kw)

            (img_total, (sp_img, img_det)), g_img = jax.value_and_grad(
                img_loss, has_aux=True)(state.params_img_d)
            upd, opt_img = self.tx_img.update(g_img, state.opt_img_d,
                                              state.params_img_d)
            params_img_d = optax.apply_updates(state.params_img_d, upd)

            def grad_loss(p):
                return model.grad_d_loss(p, state.params_g, state.state_grad_d,
                                         r_grad, x, y, **fake_kw)

            (grad_total, (sp_grad, grad_det)), g_grad = jax.value_and_grad(
                grad_loss, has_aux=True)(state.params_grad_d)
            upd, opt_grad = self.tx_grad.update(g_grad, state.opt_grad_d,
                                                state.params_grad_d)
            params_grad_d = optax.apply_updates(state.params_grad_d, upd)

            if hoist:
                def g_terms(f):
                    return model.g_loss_terms(f, params_img_d, params_grad_d,
                                              sp_img, sp_grad, r_g, x, y)

                (g_total, (sp_img2, sp_grad2, g_det)), dfake = (
                    jax.value_and_grad(g_terms, has_aux=True)(fake_raw))
                (g_g,) = g_pull(dfake)
            else:
                def g_loss(p):
                    return model.g_loss(p, params_img_d, params_grad_d,
                                        sp_img, sp_grad, r_g, x, y)

                (g_total, (sp_img2, sp_grad2, g_det)), g_g = jax.value_and_grad(
                    g_loss, has_aux=True)(state.params_g)
            upd, opt_g = self.tx_g.update(g_g, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, upd)

            new_state = state.replace(
                params_g=params_g, params_img_d=params_img_d,
                params_grad_d=params_grad_d, state_img_d=sp_img2,
                state_grad_d=sp_grad2, opt_g=opt_g, opt_img_d=opt_img,
                opt_grad_d=opt_grad, rng=rng, step=state.step + 1,
            )
            metrics = {**img_det, **grad_det, **g_det,
                       "d_img_loss": img_total, "d_grad_loss": grad_total,
                       "g_loss": g_total}
            return new_state, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl, data = replicated_sharding(self.mesh), batch_sharding(self.mesh)
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(repl, data, data),
                       out_shardings=(repl, repl))

    def train_step(self, state, x, y):
        return self._step_fn(state, x, y)

    def set_epoch_lr(self, state, lr: float):
        for opt in (state.opt_g, state.opt_img_d, state.opt_grad_d):
            optim_lib.set_learning_rate(opt, lr)
        return state
