"""Supervised trainer — RED-CNN / EDCNN / CTformer / Restormer family
(reference engine.py:192-414: forward, self-contained loss, backward, step).

One jitted, donated train step; optional data-parallel mesh (params
replicated, batch sharded over 'data')."""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtd_gan_tpu import optim as optim_lib
from mtd_gan_tpu.parallel.mesh import batch_sharding, replicated_sharding


@struct.dataclass
class SupervisedState:
    params: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


class SupervisedTrainer:
    """model must expose .init(rng) -> params and
    .loss(params, x, y, rng) -> (scalar, details)."""

    def __init__(
        self,
        model,
        optimizer: str = "adamw",
        lr: float = 1e-4,
        weight_decay: float = 5e-4,
        mesh=None,
    ):
        self.model = model
        self.base_lr = lr
        self.tx = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        # models may declare frozen params (e.g. CTformer's performer
        # projections, fixed buffers in the reference) via trainable_mask
        if hasattr(model, "trainable_mask"):
            self.tx = optax.masked(self.tx, model.trainable_mask)
        self.mesh = mesh
        self._step = self._build_step()

    def create_state(self, rng, sample_shape=(1, 64, 64, 1)) -> SupervisedState:
        params = self.model.init(rng, sample_shape)
        state = SupervisedState(
            params=params,
            opt_state=self.tx.init(params),
            # derived key: the caller's rng buffer must not be donated away
            # with the state on the first train_step
            rng=jax.random.fold_in(rng, 0),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    def _build_step(self):
        def step(state: SupervisedState, x, y):
            rng, rng_loss = jax.random.split(state.rng)

            def loss_fn(p):
                return self.model.loss(p, x, y, rng_loss)

            (loss, details), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state, rng=rng, step=state.step + 1
            )
            metrics = dict(details)
            metrics["loss"] = loss
            return new_state, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        return jax.jit(
            step,
            donate_argnums=(0,),
            in_shardings=(repl, data, data),
            out_shardings=(repl, repl),
        )

    def train_step(self, state, x, y):
        return self._step(state, x, y)

    def set_epoch_lr(self, state, lr: float):
        optim_lib.set_learning_rate(state.opt_state, lr)
        return state

    def predict(self, params, x):
        return self.model.apply(params, x)
