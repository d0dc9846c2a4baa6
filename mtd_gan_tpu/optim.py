"""Optimizers and LR schedules.

Parity targets:
  get_optimizer -> reference optimizers.py:4-14 (Adam/AdamW, betas (0.9,0.999),
                   eps 1e-8, weight_decay 5e-4; torch Adam couples wd into the
                   gradient, torch AdamW decouples — both reproduced).
  poly_lr_factor -> reference schedulers.py:8-18 (linear warmup -> poly decay
                   starting at epochs/10; NOTE faithful quirk: min_lr floors
                   the *factor*, not the absolute lr).
  cosine_warm_restart_factor -> reference schedulers.py:21-74 (T_0=100,
                   T_mult=1, eta_max=1e-3, T_up=10, gamma=0.6 per
                   get_scheduler 'cosine_annealing_warm_restart').

The reference steps schedulers once per epoch (train.py:264-273); we mirror
that by computing an lr for each epoch on host and injecting it via
optax.inject_hyperparams — the jitted step never recompiles on lr change.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def get_optimizer(name: str, lr: float = 1e-4, weight_decay: float = 5e-4):
    """Returns an optax.GradientTransformation with an injectable
    `learning_rate` hyperparameter."""
    if name == "adam":
        # torch Adam's weight_decay is L2 folded into the gradient
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(-learning_rate),
            )

        return make(learning_rate=lr)
    if name == "adamw":
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(weight_decay),
                optax.scale(-learning_rate),
            )

        return make(learning_rate=lr)
    raise KeyError(f"unknown optimizer {name!r}")


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate hyperparameter in-place-style.
    Stored as a strong-typed f32 array: a raw python float would change the
    pytree leaf type and force a second jit compile of the train step."""
    import jax.numpy as jnp

    inner = opt_state
    # unwrap optax.masked (frozen-param models, e.g. CTformer's w buffers)
    while not hasattr(inner, "hyperparams") and hasattr(inner, "inner_state"):
        inner = inner.inner_state
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def poly_lr_factor(
    epoch: int,
    warmup_epochs: int,
    start_decay_epoch: float,
    total_epochs: int,
    min_lr: float,
) -> float:
    """Multiplicative factor applied to the base lr at `epoch`."""
    if epoch < warmup_epochs:
        return max(0.0, epoch / warmup_epochs)
    factor = 1.0 - max(0.0, epoch - start_decay_epoch) / (
        float(total_epochs) - start_decay_epoch
    )
    if factor <= min_lr:  # faithful quirk: factor floored at min_lr VALUE
        factor = min_lr
    return factor


class CosineWarmRestarts:
    """Warm-restart cosine with per-cycle eta_max decay.

    Produces absolute lrs (not factors), matching the reference class:
    within each cycle of length T_0, lr ramps linearly from base_lr to
    eta_max over T_up epochs then cosine-decays back to base_lr;
    eta_max shrinks by gamma each cycle.
    """

    def __init__(self, base_lr: float, t_0: int = 100, t_mult: int = 1,
                 eta_max: float = 1e-3, t_up: int = 10, gamma: float = 0.6):
        if t_0 <= 0 or t_mult < 1 or t_up < 0:
            raise ValueError("invalid cosine warm-restart config")
        self.base_lr = base_lr
        self.t_0 = t_0
        self.t_mult = t_mult
        self.eta_max0 = eta_max
        self.t_up = t_up
        self.gamma = gamma

    def __call__(self, epoch: int) -> float:
        if epoch < 0:
            return self.base_lr
        if self.t_mult == 1:
            cycle, t_cur = divmod(epoch, self.t_0)
            t_i = self.t_0
        else:
            if epoch >= self.t_0:
                n = int(
                    math.log(epoch / self.t_0 * (self.t_mult - 1) + 1, self.t_mult)
                )
                cycle = n
                t_cur = epoch - self.t_0 * (self.t_mult**n - 1) / (self.t_mult - 1)
                t_i = self.t_0 * self.t_mult**n
            else:
                cycle, t_cur, t_i = 0, epoch, self.t_0
        eta_max = self.eta_max0 * (self.gamma**cycle)
        if t_cur < self.t_up:
            return (eta_max - self.base_lr) * t_cur / self.t_up + self.base_lr
        return self.base_lr + (eta_max - self.base_lr) * (
            1 + math.cos(math.pi * (t_cur - self.t_up) / (t_i - self.t_up))
        ) / 2


def get_scheduler(name: str, base_lr: float, epochs: int,
                  warmup_epochs: int = 10, min_lr: float = 1e-5):
    """Returns epoch -> absolute lr."""
    if name == "poly_lr":
        return lambda epoch: base_lr * poly_lr_factor(
            epoch, warmup_epochs, epochs / 10, epochs, min_lr
        )
    if name == "cosine_annealing_warm_restart":
        return CosineWarmRestarts(base_lr)
    raise KeyError(f"unknown scheduler {name!r}")
