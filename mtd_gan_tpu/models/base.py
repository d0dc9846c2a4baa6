"""Model protocol layer.

Two families:
  * SupervisedModel — single network with a self-contained loss
    (RED-CNN / EDCNN / CTformer / Restormer; reference engine.py:192-414).
  * AdversarialModel — Generator + Discriminator(s) exposing d_loss / g_loss
    (WGAN-VGG / MAP-NN / DU-GAN / MTD-GAN; reference engine.py:419-784, 26-76).

All are plain Python objects holding linen modules; parameters and mutable
state (spectral-norm u vectors) are explicit pytrees threaded through jitted
steps. `d_loss` may return a stacked per-task loss vector (MTD-GAN returns
[disc, rec, consist]; reference arch/Ours/networks.py:1992) — the MTO layer
consumes that vector.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

Array = jax.Array
Params = Any
State = Any


@dataclasses.dataclass
class GANVariables:
    """Bundle of all trainable/mutable variables of an adversarial model."""

    params_g: Params
    params_d: Params
    state_d: State  # e.g. {'spectral': ...}; {} when D has no state

    def tree_flatten(self):
        return (self.params_g, self.params_d, self.state_d), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    GANVariables, GANVariables.tree_flatten, GANVariables.tree_unflatten
)


def param_labels(params, label_fn: Callable[[Tuple[str, ...]], str]):
    """Label every leaf of a params pytree by its path (top-level module name
    first). Used to partition discriminator params into shared /
    task-specific / unassigned groups for MTO gradient surgery."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def one(path):
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return label_fn(keys)

    return jax.tree_util.tree_map_with_path(lambda p, _: one(p), params)


def tree_where_label(labels, value_tree, label: str, fill=0.0):
    """Keep leaves whose label matches `label`, zero elsewhere."""
    return jax.tree_util.tree_map(
        lambda lab, v: v if lab == label else jnp.full_like(v, fill),
        labels,
        value_tree,
    )
