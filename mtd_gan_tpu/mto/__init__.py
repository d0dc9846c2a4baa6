"""Multi-task-optimization (MTO) layer — TPU-native gradient surgery.

Reference: module/weight_methods.py (761 LoC, 11 strategies, registry at
:749-761). The reference performs K=3 sequential torch backward passes and
mutates .grad in place; here the trainer computes per-task gradients with a
single jax.vjp (one forward) + a vmapped pullback (one batched backward),
and every solver (CAGrad simplex, MGDA Frank-Wolfe, NashMTL Nash-bargaining
fixed point) runs as fixed-iteration pure-JAX math on the KxK Gram matrix —
no cvxpy/scipy host callbacks, everything under jit.
"""

from mtd_gan_tpu.mto.methods import (
    METHODS,
    MTOMethod,
    combine_grads,
    get_method,
    per_task_grads,
    per_task_grads_pruned,
)

__all__ = ["METHODS", "MTOMethod", "combine_grads", "get_method",
           "per_task_grads", "per_task_grads_pruned"]
