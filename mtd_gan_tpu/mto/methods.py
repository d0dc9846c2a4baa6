"""Eleven multi-task weighting / gradient-surgery strategies, pure JAX.

Parity map to reference module/weight_methods.py:
  ls          -> :273-291  LinearScalarization (sum of w_i * L_i)
  scaleinvls  -> :294-313  log-loss scalarization
  stl         -> :375-388  single task
  uw          -> :391-406  learnable uncertainty weighting (logsigma trained
                           by optimizer_D's second param group at lr 0.025,
                           train.py:122-124)
  rlw         -> :591-602  random softmax weights
  imtl        -> :605-668  IMTL-G closed form
  dwa         -> :671-724  dynamic weight average (FIFO cost history)
  pcgrad      -> :409-468  project conflicting gradients (random order)
  cagrad      -> :471-588  conflict-averse gradient (simplex solve)
  mgda        -> :319-372  Frank-Wolfe min-norm point
  nashmtl     -> :99-272   Nash bargaining solution

Semantics preserved faithfully, including reference quirks:
  * pcgrad: task-specific params get the gradient of sum(losses);
    params in neither partition (e.g. the CLS c_fc) get ZERO gradient.
  * cagrad: ONLY shared params receive gradients (reference backward
    never populates the rest, :575-588); final g scaled by n_tasks.
  * mgda weights scaled by n_tasks (:369); dwa uses mean not sum (:717).
  * nashmtl: shared-grad global-norm clip at 1.0 after combine (:264-266).
Solver deviation (documented): cvxpy-ECOS / scipy-SLSQP replaced with
fixed-iteration on-device solvers converging to the same stationary points.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array
PyTree = Any


# ---------------------------------------------------------------------------
# pytree helpers — all grads arrive STACKED: each leaf has leading axis K.
# ---------------------------------------------------------------------------

def _masked(stacked: PyTree, labels: PyTree, keep: str) -> PyTree:
    return jax.tree_util.tree_map(
        lambda lab, g: g if lab == keep else jnp.zeros_like(g), labels, stacked
    )


def _tree_vdot(a: PyTree, b: PyTree) -> Array:
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32)), a, b
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves, jnp.float32(0.0))


def _gram(stacked_shared: PyTree, n_tasks: int) -> Array:
    """K x K Gram matrix of per-task gradients over masked (shared) leaves."""

    def leaf_gram(g):
        flat = g.reshape(n_tasks, -1).astype(jnp.float32)
        return flat @ flat.T

    leaves = jax.tree_util.tree_map(leaf_gram, stacked_shared)
    return jax.tree_util.tree_reduce(
        jnp.add, leaves, jnp.zeros((n_tasks, n_tasks), jnp.float32)
    )


def _weighted_sum(stacked: PyTree, w: Array) -> PyTree:
    return jax.tree_util.tree_map(
        lambda g: jnp.tensordot(w.astype(g.dtype), g, axes=1), stacked
    )


def _select_task(stacked: PyTree, i) -> PyTree:
    return jax.tree_util.tree_map(lambda g: g[i], stacked)


def _global_norm(tree: PyTree) -> Array:
    return jnp.sqrt(_tree_vdot(tree, tree))


def _merge_by_label(labels: PyTree, shared_tree: PyTree, task_tree: PyTree,
                    unassigned_tree: PyTree) -> PyTree:
    def pick(lab, s, t, u):
        if lab == "shared":
            return s
        if lab == "task":
            return t
        return u

    return jax.tree_util.tree_map(pick, labels, shared_tree, task_tree, unassigned_tree)


def _simplex_project(v: Array) -> Array:
    """Euclidean projection onto the probability simplex (sorted algorithm)."""
    k = v.shape[0]
    u = jnp.sort(v)[::-1]
    css = jnp.cumsum(u)
    idx = jnp.arange(1, k + 1, dtype=v.dtype)
    cond = u + (1.0 - css) / idx > 0
    rho = jnp.sum(cond.astype(jnp.int32)) - 1
    lam = (1.0 - css[rho]) / (rho + 1.0)
    return jnp.maximum(v + lam, 0.0)


# ---------------------------------------------------------------------------
# method definitions
# ---------------------------------------------------------------------------

@struct.dataclass
class MTOState:
    """Union state for all methods (unused fields stay at defaults)."""

    step: Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    # uw: learnable log-sigma (reference :391-406), trained at lr 0.025
    logsigma: Optional[Array] = None
    # dwa: FIFO cost history (2*window, K) + iteration counter
    costs: Optional[Array] = None
    dwa_weights: Optional[Array] = None
    # nashmtl: previous alpha
    prvs_alpha: Optional[Array] = None


@dataclasses.dataclass(frozen=True)
class MTOMethod:
    name: str
    kind: str  # 'weighting' | 'surgery'
    n_tasks: int = 3
    # method hyperparameters (reference train.py:120)
    main_task: int = 0          # stl
    cagrad_c: float = 0.4       # cagrad
    dwa_window: int = 25        # dwa
    dwa_temp: float = 2.0       # dwa
    nash_max_norm: float = 1.0  # nashmtl
    nash_niter: int = 20        # nashmtl
    mgda_normalization: str = "none"
    mgda_iters: int = 250
    train_unassigned: bool = False  # deviate-from-reference escape hatch

    def init_state(self) -> MTOState:
        k = self.n_tasks
        kw: Dict[str, Any] = {}
        if self.name == "uw":
            kw["logsigma"] = jnp.zeros((k,), jnp.float32)
        if self.name == "dwa":
            kw["costs"] = jnp.ones((2 * self.dwa_window, k), jnp.float32)
            kw["dwa_weights"] = jnp.ones((k,), jnp.float32)
        if self.name == "nashmtl":
            kw["prvs_alpha"] = jnp.ones((k,), jnp.float32)
        return MTOState(**kw)


METHODS = (
    "ls", "scaleinvls", "stl", "uw", "rlw", "imtl", "dwa",
    "pcgrad", "cagrad", "mgda", "nashmtl",
)

_SURGERY = {"pcgrad", "cagrad"}


def get_method(name: str, n_tasks: int = 3, **kwargs) -> MTOMethod:
    if name not in METHODS:
        raise KeyError(f"unknown MTO method {name!r}; known: {METHODS}")
    kind = "surgery" if name in _SURGERY else "weighting"
    return MTOMethod(name=name, kind=kind, n_tasks=n_tasks, **kwargs)


# ---------------------------------------------------------------------------
# per-task gradient computation: ONE forward + vmapped pullback
# ---------------------------------------------------------------------------

def per_task_grads(loss_fn: Callable, params: PyTree, n_tasks: int):
    """loss_fn(params) -> (losses_vec[K], aux). Returns
    (losses, stacked_grads with leading axis K on every leaf, aux)."""
    losses, vjp_fn, aux = jax.vjp(loss_fn, params, has_aux=True)
    basis = jnp.eye(n_tasks, dtype=losses.dtype)
    stacked = jax.vmap(lambda e: vjp_fn(e)[0])(basis)
    return losses, stacked, aux


def per_task_grads_pruned(loss_fn: Callable, params: PyTree, n_tasks: int):
    """Same contract as per_task_grads, via K separate jax.grad calls.

    The vmapped basis pullback is DENSE: every task's cotangent lane
    traverses every branch of the network even where a task's loss is
    structurally disconnected (e.g. MTD-GAN's rec loss never touches the
    SEG decoder, and only consist reaches the second D application), moving
    activation-sized zero tensors through HBM. Separate grad traces let
    JAX's DCE prune each task's backward to its connected subgraph, while
    XLA CSE merges the K identical forwards (same params, same rng)."""
    def f0(p):
        lv, aux = loss_fn(p)
        return lv[0], (lv, aux)

    (_, (losses, aux)), g0 = jax.value_and_grad(f0, has_aux=True)(params)
    grads = [g0]
    for i in range(1, n_tasks):
        grads.append(jax.grad(lambda p, i=i: loss_fn(p)[0][i])(params))
    stacked = jax.tree_util.tree_map(lambda *g: jnp.stack(g), *grads)
    return losses, stacked, aux


# ---------------------------------------------------------------------------
# weighting methods — produce effective gradient weights w (grad = sum w_i g_i
# on EVERY param, matching reference weighted_loss.backward())
# ---------------------------------------------------------------------------

def _weights_and_state(
    method: MTOMethod,
    state: MTOState,
    rng: Array,
    losses: Array,
    gram_fn: Callable[[], Array],
) -> Tuple[Array, Array, MTOState]:
    """Returns (effective_grad_weights, reported_weights, new_state)."""
    k = method.n_tasks
    name = method.name

    if name == "ls":
        w = jnp.ones((k,), jnp.float32)
        return w, w, state

    if name == "scaleinvls":
        w = jnp.ones((k,), jnp.float32)
        return w / (losses + 1e-12), w, state

    if name == "stl":
        w = jax.nn.one_hot(method.main_task, k, dtype=jnp.float32)
        return w, w, state

    if name == "rlw":
        w = jax.nn.softmax(jax.random.normal(rng, (k,), jnp.float32))
        return w, w, state

    if name == "uw":
        # L = sum 0.5*(exp(-s)*l + s); grads get 0.5*exp(-s) each
        eff = 0.5 * jnp.exp(-state.logsigma)
        return eff, jnp.exp(-state.logsigma), state

    if name == "dwa":
        win = method.dwa_window
        costs = jnp.roll(state.costs, -1, axis=0).at[-1].set(
            jax.lax.stop_gradient(losses)
        )
        ws = jnp.mean(costs[win:], axis=0) / jnp.mean(costs[:win], axis=0)
        new_w = (k * jnp.exp(ws / method.dwa_temp)) / jnp.sum(
            jnp.exp(ws / method.dwa_temp)
        )
        w = jnp.where(state.step > win, new_w, state.dwa_weights)
        new_state = state.replace(costs=costs, dwa_weights=w)
        # reference: loss = (w * losses).mean() -> effective grad weight w/K
        return w / k, w, new_state

    if name == "imtl":
        g = gram_fn()  # K x K Gram of shared grads
        norms = jnp.sqrt(jnp.diag(g) + 1e-12)
        # D = g_0 - g_{1:}, U = u_0 - u_{1:} with u_i = g_i / ||g_i||
        # first = g_0 @ U^T ; second = inv(D @ U^T) — all from the Gram matrix
        gu = g / norms[None, :]  # gu[i, j] = <g_i, u_j>
        first = gu[0, 0] - gu[0, 1:]  # <g_0, u_0 - u_j>, j >= 1
        # (D @ U^T)[i-1, j-1] = <g_0 - g_i, u_0 - u_j>
        dut = (
            gu[0, 0] - gu[0, 1:][None, :] - gu[1:, 0][:, None] + gu[1:, 1:]
        )
        alpha_rest = first @ jnp.linalg.inv(
            dut + 1e-8 * jnp.eye(method.n_tasks - 1)
        )
        alpha = jnp.concatenate([1.0 - jnp.sum(alpha_rest, keepdims=True), alpha_rest])
        return alpha, alpha, state

    if name == "nashmtl":
        g = gram_fn()
        norm_factor = jnp.linalg.norm(g) + 1e-10
        gtg = g / norm_factor

        def newton_step(alpha, _):
            # solve gtg @ a = 1/a via damped Newton on F(a) = gtg a - 1/a
            fval = gtg @ alpha - 1.0 / (alpha + 1e-10)
            jac = gtg + jnp.diag(1.0 / (alpha + 1e-10) ** 2)
            step = jnp.linalg.solve(
                jac + 1e-8 * jnp.eye(method.n_tasks), fval
            )
            return jnp.maximum(alpha - step, 1e-6), None

        alpha0 = state.prvs_alpha
        alpha, _ = jax.lax.scan(newton_step, alpha0, None, length=method.nash_niter)
        new_state = state.replace(prvs_alpha=alpha)
        return alpha, alpha, new_state

    if name == "mgda":
        g = gram_fn()
        # gradient_normalizers (reference min_norm_solvers.py:201-219)
        if method.mgda_normalization == "norm":
            gn = jnp.sqrt(jnp.diag(g) + 1e-12)
        elif method.mgda_normalization == "loss":
            gn = losses
        elif method.mgda_normalization == "loss+":
            gn = losses * jnp.sqrt(jnp.diag(g) + 1e-12)
        else:
            gn = jnp.ones((k,), jnp.float32)
        m = g / (gn[:, None] * gn[None, :] + 1e-12)

        # Frank-Wolfe with exact line search on the simplex
        def fw_step(sol, _):
            grad_dir = m @ sol
            t = jnp.argmin(grad_dir)
            e_t = jax.nn.one_hot(t, k, dtype=sol.dtype)
            d = e_t - sol
            dmd = d @ m @ d
            gamma = jnp.clip(-(sol @ m @ d) / (dmd + 1e-12), 0.0, 1.0)
            return sol + gamma * d, None

        sol0 = jnp.ones((k,), jnp.float32) / k
        sol, _ = jax.lax.scan(fw_step, sol0, None, length=method.mgda_iters)
        sol = sol * k  # reference scales to sum to n_tasks (:369)
        return sol, sol, state

    raise KeyError(name)


def uw_logsigma_grad(state: MTOState, losses: Array) -> Array:
    """Analytic gradient of the UW objective wrt logsigma:
    d/ds [0.5*(exp(-s)*l + s)] = 0.5*(1 - exp(-s)*l)."""
    return 0.5 * (1.0 - jnp.exp(-state.logsigma) * jax.lax.stop_gradient(losses))


# ---------------------------------------------------------------------------
# surgery methods
# ---------------------------------------------------------------------------

def _pcgrad_shared(rng: Array, stacked_shared: PyTree, n_tasks: int) -> PyTree:
    """Project-conflicting-gradients on the shared subtree.
    Each task's gradient is sequentially projected against the ORIGINAL
    gradients of the other tasks in random order (reference :449-464).

    TPU note: the projected gradient always stays in span{g_1..g_k}, so the
    whole sequential projection runs in k-dim COEFFICIENT space against the
    Gram matrix — two passes over the stacked gradients (Gram + final
    weighted sum) instead of 3k sequential tree-wide dot/axpy passes.
    Measured: the three 16 ms projection while-loops in the train step
    collapse to ~1 ms (PERF.md r3). Same math: dot(g, g_j) = c @ G[:, j]
    and g - coef*g_j maps to c[j] -= coef."""
    k = n_tasks
    gram = _gram(stacked_shared, k)

    def project_one(rng_i, i):
        order = jax.random.permutation(rng_i, k)
        c0 = jnp.zeros((k,), jnp.float32).at[i].set(1.0)

        def body(c, j_idx):
            j = order[j_idx]
            dot = c @ gram[:, j]
            gj_sq = gram[j, j] + 1e-12
            coef = jnp.where(dot < 0, dot / gj_sq, 0.0)
            return c.at[j].add(-coef), None

        c_proj, _ = jax.lax.scan(body, c0, jnp.arange(k))
        return c_proj

    rngs = jax.random.split(rng, k)
    w = sum(project_one(rngs[i], i) for i in range(k))
    return _weighted_sum(stacked_shared, w)


def _cagrad_shared(stacked_shared: PyTree, n_tasks: int, c: float = 0.4,
                   solver_iters: int = 200) -> PyTree:
    """Conflict-averse gradient on the shared subtree (reference :509-543).
    min_w  w^T A b + c*||g_w||  over the simplex, solved by projected
    gradient descent on the Gram matrix (replaces scipy SLSQP)."""
    k = n_tasks
    gg = _gram(stacked_shared, k)
    g0_norm = jnp.sqrt(jnp.mean(gg) + 1e-8)
    cc = c * g0_norm + 1e-8
    b = jnp.ones((k,), jnp.float32) / k

    def pgd_step(w, lr):
        gw_norm = jnp.sqrt(w @ gg @ w + 1e-8)
        grad = gg @ b + cc * (gg @ w) / gw_norm
        return _simplex_project(w - lr * grad), None

    lrs = 0.2 / (1.0 + jnp.arange(solver_iters, dtype=jnp.float32) * 0.05)
    w, _ = jax.lax.scan(pgd_step, b, lrs)

    gw = _weighted_sum(stacked_shared, w)
    gw_norm = _global_norm(gw)
    lmbda = cc / (gw_norm + 1e-8)
    mean_w = jnp.ones((k,), jnp.float32) / k
    g_mean = _weighted_sum(stacked_shared, mean_w)
    scale = float(k) / (1.0 + c**2)  # rescale=1 then *n_tasks (reference :538,564)
    return jax.tree_util.tree_map(
        lambda gm, gwl: scale * (gm + lmbda.astype(gm.dtype) * gwl), g_mean, gw
    )


# ---------------------------------------------------------------------------
# top-level combine
# ---------------------------------------------------------------------------

def combine_grads(
    method: MTOMethod,
    state: MTOState,
    rng: Array,
    losses: Array,
    stacked_grads: PyTree,
    labels: PyTree,
):
    """Combine per-task gradients into one update direction.

    Args:
      stacked_grads: full-params pytree, each leaf with leading axis K.
      labels: same-structure pytree of 'shared' | 'task' | 'unassigned'.
    Returns: (grad pytree, new_state, reported task weights).
    """
    k = method.n_tasks
    shared_stack = _masked(stacked_grads, labels, "shared")

    if method.kind == "weighting":
        eff_w, rep_w, new_state = _weights_and_state(
            method, state, rng, losses, gram_fn=lambda: _gram(shared_stack, k)
        )
        grad = _weighted_sum(stacked_grads, eff_w)
        if method.name == "nashmtl" and method.nash_max_norm > 0:
            # clip only the shared-subtree global norm (reference :264-266)
            norm = _global_norm(_masked(grad, labels, "shared"))
            clip = jnp.minimum(1.0, method.nash_max_norm / (norm + 1e-6))
            grad = jax.tree_util.tree_map(
                lambda lab, g: g * clip.astype(g.dtype) if lab == "shared" else g,
                labels, grad,
            )
        new_state = new_state.replace(step=state.step + 1)
        return grad, new_state, rep_w

    # --- surgery ---
    if method.name == "pcgrad":
        shared = _pcgrad_shared(rng, shared_stack, k)
        task_sum = _weighted_sum(
            _masked(stacked_grads, labels, "task"), jnp.ones((k,), jnp.float32)
        )
        rest = _weighted_sum(
            _masked(stacked_grads, labels, "unassigned"),
            jnp.ones((k,), jnp.float32)
            if method.train_unassigned
            else jnp.zeros((k,), jnp.float32),
        )
        grad = _merge_by_label(labels, shared, task_sum, rest)
        return grad, state.replace(step=state.step + 1), jnp.ones((k,)) / k

    if method.name == "cagrad":
        shared = _cagrad_shared(shared_stack, k, c=method.cagrad_c)
        zero_w = (
            jnp.ones((k,), jnp.float32)
            if method.train_unassigned
            else jnp.zeros((k,), jnp.float32)
        )
        task_g = _weighted_sum(_masked(stacked_grads, labels, "task"), zero_w)
        rest = _weighted_sum(_masked(stacked_grads, labels, "unassigned"), zero_w)
        grad = _merge_by_label(labels, shared, task_g, rest)
        return grad, state.replace(step=state.step + 1), jnp.ones((k,)) / k

    raise KeyError(method.name)
