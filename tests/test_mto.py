"""MTO gradient-surgery tests on toy problems with known solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from mtd_gan_tpu.mto import methods as mto


def _labels_like(tree, label="shared"):
    return jax.tree_util.tree_map(lambda _: label, tree)


def _stack(grads_list):
    return jax.tree_util.tree_map(lambda *gs: jnp.stack(gs), *grads_list)


def test_per_task_grads():
    def loss_fn(p):
        return jnp.stack([jnp.sum(p**2), jnp.sum(p), 3.0 * p[0]]), None

    p = jnp.array([1.0, 2.0])
    losses, stacked, _ = mto.per_task_grads(loss_fn, p, 3)
    np.testing.assert_allclose(losses, [5.0, 3.0, 3.0])
    np.testing.assert_allclose(stacked, [[2.0, 4.0], [1.0, 1.0], [3.0, 0.0]])


def test_per_task_grads_pruned_matches_vmap():
    """The DCE-friendly K-grad backend returns identical (losses, stacked,
    aux) to the vmapped basis pullback."""
    def loss_fn(p):
        return (jnp.stack([jnp.sum(p["a"] ** 2), jnp.sum(p["b"]),
                           3.0 * p["a"][0] + p["b"][1]]),
                {"detail": jnp.sum(p["a"])})

    p = {"a": jnp.array([1.0, 2.0]), "b": jnp.array([3.0, 4.0])}
    l1, s1, a1 = mto.per_task_grads(loss_fn, p, 3)
    l2, s2, a2 = mto.per_task_grads_pruned(loss_fn, p, 3)
    np.testing.assert_allclose(l1, l2)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(x, y), s1, s2)
    np.testing.assert_allclose(a1["detail"], a2["detail"])


def test_pcgrad_projection_two_tasks():
    """Conflicting 2-task case with known projection: g1=(1,0), g2=(-1,1).
    dot = -1 < 0: g1' = g1 - (-1/2)g2 = (0.5, 0.5); g2' = g2 - (-1/1)g1 = (0,1).
    merged = (0.5, 1.5)."""
    g1, g2 = jnp.array([1.0, 0.0]), jnp.array([-1.0, 1.0])
    stacked = _stack([g1, g2])
    out = mto._pcgrad_shared(jax.random.PRNGKey(0), stacked, 2)
    np.testing.assert_allclose(np.asarray(out), [0.5, 1.5], atol=1e-6)


def test_pcgrad_no_conflict_is_sum():
    g1, g2 = jnp.array([1.0, 0.0]), jnp.array([0.5, 1.0])
    out = mto._pcgrad_shared(jax.random.PRNGKey(0), _stack([g1, g2]), 2)
    np.testing.assert_allclose(np.asarray(out), [1.5, 1.0], atol=1e-6)


def test_cagrad_matches_scipy_reference():
    """Our projected-gradient simplex solve should match scipy SLSQP on the
    same CAGrad objective (the reference uses scipy, weight_methods.py:509-543)."""
    rng = np.random.default_rng(1)
    G = rng.standard_normal((3, 64)).astype(np.float32)  # K x dim
    stacked = jnp.asarray(G)

    out = mto._cagrad_shared(stacked, 3, c=0.4, solver_iters=400)

    GG = G @ G.T
    g0_norm = np.sqrt(GG.mean() + 1e-8)
    c = 0.4 * g0_norm + 1e-8
    b = np.ones(3) / 3

    def obj(x):
        return x @ GG @ b + c * np.sqrt(x @ GG @ x + 1e-8)

    res = scipy.optimize.minimize(
        obj, b, bounds=[(0, 1)] * 3,
        constraints={"type": "eq", "fun": lambda x: 1 - x.sum()},
    )
    w = res.x
    gw = G.T @ w
    lmbda = c / (np.linalg.norm(gw) + 1e-8)
    want = (G.mean(0) + lmbda * gw) * 3 / (1 + 0.4**2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=1e-3)


def test_mgda_min_norm_two_opposing():
    """min-norm point between g1=(2,0) and g2=(-1,0) is 0 at w=(1/3,2/3);
    weights scaled by n_tasks=2 -> (2/3, 4/3)."""
    method = mto.get_method("mgda", n_tasks=2)
    state = method.init_state()
    stacked = _stack([jnp.array([2.0, 0.0]), jnp.array([-1.0, 0.0])])
    labels = _labels_like(stacked)
    losses = jnp.array([1.0, 1.0])
    grad, _, w = mto.combine_grads(
        method, state, jax.random.PRNGKey(0), losses, stacked, labels
    )
    np.testing.assert_allclose(np.asarray(w), [2 / 3, 4 / 3], atol=1e-3)
    np.testing.assert_allclose(np.asarray(grad), [0.0, 0.0], atol=1e-3)


def test_nashmtl_fixed_point():
    """The Nash bargaining alpha satisfies (G^T G / ||G^T G||) a = 1/a."""
    method = mto.get_method("nashmtl", n_tasks=3)
    state = method.init_state()
    rng = np.random.default_rng(2)
    G = rng.standard_normal((3, 32)).astype(np.float32)
    stacked = jnp.asarray(G)
    labels = _labels_like(stacked)
    losses = jnp.array([1.0, 2.0, 3.0])
    grad, new_state, alpha = mto.combine_grads(
        method, state, jax.random.PRNGKey(0), losses, stacked, labels
    )
    gtg = G @ G.T
    gtg = gtg / np.linalg.norm(gtg)
    resid = gtg @ np.asarray(alpha) - 1.0 / np.asarray(alpha)
    assert np.abs(resid).max() < 1e-3
    # shared-grad norm clipped to 1.0
    assert float(jnp.linalg.norm(grad)) <= 1.0 + 1e-5


def test_weighting_methods_basic():
    stacked = _stack([jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])])
    labels = _labels_like(stacked)
    losses = jnp.array([2.0, 4.0])
    rng = jax.random.PRNGKey(0)

    for name, want in [
        ("ls", [1.0, 1.0]),
        ("scaleinvls", [0.5, 0.25]),  # effective grad weights 1/L_i
        ("stl", [1.0, 0.0]),
    ]:
        method = mto.get_method(name, n_tasks=2)
        grad, _, _ = mto.combine_grads(
            method, method.init_state(), rng, losses, stacked, labels
        )
        np.testing.assert_allclose(np.asarray(grad), want, atol=1e-6)

    # uw: effective weights 0.5*exp(-logsigma) = 0.5 at init
    method = mto.get_method("uw", n_tasks=2)
    grad, _, _ = mto.combine_grads(
        method, method.init_state(), rng, losses, stacked, labels
    )
    np.testing.assert_allclose(np.asarray(grad), [0.5, 0.5], atol=1e-6)
    # logsigma gradient: 0.5*(1 - exp(-s)*l)
    lg = mto.uw_logsigma_grad(method.init_state(), losses)
    np.testing.assert_allclose(np.asarray(lg), [0.5 * (1 - 2), 0.5 * (1 - 4)])

    # rlw: weights on the simplex
    method = mto.get_method("rlw", n_tasks=2)
    _, _, w = mto.combine_grads(
        method, method.init_state(), rng, losses, stacked, labels
    )
    assert abs(float(jnp.sum(w)) - 1.0) < 1e-5

    # dwa: before window fills, weights stay 1 -> grads = sum/K
    method = mto.get_method("dwa", n_tasks=2)
    grad, new_state, w = mto.combine_grads(
        method, method.init_state(), rng, losses, stacked, labels
    )
    np.testing.assert_allclose(np.asarray(w), [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(grad), [0.5, 0.5], atol=1e-6)
    assert float(new_state.costs[-1, 1]) == 4.0


def test_imtl_weights_sum_to_one():
    rng_np = np.random.default_rng(3)
    G = rng_np.standard_normal((3, 16)).astype(np.float32)
    stacked = jnp.asarray(G)
    labels = _labels_like(stacked)
    method = mto.get_method("imtl", n_tasks=3)
    grad, _, alpha = mto.combine_grads(
        method, method.init_state(), jax.random.PRNGKey(0),
        jnp.array([1.0, 1.0, 1.0]), stacked, labels,
    )
    assert abs(float(jnp.sum(alpha)) - 1.0) < 1e-4
    # IMTL-G property: the combined gradient has equal projections onto all
    # normalized task gradients.
    g = np.asarray(grad)
    projs = [g @ (G[i] / np.linalg.norm(G[i])) for i in range(3)]
    assert np.ptp(projs) < 1e-3


def test_partition_semantics():
    """pcgrad: task params get sum of grads; unassigned get zero (reference
    quirk: c_fc is trained by neither partition, weight_methods.py:429-447)."""
    stacked = {
        "a": jnp.stack([jnp.array([1.0]), jnp.array([2.0])]),
        "b": jnp.stack([jnp.array([3.0]), jnp.array([4.0])]),
        "c": jnp.stack([jnp.array([5.0]), jnp.array([6.0])]),
    }
    labels = {"a": "shared", "b": "task", "c": "unassigned"}
    method = mto.get_method("pcgrad", n_tasks=2)
    grad, _, _ = mto.combine_grads(
        method, method.init_state(), jax.random.PRNGKey(0),
        jnp.array([1.0, 1.0]), stacked, labels,
    )
    np.testing.assert_allclose(np.asarray(grad["a"]), [3.0])  # no conflict -> sum
    np.testing.assert_allclose(np.asarray(grad["b"]), [7.0])
    np.testing.assert_allclose(np.asarray(grad["c"]), [0.0])

    # cagrad: only shared trained
    method = mto.get_method("cagrad", n_tasks=2)
    grad, _, _ = mto.combine_grads(
        method, method.init_state(), jax.random.PRNGKey(0),
        jnp.array([1.0, 1.0]), stacked, labels,
    )
    assert float(grad["b"][0]) == 0.0 and float(grad["c"][0]) == 0.0
    assert float(grad["a"][0]) != 0.0
