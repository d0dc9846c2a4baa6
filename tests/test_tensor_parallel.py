"""Tensor-parallel generator vs the single-device forward (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator
from mtd_gan_tpu.parallel.tensor import tp_generate


@pytest.fixture(scope="module")
def small_gen():
    gen = ResFFTGenerator(in_channels=1, features=8, num_layers=2)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))[
        "params"]
    return gen, params


def test_tp_generator_matches_single_device(small_gen):
    gen, params = small_gen
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 1))
    ref = gen.apply({"params": params}, x)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))
    got = tp_generate(params, x, mesh, num_layers=2, features=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_composes_with_data_axis(small_gen):
    """2-D ('data', 'model') mesh: batch sharded over data, channels over
    model — the DP x TP composition the brief's mesh design calls for."""
    gen, params = small_gen
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 16, 16, 1))
    ref = gen.apply({"params": params}, x)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    got = tp_generate(params, x, mesh, num_layers=2, features=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_tp_is_differentiable(small_gen):
    """psum_scatter/psum are linear; grads must flow through the TP forward
    (enables TP training, not just inference)."""
    gen, params = small_gen
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 1))
    y = jnp.clip(x + 0.05, 0, 1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("model",))

    def loss_tp(p):
        return jnp.mean((tp_generate(p, x, mesh, num_layers=2, features=8)
                         - y) ** 2)

    def loss_ref(p):
        return jnp.mean((gen.apply({"params": p}, x) - y) ** 2)

    g_tp = jax.grad(loss_tp)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_tp = jax.tree_util.tree_leaves(g_tp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    for a, b in zip(flat_tp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
