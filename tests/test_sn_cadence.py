"""Bound the train-mode SN power-iteration cadence deviation (VERDICT r2
weak #5 / r3 item 7).

The reference applies the discriminator FOUR times per d_loss step
(arch/Ours/networks.py:1957-1977), advancing every spectral-norm u vector
4x per step; our pair-batched d_loss (models/mtd_gan.py) applies it twice
on concatenated 2B batches, advancing u 2x per step. The power iteration
operates on the WEIGHTS only (ops/layers.py _SpectralMixin) — inputs never
enter the u update — so both cadences walk the same iteration at different
rates toward the same fixed point (the dominant singular pair). This test
makes the PARITY.md cadence note a checked property:

1. after N train steps, the 2x-cadence sigmas are within a stated bound of
   the 4x-cadence sigmas and of the true sigma_max (SVD);
2. discriminator OUTPUTS under the two states agree to a stated bound;
3. at the fixed point (converged u), one extra iteration is a no-op, so
   the cadences are exactly equivalent asymptotically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mtd_gan_tpu.models.mtd_gan import MultiTaskDiscriminator


def _advance(disc, params, sp, x, times):
    """Apply disc `times` times with update_stats=True, threading state."""
    for _ in range(times):
        _, mut = disc.apply(
            {"params": params, "spectral": sp}, x, train=False,
            update_stats=True, mutable=["spectral"],
        )
        sp = mut["spectral"]
    return sp


def _sigmas(params, sp):
    """Power-iteration sigma estimate per SN layer, plus true sigma_max."""
    out = {}
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = {
        tuple(str(k.key) for k in path[:-1]): leaf
        for path, leaf in flat_p
        if str(path[-1].key) == "kernel"
    }
    flat_u = jax.tree_util.tree_flatten_with_path(sp)[0]
    for path, u in flat_u:
        mod = tuple(str(k.key) for k in path[:-1])
        w = kernels[mod]
        if w.ndim == 4:
            w_mat = np.asarray(w).transpose(3, 0, 1, 2).reshape(w.shape[-1], -1)
        else:
            w_mat = np.asarray(w).T  # Dense stores (in, out)
        u = np.asarray(u)
        v = w_mat.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        u2 = w_mat @ v
        u2 = u2 / (np.linalg.norm(u2) + 1e-12)
        sigma_est = float(u2 @ w_mat @ v)
        sigma_true = float(np.linalg.svd(w_mat, compute_uv=False)[0])
        out[mod] = (sigma_est, sigma_true)
    return out


def test_pair_batched_cadence_matches_four_forward():
    disc = MultiTaskDiscriminator(in_channels=1, features=8)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 1))
    variables = jax.jit(lambda r, z: disc.init(r, z, train=False))(rng, x)
    params, sp0 = variables["params"], variables["spectral"]

    n_steps = 10
    sp4 = _advance(disc, params, sp0, x, 4 * n_steps)   # reference cadence
    sp2 = _advance(disc, params, sp0, x, 2 * n_steps)   # pair-batched cadence

    s4 = _sigmas(params, sp4)
    s2 = _sigmas(params, sp2)
    for mod in s4:
        est4, true = s4[mod]
        est2, _ = s2[mod]
        # both cadences near the true sigma_max, and near each other
        assert abs(est4 - true) / true < 0.05, (mod, est4, true)
        assert abs(est2 - true) / true < 0.05, (mod, est2, true)
        # the cadences differ only in convergence rate; after N steps they
        # agree to a few percent (both already within 5% of truth)
        assert abs(est2 - est4) / true < 0.04, (mod, est2, est4)

    # outputs under the two spectral states agree closely
    o4 = disc.apply({"params": params, "spectral": sp4}, x, train=False,
                    update_stats=False)
    o2 = disc.apply({"params": params, "spectral": sp2}, x, train=False,
                    update_stats=False)
    for a, b in zip(jax.tree_util.tree_leaves(o4),
                    jax.tree_util.tree_leaves(o2)):
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2


def test_batched_advance_matches_per_layer():
    """advance_spectral_state(batched=True) — one padded-group contraction
    per iteration instead of ~88 tiny matvecs (r5 step lever) — must match
    the per-layer oracle path: zero-padding the fan-in is mathematically
    exact for both the products and the L2 norms."""
    from mtd_gan_tpu.ops.layers import advance_spectral_state

    disc = MultiTaskDiscriminator(in_channels=1, features=8)
    variables = jax.jit(lambda r, z: disc.init(r, z, train=False))(
        jax.random.PRNGKey(4), jax.random.uniform(
            jax.random.PRNGKey(5), (1, 64, 64, 1)))
    params, sp = variables["params"], variables["spectral"]

    sp_b = jax.jit(lambda p, s: advance_spectral_state(
        p, s, n_iters=4, batched=True))(params, sp)
    sp_o = jax.jit(lambda p, s: advance_spectral_state(
        p, s, n_iters=4, batched=False))(params, sp)
    for a, b in zip(jax.tree_util.tree_leaves(sp_b),
                    jax.tree_util.tree_leaves(sp_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_cadence_noop_at_fixed_point():
    """Once u has converged, one more power iteration changes nothing —
    the 2x and 4x cadences share the same fixed point exactly."""
    disc = MultiTaskDiscriminator(in_channels=1, features=8)
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 1))
    variables = jax.jit(lambda r, z: disc.init(r, z, train=False))(rng, x)
    params, sp = variables["params"], variables["spectral"]
    sp = _advance(disc, params, sp, x, 200)             # converge
    sp_more = _advance(disc, params, sp, x, 2)          # extra iterations
    for a, b in zip(jax.tree_util.tree_leaves(sp),
                    jax.tree_util.tree_leaves(sp_more)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-3)
