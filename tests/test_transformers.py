"""CTformer / Restormer tests: unfold/fold torch parity, geometry, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from mtd_gan_tpu.ops.unfold import fold, unfold


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def test_unfold_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    for kernel, stride, dil in [((7, 7), (2, 2), (1, 1)),
                                ((3, 3), (1, 1), (2, 2)),
                                ((3, 3), (1, 1), (1, 1))]:
        got = unfold(jnp.asarray(x), kernel, stride, dil)
        want = TF.unfold(_nchw(x), kernel, dilation=dil, stride=stride)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_fold_matches_torch(np_rng):
    for out, kernel, stride, dil in [((16, 16), (7, 7), (2, 2), (1, 1)),
                                     ((13, 13), (3, 3), (1, 1), (2, 2)),
                                     ((9, 9), (3, 3), (1, 1), (1, 1))]:
        kh, kw = kernel
        lh = (out[0] - dil[0] * (kh - 1) - 1) // stride[0] + 1
        lw = (out[1] - dil[1] * (kw - 1) - 1) // stride[1] + 1
        p = np_rng.standard_normal((2, 3 * kh * kw, lh * lw)).astype(np.float32)
        got = fold(jnp.asarray(p), out, kernel, stride, dil)
        want = TF.fold(torch.from_numpy(p), out, kernel, dilation=dil, stride=stride)
        np.testing.assert_allclose(
            np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-5
        )


def test_fold_unfold_adjoint(np_rng):
    """<unfold(x), p> == <x, fold(p)> — fold is the exact adjoint."""
    x = jnp.asarray(np_rng.standard_normal((1, 12, 12, 2)).astype(np.float32))
    u = unfold(x, (3, 3), (2, 2))
    p = jnp.asarray(np_rng.standard_normal(u.shape).astype(np.float32))
    lhs = jnp.vdot(u, p)
    rhs = jnp.vdot(x, fold(p, (12, 12), (3, 3), (2, 2)))
    assert abs(float(lhs - rhs)) < 1e-3


def test_ctformer_shapes_and_loss(rng):
    from mtd_gan_tpu.models.ctformer import CTformerModel

    model = CTformerModel()
    params = model.init(rng)
    x = jax.random.uniform(rng, (2, 64, 64, 1))
    out = model.apply(params, x)
    assert out.shape == x.shape
    loss, det = model.loss(params, x, x, rng=rng)
    # reference scaling: mse*100 + 1e-4
    assert abs(float(loss) - (float(det["mse"]) * 100 + 1e-4)) < 1e-6


def test_restormer_shapes_and_loss(rng):
    from mtd_gan_tpu.models.restormer import RestormerModel

    # tiny config for CPU test speed
    model = RestormerModel(dim=8, num_blocks=(1, 1, 1, 1),
                           num_refinement_blocks=1, heads=(1, 2, 4, 8))
    params = model.init(rng)
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    out = model.apply(params, x)
    assert out.shape == x.shape
    loss, _ = model.loss(params, x, x)
    assert np.isfinite(float(loss))


def test_pixel_unshuffle_matches_torch(np_rng):
    from mtd_gan_tpu.models.restormer import pixel_unshuffle

    x = np_rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    got = pixel_unshuffle(jnp.asarray(x), 2)
    want = TF.pixel_unshuffle(_nchw(x), 2).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_channel_layernorm_matches_torch_semantics(np_rng):
    from mtd_gan_tpu.models.restormer import ChannelLayerNorm

    x = np_rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
    ln = ChannelLayerNorm(bias_free=True)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = ln.apply(params, jnp.asarray(x))
    want = x / np.sqrt(x.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
