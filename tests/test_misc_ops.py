"""WindowConv2D presets, attention blocks, profiling utils, TB sink."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mtd_gan_tpu.ops.attention import SCSEModule, SkipAttentionBlock
from mtd_gan_tpu.ops.window_conv import (WINDOW_PRESET_BIASES,
                                         WINDOW_PRESET_WEIGHTS, WindowConv2D)
from mtd_gan_tpu.utils.logging import TensorBoardSink
from mtd_gan_tpu.utils.profiling import StepTimer


def test_window_conv_presets(rng):
    wc = WindowConv2D(mode="relu")
    x = jnp.linspace(0, 1, 11).reshape(1, 1, 11, 1)
    params = wc.init(rng, x)
    out = wc.apply(params, x)
    assert out.shape == (1, 1, 11, 5)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # brain preset ramp: 50x - 12.5 crosses 0.5 at x = 0.26
    center = wc.apply(params, jnp.full((1, 1, 1, 1), 0.26))
    assert abs(float(center[0, 0, 0, 0]) - 0.5) < 0.01
    w = params["params"]["weight"]
    np.testing.assert_allclose(np.asarray(w[0]), WINDOW_PRESET_WEIGHTS)
    np.testing.assert_allclose(
        np.asarray(params["params"]["bias"]), WINDOW_PRESET_BIASES
    )
    # sigmoid mode
    out_s = WindowConv2D(mode="sigmoid").apply(params, x)
    # sigmoid saturates to 1.0 in fp32 at these weights; just bounds
    assert float(out_s.min()) >= 0.0 and float(out_s.max()) <= 1.0


def test_attention_blocks(rng):
    x = jax.random.uniform(rng, (1, 16, 16, 8))
    g = jax.random.uniform(rng, (1, 16, 16, 8))
    att = SkipAttentionBlock(inter_channels=4)
    params = att.init(rng, x, g)
    out = att.apply(params, x, g)
    assert out.shape == x.shape
    scse = SCSEModule(reduction=4)
    params = scse.init(rng, x)
    assert scse.apply(params, x).shape == x.shape


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 5 and s["mean_s"] >= 0


def test_tensorboard_sink(tmp_path):
    tb = TensorBoardSink(str(tmp_path))
    tb.scalars({"loss": 1.0, "skip_me": "str"}, step=0)
    tb.close()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_upsample2x_bilinear_matches_jax_image_resize():
    """ops/upsample.py is an exact-equivalent lowering of 2x bilinear
    resize (half-pixel centers) — the fixed 2-tap stencil must match
    jax.image.resize everywhere, edges included."""
    from mtd_gan_tpu.ops.upsample import upsample2x_bilinear

    rng = jax.random.PRNGKey(7)
    for shape in ((2, 4, 4, 3), (1, 1, 1, 2), (3, 5, 2, 1), (1, 16, 16, 8)):
        x = jax.random.normal(rng, shape)
        n, h, w, c = shape
        want = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
        got = upsample2x_bilinear(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_conv_tuple_input_matches_concat():
    """Conv((a, b)) == Conv(concat([a, b], -1)): same params, same math
    (kernel channel slices summed), incl. under spectral norm, and the
    gradients agree — the tuple path only removes the concat/split."""
    from mtd_gan_tpu.ops.layers import Conv

    rng = jax.random.PRNGKey(3)
    ra, rb, ri = jax.random.split(rng, 3)
    a = jax.random.normal(ra, (2, 8, 8, 5))
    b = jax.random.normal(rb, (2, 8, 8, 3))
    for sn in (False, True):
        conv = Conv(6, kernel_size=(3, 3), padding=1, spectral_norm=sn)
        variables = conv.init(ri, jnp.concatenate([a, b], axis=-1))

        def f_cat(v, a, b):
            return conv.apply(v, jnp.concatenate([a, b], axis=-1),
                              mutable=["spectral"] if sn else [])[0]

        def f_tup(v, a, b):
            return conv.apply(v, (a, b),
                              mutable=["spectral"] if sn else [])[0]

        np.testing.assert_allclose(
            np.asarray(f_tup(variables, a, b)),
            np.asarray(f_cat(variables, a, b)), rtol=1e-5, atol=1e-5)

        g_cat = jax.grad(lambda v, a, b: jnp.sum(f_cat(v, a, b) ** 2),
                         argnums=(0, 1, 2))(variables, a, b)
        g_tup = jax.grad(lambda v, a, b: jnp.sum(f_tup(v, a, b) ** 2),
                         argnums=(0, 1, 2))(variables, a, b)
        for gc, gt in zip(jax.tree_util.tree_leaves(g_cat),
                          jax.tree_util.tree_leaves(g_tup)):
            np.testing.assert_allclose(np.asarray(gt), np.asarray(gc),
                                       rtol=1e-4, atol=2e-5)
