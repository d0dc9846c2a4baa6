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
