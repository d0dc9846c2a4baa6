"""Model-level tests: shapes, loss finiteness, partitions (small configs on
the CPU backend; full-size configs exercised on TPU by bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.models.base import param_labels
from mtd_gan_tpu.models.mtd_gan import (
    MTDGANModel,
    MultiTaskDiscriminator,
    ResFFTGenerator,
    d_param_label,
)
from mtd_gan_tpu.models.red_cnn import REDCNNModel


def test_redcnn_shapes(rng):
    model = REDCNNModel(out_ch=16)
    params = model.init(rng)
    x = jax.random.uniform(rng, (2, 64, 64, 1))
    y = model.apply(params, x)
    assert y.shape == (2, 64, 64, 1)
    assert bool(jnp.all(y >= 0))  # final ReLU
    loss, _ = model.loss(params, x, x)
    assert np.isfinite(float(loss))


def test_resfft_generator_shape_and_residual(rng):
    gen = ResFFTGenerator(features=8, num_layers=2)
    x = jax.random.uniform(rng, (1, 32, 32, 1))
    params = gen.init(rng, x)["params"]
    y = gen.apply({"params": params}, x)
    assert y.shape == x.shape
    # 2 encoder + 1 bottleneck convs, 3 deconvs, 5 fft blocks for num_layers=2
    names = set(params.keys())
    assert {"enc_0", "enc_1", "enc_2", "dec_0", "dec_1", "dec_2"} <= names
    assert sum(1 for n in names if n.startswith("fft_")) == 5


def test_discriminator_heads(rng):
    disc = MultiTaskDiscriminator(features=8)
    x = jax.random.uniform(rng, (2, 64, 64, 1))
    variables = disc.init(rng, x, train=False)
    (cls, seg, rec), mutated = disc.apply(
        variables, x, train=True, update_stats=True,
        rngs={"dropout": rng}, mutable=["spectral"],
    )
    assert cls.shape == (2, 1)
    assert seg.shape == (2, 64, 64, 1)
    assert rec.shape == (2, 64, 64, 1)
    # spectral state must actually update
    u_before = variables["spectral"]["conv11"]["u"]
    u_after = mutated["spectral"]["conv11"]["u"]
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))


def test_mtd_gan_losses_finite(rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=2)
    gv = model.init(rng)
    x = jax.random.uniform(rng, (1, 64, 64, 1))
    y = jnp.clip(x + 0.05, 0, 1)

    d_losses, (new_state, d_details) = model.d_loss(
        gv.params_d, gv.params_g, gv.state_d, rng, x, y
    )
    assert d_losses.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(d_losses)))
    assert len(d_details) == 10

    g_total, (_, g_details) = model.g_loss(
        gv.params_g, gv.params_d, gv.state_d, rng, x, y
    )
    assert np.isfinite(float(g_total))
    assert len(g_details) == 4


def test_d_param_partition(rng):
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=2)
    gv = model.init(rng)
    labels = param_labels(gv.params_d, d_param_label)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    counts = {"shared": 0, "task": 0, "unassigned": 0}
    for path, lab in flat:
        counts[lab] += 1
        top = path[0].key
        if top == "c_fc":
            assert lab == "unassigned"  # reference quirk, see mtd_gan.py
        if top.startswith(("conv", "down", "bconv")):
            assert lab == "shared"
    assert counts["shared"] > 0 and counts["task"] > 0
    # only c_fc (kernel + bias) is unassigned
    assert counts["unassigned"] == 2


def test_discriminator_full_image_inference(rng):
    """Multi-output sliding-window D inference on a 128x128 slice."""
    model = MTDGANModel(gen_features=4, disc_features=4, num_layers=1)
    gv = model.init(rng)
    x = jax.random.uniform(rng, (1, 128, 128, 1))
    cls, seg, rec = model.discriminate_full(gv.params_d, gv.state_d, x,
                                            sw_batch_size=8)
    # per-tile CLS logits (reference module/sliding_window.py:126)
    assert cls.ndim == 3 and cls.shape[0] == 1 and cls.shape[2] == 1
    assert seg.shape == (1, 128, 128, 1)
    assert rec.shape == (1, 128, 128, 1)
    assert bool(jnp.all(jnp.isfinite(seg)))


def test_packed_generator_matches_standard(rng):
    """Lane-packed grouped-conv inference == standard ResFFTGenerator on
    the same params (4 slices packed into channels)."""
    import jax.numpy as jnp
    import numpy as np

    from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator
    from mtd_gan_tpu.models.packed import packed_resfft_apply

    gen = ResFFTGenerator(features=8, num_layers=2)
    x = jax.random.uniform(rng, (4, 32, 32, 1), jnp.float32)
    params = jax.jit(gen.init)(rng, x)["params"]
    want = gen.apply({"params": params}, x)
    got = packed_resfft_apply(params, x, features=8, num_layers=2,
                              groups=4, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
