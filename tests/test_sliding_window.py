"""Sliding-window tiler invariants (SURVEY.md §4: tiled(identity) == identity;
overlap blending normalizes to 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.ops.sliding_window import (
    dense_patch_positions,
    gaussian_importance_map,
    sliding_window_inference,
)


def test_dense_positions_cover_and_clamp():
    pos = dense_patch_positions(512, 64, 0.3)
    assert pos[0] == 0 and pos[-1] == 512 - 64
    assert all(np.diff(pos) > 0)
    # full coverage
    covered = np.zeros(512, bool)
    for p in pos:
        covered[p : p + 64] = True
    assert covered.all()


def test_identity_predictor_roundtrip(rng):
    x = jax.random.uniform(rng, (2, 128, 128, 1))
    for overlap in [0.25, 0.5]:
        for mode in ["constant", "gaussian"]:
            out = sliding_window_inference(
                x, (64, 64), lambda t: t, sw_batch_size=8,
                overlap=overlap, mode=mode,
            )
            np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_non_divisible_size(rng):
    # 100x100 with 64-tiles: last tile clamps to edge; identity must hold
    x = jax.random.uniform(rng, (1, 100, 100, 1))
    out = sliding_window_inference(x, (64, 64), lambda t: t, overlap=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_small_input_padded(rng):
    x = jax.random.uniform(rng, (1, 32, 32, 1))
    out = sliding_window_inference(x, (64, 64), lambda t: t, overlap=0.5)
    assert out.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_multi_output_predictor(rng):
    """(cls, seg, rec) contract of module/sliding_window.py: spatial outputs
    blended, per-tile vectors averaged."""
    x = jax.random.uniform(rng, (1, 128, 128, 1))

    def predictor(tiles):
        cls = jnp.mean(tiles, axis=(1, 2, 3), keepdims=False)[:, None]  # (B,1)
        return cls, tiles * 2.0, tiles + 1.0

    cls, seg, rec = sliding_window_inference(
        x, (64, 64), predictor, overlap=0.5, mode="gaussian"
    )
    # reference parity: CLS stays per-tile (torch.concat(cls_list),
    # module/sliding_window.py:126) -> (N, T, 1)
    assert cls.ndim == 3 and cls.shape[0] == 1 and cls.shape[2] == 1
    np.testing.assert_allclose(np.asarray(seg), np.asarray(x) * 2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x) + 1, atol=1e-5)
    assert abs(float(jnp.mean(cls)) - float(jnp.mean(x))) < 0.05


def test_gaussian_importance_map():
    m = gaussian_importance_map((64, 64))
    assert m.shape == (64, 64)
    assert float(m.max()) == 1.0
    assert float(m[0, 0]) < float(m[31, 31])


def test_mesh_sharded_tiles(rng):
    """Tile batch sharded over the data mesh axis still reconstructs
    exactly (spatial-SP analogue)."""
    from mtd_gan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    x = jax.random.uniform(rng, (1, 128, 128, 1))

    @jax.jit
    def run(z):
        return sliding_window_inference(
            z, (64, 64), lambda t: t * 3.0, overlap=0.5, mesh=mesh
        )

    with mesh:
        out = run(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 3, atol=1e-5)
