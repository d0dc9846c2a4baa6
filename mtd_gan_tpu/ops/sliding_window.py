"""On-device overlap-tile (sliding-window) inference.

Reference behavior: MONAI sliding_window_inference (engine.py:345,378,835 —
CTformer/Restormer/diffusion eval reconstruct 512x512 slices from 64x64
tiles, overlap 0.3/0.5/0.9) and the multi-output local generalization
(module/sliding_window.py:25-786) that blends (cls, seg, rec) discriminator
outputs with constant or Gaussian importance maps + count-map normalization.

TPU-native design: tile coordinates are computed at trace time (static
shapes); gathering is a vmapped dynamic_slice; the predictor runs over
sw_batch-sized tile chunks under lax.map (one compiled body regardless of
tile count); recombination is a lax.scan of additive dynamic_update_slices —
the whole thing is ONE XLA program with zero host round-trips, vs the
reference's per-chunk Python loop through torch.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def scan_interval(image_size: int, roi: int, overlap: float) -> int:
    """MONAI scan-interval rule: roi*(1-overlap), at least 1, capped at roi."""
    if roi == image_size:
        return roi
    return max(1, min(int(roi * (1.0 - overlap)), roi))


def dense_patch_positions(image_size: int, roi: int, overlap: float) -> np.ndarray:
    """Static 1-D tile start positions; last tile clamped flush to the edge."""
    interval = scan_interval(image_size, roi, overlap)
    n = int(math.ceil((image_size - roi) / interval)) + 1 if image_size > roi else 1
    starts = [min(i * interval, image_size - roi) for i in range(n)]
    # dedupe while preserving order (clamping can repeat the final start)
    seen, out = set(), []
    for s in starts:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return np.asarray(out, dtype=np.int32)


def gaussian_importance_map(roi: Sequence[int], sigma_scale: float = 0.125) -> Array:
    """Centered Gaussian weighting over a tile (MONAI 'gaussian' mode)."""
    maps = []
    for size in roi:
        sigma = sigma_scale * size
        xs = np.arange(size) - (size - 1) / 2.0
        maps.append(np.exp(-0.5 * (xs / sigma) ** 2))
    m = np.outer(maps[0], maps[1]).astype(np.float32)
    m = m / m.max()
    return jnp.asarray(np.clip(m, np.finfo(np.float16).tiny, None))


def _tile_coords(h: int, w: int, roi: Tuple[int, int], overlap: float) -> np.ndarray:
    rs = dense_patch_positions(h, roi[0], overlap)
    cs = dense_patch_positions(w, roi[1], overlap)
    rr, cc = np.meshgrid(rs, cs, indexing="ij")
    return np.stack([rr.ravel(), cc.ravel()], axis=-1)  # (T, 2)


def sliding_window_inference(
    inputs: Array,
    roi_size: Tuple[int, int],
    predictor: Callable,
    sw_batch_size: int = 32,
    overlap: float = 0.25,
    mode: str = "constant",
    sigma_scale: float = 0.125,
    mesh=None,
):
    """Tiled inference over NHWC `inputs`.

    `predictor` maps (B, rh, rw, C) -> (B, rh, rw, C') or a tuple whose
    entries are either spatial tiles (importance-map-blended into full-size
    maps with count normalization) or per-tile vectors, e.g. CLS logits,
    which are returned UNAGGREGATED with shape (N, T, ...) — the reference
    concatenates per-tile CLS outputs rather than averaging them
    (module/sliding_window.py:126 `torch.concat(cls_list)`).
    Returns outputs matching the predictor's structure.
    """
    n, h, w, c = inputs.shape
    rh, rw = roi_size
    pad_h, pad_w = max(rh - h, 0), max(rw - w, 0)
    if pad_h or pad_w:
        inputs = jnp.pad(
            inputs,
            ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
             (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
        )
        n, h, w, c = inputs.shape

    coords = jnp.asarray(_tile_coords(h, w, (rh, rw), overlap))  # (T, 2)
    t = coords.shape[0]

    if mode == "gaussian":
        imap = gaussian_importance_map((rh, rw), sigma_scale)
    else:
        imap = jnp.ones((rh, rw), jnp.float32)

    # ---- gather tiles: (N*T, rh, rw, C) ----
    def gather_one(img, rc):
        return jax.lax.dynamic_slice(img, (rc[0], rc[1], 0), (rh, rw, c))

    tiles = jax.vmap(lambda img: jax.vmap(partial(gather_one, img))(coords))(inputs)
    tiles = tiles.reshape(n * t, rh, rw, c)

    # ---- predict in sw_batch chunks under lax.map (single compiled body);
    # with a mesh, the tile batch is sharded over the 'data' axis instead
    # (the spatial analogue of sequence parallelism — SURVEY.md §2.9) ----
    total = tiles.shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        padded = -(-total // n_dev) * n_dev
        if padded != total:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((padded - total, rh, rw, c), tiles.dtype)]
            )
        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P("data"))
        )
        preds = predictor(tiles)
        n_chunks, sw_batch_size = 1, padded
        preds = jax.tree_util.tree_map(lambda p: p[None], preds)
    else:
        n_chunks = -(-total // sw_batch_size)
        padded = n_chunks * sw_batch_size
        if padded != total:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((padded - total, rh, rw, c), tiles.dtype)]
            )
        chunks = tiles.reshape(n_chunks, sw_batch_size, rh, rw, c)
        preds = jax.lax.map(predictor, chunks)

    is_tuple = isinstance(preds, (tuple, list))
    preds_list = list(preds) if is_tuple else [preds]
    # un-chunk
    preds_list = [
        p.reshape(n_chunks * sw_batch_size, *p.shape[2:])[:total].reshape(
            n, t, *p.shape[2:]
        )
        for p in preds_list
    ]

    # ---- recombine ----
    outs = []
    w_sum = jnp.sum(imap)
    for p in preds_list:
        if p.ndim >= 4 and p.shape[-3] == rh and p.shape[-2] == rw:
            c_out = p.shape[-1]
            weighted = p * imap[None, None, :, :, None]

            def recombine(tiles_nt):
                out0 = jnp.zeros((h, w, c_out), jnp.float32)
                cnt0 = jnp.zeros((h, w, 1), jnp.float32)

                def body(carry, xs):
                    out, cnt = carry
                    tile, rc = xs
                    cur = jax.lax.dynamic_slice(out, (rc[0], rc[1], 0), (rh, rw, c_out))
                    out = jax.lax.dynamic_update_slice(out, cur + tile, (rc[0], rc[1], 0))
                    ccur = jax.lax.dynamic_slice(cnt, (rc[0], rc[1], 0), (rh, rw, 1))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, ccur + imap[:, :, None], (rc[0], rc[1], 0)
                    )
                    return (out, cnt), None

                (out, cnt), _ = jax.lax.scan(body, (out0, cnt0), (tiles_nt, coords))
                return out / cnt

            full = jax.vmap(recombine)(weighted.astype(jnp.float32))
            if pad_h or pad_w:
                full = full[:, pad_h // 2 : h - (pad_h - pad_h // 2),
                            pad_w // 2 : w - (pad_w - pad_w // 2)]
            outs.append(full.astype(p.dtype))
        else:
            # per-tile vector output (e.g. CLS logit): keep per-tile, (N, T, ...)
            # — reference returns the concatenated per-tile list unaggregated
            outs.append(p)

    return tuple(outs) if is_tuple else outs[0]
