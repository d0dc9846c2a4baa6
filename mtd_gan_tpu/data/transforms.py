"""Jittable, on-device preprocessing: windowing, patch sampling, augmentation.

The reference runs these per-sample in MONAI transform chains inside
DataLoader worker processes (create_datasets/Mayo.py:63-161). Here the host
only decodes DICOM to int16 HU; everything else is one fused, vmapped XLA
program over the whole batch on device — no per-sample Python.

Transform presets (exact parity, Mayo.py / Sinogram.py):
  full         : dicom_normalize([-1024,3072] -> [0,1]) + aug
  full_patch   : dicom_normalize + 8x random 64x64 crops + aug
  window       : HU window -> [0,1] + aug + per-image min-max rescale
  window_patch : HU window -> [0,1] + foreground crop (y>0) + pad(64)
                 + 8x random 64x64 crops + aug
  aug          : rot90 (k in 1..3), flip both axes, rotate U(-15deg,15deg)
                 bilinear keep-size — each with p=0.1
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

WINDOW_PRESETS = {
    "abdomen": (-160.0, 240.0),  # Mayo.py:104
    "brain": (0.0, 80.0),        # Sinogram.py:103
}

HU_MIN, HU_MAX = -1024.0, 3072.0


def dicom_normalize(x: Array) -> Array:
    """HU -> [0,1] over the full scanner range (reference Mayo.py:45-48)."""
    return (x - HU_MIN) / (HU_MAX - HU_MIN)


def dicom_denormalize(x: Array) -> Array:
    """[0,1] -> HU (reference utils.py:167-170)."""
    return x * (HU_MAX - HU_MIN) + HU_MIN


def scale_intensity_range(
    x: Array, a_min: float, a_max: float,
    b_min: float = 0.0, b_max: float = 1.0, clip: bool = True,
) -> Array:
    y = (x - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    return jnp.clip(y, b_min, b_max) if clip else y


def minmax_rescale(x: Array) -> Array:
    """Per-image min-max to [0,1] (MONAI ScaleIntensityd, used by the
    'window' train preset only, Mayo.py:119)."""
    lo = jnp.min(x, axis=(-3, -2, -1), keepdims=True)
    hi = jnp.max(x, axis=(-3, -2, -1), keepdims=True)
    return jnp.where(hi > lo, (x - lo) / (hi - lo + 1e-12), x)


# ---------------------------------------------------------------------------
# augmentation (paired: same transform on LD and FD slices)
# ---------------------------------------------------------------------------

def _rot90_pair(rng, x, y, prob=0.1, max_k=3):
    r_apply, r_k = jax.random.split(rng)
    k = jax.random.randint(r_k, (), 1, max_k + 1)
    apply = jax.random.uniform(r_apply) < prob

    def rot(k_, img):
        return jax.lax.switch(
            k_ - 1,
            [lambda a: jnp.rot90(a, 1, (0, 1)),
             lambda a: jnp.rot90(a, 2, (0, 1)),
             lambda a: jnp.rot90(a, 3, (0, 1))],
            img,
        )

    return (
        jnp.where(apply, rot(k, x), x),
        jnp.where(apply, rot(k, y), y),
    )


def _flip_pair(rng, x, y, prob=0.1):
    # MONAI RandFlipd(spatial_axis=[0,1]) flips both axes together
    apply = jax.random.uniform(rng) < prob
    return (
        jnp.where(apply, x[::-1, ::-1, :], x),
        jnp.where(apply, y[::-1, ::-1, :], y),
    )


def _rotate_image(img: Array, angle: Array) -> Array:
    """Bilinear keep-size rotation about the image center, zero padding."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    coords = jnp.stack([src_y.ravel(), src_x.ravel()])

    def one_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="constant", cval=0.0
        ).reshape(h, w)

    return jnp.stack([one_channel(img[..., i]) for i in range(c)], axis=-1)


def _rotate_pair(rng, x, y, prob=0.1, max_angle=jnp.pi / 12):
    r_apply, r_ang = jax.random.split(rng)
    angle = jax.random.uniform(r_ang, (), minval=-max_angle, maxval=max_angle)
    apply = jax.random.uniform(r_apply) < prob
    return (
        jnp.where(apply, _rotate_image(x, angle), x),
        jnp.where(apply, _rotate_image(y, angle), y),
    )


def _augment_pair(rng, x, y, prob=0.1):
    r1, r2, r3 = jax.random.split(rng, 3)
    x, y = _rot90_pair(r1, x, y, prob)
    x, y = _flip_pair(r2, x, y, prob)
    x, y = _rotate_pair(r3, x, y, prob)
    return x, y


# ---------------------------------------------------------------------------
# foreground crop + random patch sampling (static shapes)
# ---------------------------------------------------------------------------

def _foreground_bbox(mask: Array) -> Tuple[Array, Array, Array, Array]:
    """Bounding box (rmin, rmax, cmin, cmax) of mask>0; full image if empty."""
    rows = jnp.any(mask, axis=(1, 2))
    cols = jnp.any(mask, axis=(0, 2))
    any_fg = jnp.any(rows)
    h, w = mask.shape[0], mask.shape[1]
    idx_r = jnp.arange(h)
    idx_c = jnp.arange(w)
    rmin = jnp.where(any_fg, jnp.min(jnp.where(rows, idx_r, h)), 0)
    rmax = jnp.where(any_fg, jnp.max(jnp.where(rows, idx_r, -1)) + 1, h)
    cmin = jnp.where(any_fg, jnp.min(jnp.where(cols, idx_c, w)), 0)
    cmax = jnp.where(any_fg, jnp.max(jnp.where(cols, idx_c, -1)) + 1, w)
    return rmin, rmax, cmin, cmax


def _sample_patches_pair(
    rng, x: Array, y: Array, patch: int, num_samples: int, foreground: bool
):
    """8 random patch crops of a paired slice; crop window confined to the
    foreground bbox of y (CropForegroundd source_key='n_100'), expanded to at
    least `patch` via zero padding (SpatialPadd semantics)."""
    h, w, c = x.shape
    pad = patch  # enough margin for bbox expansion at borders
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    yp = jnp.pad(y, ((pad, pad), (pad, pad), (0, 0)))

    if foreground:
        rmin, rmax, cmin, cmax = _foreground_bbox(y > 0)
    else:
        rmin, rmax, cmin, cmax = 0, h, 0, w
    rmin, cmin = rmin + pad, cmin + pad
    rmax, cmax = rmax + pad, cmax + pad
    # expand to >= patch, centered (SpatialPadd centers the short side)
    def expand(lo, hi):
        size = hi - lo
        deficit = jnp.maximum(patch - size, 0)
        lo2 = lo - (deficit + 1) // 2
        hi2 = hi + deficit // 2
        return lo2, hi2

    rmin, rmax = expand(rmin, rmax)
    cmin, cmax = expand(cmin, cmax)

    def one(rng_i):
        rr, rc = jax.random.split(rng_i)
        top = jax.random.randint(rr, (), rmin, rmax - patch + 1)
        left = jax.random.randint(rc, (), cmin, cmax - patch + 1)
        px = jax.lax.dynamic_slice(xp, (top, left, 0), (patch, patch, c))
        py = jax.lax.dynamic_slice(yp, (top, left, 0), (patch, patch, c))
        return px, py

    rngs = jax.random.split(rng, num_samples)
    return jax.vmap(one)(rngs)  # (S, patch, patch, C) x2


# ---------------------------------------------------------------------------
# preset factories
# ---------------------------------------------------------------------------

def _window_fn(dataset: str) -> Callable[[Array], Array]:
    a_min, a_max = WINDOW_PRESETS["abdomen" if dataset == "mayo" else "brain"]
    return lambda hu: scale_intensity_range(hu, a_min, a_max)


def make_train_preprocess(
    preset: str = "window_patch",
    dataset: str = "mayo",
    patch: int = 64,
    num_samples: int = 8,
    aug_prob: float = 0.1,
):
    """Returns jitted (rng, hu_x, hu_y int16 NHWC) -> (x, y) float32 NHWC.
    Patch presets return (B*num_samples, patch, patch, C) — MONAI
    list_data_collate flattening (Mayo.py:58-60)."""
    is_patch = preset.endswith("_patch")
    windowed = preset.startswith("window")
    norm = _window_fn(dataset) if windowed else dicom_normalize

    def per_slice(rng, hu_x, hu_y):
        x = norm(hu_x.astype(jnp.float32))
        y = norm(hu_y.astype(jnp.float32))
        if is_patch:
            r_patch, r_aug = jax.random.split(rng)
            px, py = _sample_patches_pair(
                r_patch, x, y, patch, num_samples, foreground=windowed
            )
            rngs = jax.random.split(r_aug, num_samples)
            px, py = jax.vmap(partial(_augment_pair, prob=aug_prob))(rngs, px, py)
            return px, py
        x, y = _augment_pair(rng, x, y, prob=aug_prob)
        if preset == "window":
            # quirk parity: 'window' train preset min-max rescales after aug
            x, y = minmax_rescale(x), minmax_rescale(y)
        return x[None], y[None]

    @jax.jit
    def preprocess(rng, hu_x, hu_y):
        b = hu_x.shape[0]
        rngs = jax.random.split(rng, b)
        px, py = jax.vmap(per_slice)(rngs, hu_x, hu_y)
        s = px.shape[0] * px.shape[1]
        return (
            px.reshape(s, *px.shape[2:]),
            py.reshape(s, *py.shape[2:]),
        )

    return preprocess


def make_eval_preprocess(preset: str = "window", dataset: str = "mayo"):
    """Validation/test: windowing only, no aug (Mayo.py:141-161)."""
    windowed = preset.startswith("window")
    norm = _window_fn(dataset) if windowed else dicom_normalize

    @jax.jit
    def preprocess(hu_x, hu_y):
        return (
            norm(hu_x.astype(jnp.float32)),
            norm(hu_y.astype(jnp.float32)),
        )

    return preprocess
