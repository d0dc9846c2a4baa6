"""Loss library — pure functions on NHWC arrays.

Parity map to reference losses.py:
  ls_gan            -> losses.py:10-11
  nds_loss          -> losses.py:13-15   (non-difference suppression LSGAN)
  charbonnier_loss  -> losses.py:99-111
  edge_loss         -> losses.py:113-138 (Laplacian-pyramid Charbonnier)
  msfr_loss         -> losses.py:140-152 (L1 in rfftn domain)
  l1 / l2           -> losses.py:186-197 (get_loss)
Feature-space losses (VGG perceptual, ResNet compound) live in
mtd_gan_tpu.features, which owns the JAX feature extractors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mtd_gan_tpu.ops.filters import laplacian_detail

Array = jax.Array


def l1(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def l2(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


mse = l2


def ls_gan(pred: Array, target) -> Array:
    """LSGAN objective: mean((pred - target)^2); target is a scalar label."""
    return jnp.mean((pred - target) ** 2)


def nds_loss(pred: Array, target, diff: Array) -> Array:
    """Non-difference-suppression LSGAN: mask pixels where |diff| == 0 so the
    pixel-level real/fake head is not penalized where LD and FD agree."""
    mask = (jnp.abs(diff) != 0).astype(pred.dtype)
    return jnp.mean(mask * (pred - target) ** 2)


def charbonnier_loss(pred: Array, target: Array, eps: float = 1e-3) -> Array:
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def edge_loss(pred: Array, target: Array) -> Array:
    """Charbonnier distance between Laplacian-pyramid detail layers."""
    return charbonnier_loss(laplacian_detail(pred), laplacian_detail(target))


def msfr_loss(pred: Array, target: Array) -> Array:
    """L1 in the full rfftn spectral domain (complex magnitude of difference)."""
    pf = jnp.fft.rfftn(pred.astype(jnp.float32))
    tf = jnp.fft.rfftn(target.astype(jnp.float32))
    return jnp.mean(jnp.abs(pf - tf))


def make_vgg_loss(feature_fn=None):
    """5-slice VGG19 perceptual loss, weights [1/32..1], L1 per slice
    (reference losses.py:49-63). Features are stop-gradiented on the target
    side only (the reference detaches y features and wraps both in no_grad —
    under jax.grad the x side contributes no gradient either way there; we
    keep gradients flowing through x as VGGLoss callers expect)."""
    if feature_fn is None:
        from mtd_gan_tpu.features import get_vgg_slices_fn

        feature_fn = get_vgg_slices_fn()
    weights = (1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0)

    def loss(x: Array, y: Array) -> Array:
        fx = feature_fn(x)
        fy = feature_fn(jax.lax.stop_gradient(y))
        return sum(w * l1(a, jax.lax.stop_gradient(b))
                   for w, a, b in zip(weights, fx, fy))

    return loss


def make_compound_loss(feature_fn=None, mse_weight=1.0, resnet_weight=0.01):
    """EDCNN CompoundLoss: MSE + 0.01 * mean ResNet50-block feature MSE
    (reference losses.py:154-183)."""
    if feature_fn is None:
        from mtd_gan_tpu.features import get_resnet_feature_fn

        feature_fn = get_resnet_feature_fn()

    def loss(pred: Array, target: Array) -> Array:
        fp = feature_fn(pred)
        ft = feature_fn(target)
        feat = sum(l2(a, b) for a, b in zip(fp, ft)) / len(fp)
        return mse_weight * l2(pred, target) + resnet_weight * feat

    return loss


def get_loss(name: str):
    """Criterion factory mirroring reference losses.py:186-197."""
    table = {
        "L1 Loss": l1,
        "L2 Loss": l2,
        "Charbonnier Loss": charbonnier_loss,
        "Edge Loss": edge_loss,
        "MSFR Loss": msfr_loss,
    }
    if name not in table:
        raise KeyError(f"unknown loss {name!r}; known: {sorted(table)}")
    return table[name]
