"""ResNet50 trunk in flax (NHWC) — EDCNN CompoundLoss feature extractor
(reference losses.py:66-97 / arch/EDCNN/compound_loss.py: blocks 1-4 feature
maps, no avgpool/fc).

Weight import from a torchvision resnet50 state_dict; seeded fallback
otherwise (see mtd_gan_tpu.features docstring).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# (blocks, in, mid, out, stride) per layer
RESNET50_LAYERS = [
    (3, 64, 64, 256, 1),
    (4, 256, 128, 512, 2),
    (6, 512, 256, 1024, 2),
    (3, 1024, 512, 2048, 2),
]


def _conv_params(rng, kh, kw, cin, cout):
    scale = float(np.sqrt(2.0 / (kh * kw * cin)))
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * scale


def _bn_params(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def init_resnet50_params(rng: Optional[jax.Array] = None) -> Dict:
    if rng is None:
        rng = jax.random.PRNGKey(50)
    rngs = iter(jax.random.split(rng, 256))
    p: Dict = {
        "conv1": _conv_params(next(rngs), 7, 7, 3, 64),
        "bn1": _bn_params(64),
    }
    for li, (blocks, cin, mid, cout, stride) in enumerate(RESNET50_LAYERS, 1):
        for bi in range(blocks):
            blk = {
                "conv1": _conv_params(next(rngs), 1, 1, cin if bi == 0 else cout, mid),
                "bn1": _bn_params(mid),
                "conv2": _conv_params(next(rngs), 3, 3, mid, mid),
                "bn2": _bn_params(mid),
                "conv3": _conv_params(next(rngs), 1, 1, mid, cout),
                "bn3": _bn_params(cout),
            }
            if bi == 0:
                blk["down_conv"] = _conv_params(next(rngs), 1, 1, cin, cout)
                blk["down_bn"] = _bn_params(cout)
            p[f"layer{li}_{bi}"] = blk
    return p


def import_torch_resnet50(sd) -> Dict:
    def conv(name):
        return jnp.asarray(np.asarray(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))

    def bn(name):
        return {
            "scale": jnp.asarray(np.asarray(sd[f"{name}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{name}.bias"])),
            "mean": jnp.asarray(np.asarray(sd[f"{name}.running_mean"])),
            "var": jnp.asarray(np.asarray(sd[f"{name}.running_var"])),
        }

    p = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li, (blocks, *_rest) in enumerate(RESNET50_LAYERS, 1):
        for bi in range(blocks):
            pre = f"layer{li}.{bi}"
            blk = {
                "conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down_conv"] = conv(f"{pre}.downsample.0")
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            p[f"layer{li}_{bi}"] = blk
    return p


def _conv2d(x, k, stride=1, pad="SAME"):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return x * inv.astype(x.dtype) + (p["bias"] - p["mean"] * inv).astype(x.dtype)


def resnet50_block_features(params: Dict, x: Array) -> List[Array]:
    """NHWC 3-channel input -> [layer1, layer2, layer3, layer4] feature maps
    (inference-mode BN)."""
    h = _conv2d(x, params["conv1"], stride=2, pad=[(3, 3), (3, 3)])
    h = jax.nn.relu(_bn(h, params["bn1"]))
    h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    feats = []
    for li, (blocks, cin, mid, cout, stride) in enumerate(RESNET50_LAYERS, 1):
        for bi in range(blocks):
            p = params[f"layer{li}_{bi}"]
            s = stride if bi == 0 else 1
            identity = h
            y = jax.nn.relu(_bn(_conv2d(h, p["conv1"]), p["bn1"]))
            y = jax.nn.relu(_bn(_conv2d(y, p["conv2"], stride=s), p["bn2"]))
            y = _bn(_conv2d(y, p["conv3"]), p["bn3"])
            if "down_conv" in p:
                identity = _bn(_conv2d(h, p["down_conv"], stride=s), p["down_bn"])
            h = jax.nn.relu(y + identity)
        feats.append(h)
    return feats
