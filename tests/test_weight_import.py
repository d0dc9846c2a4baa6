"""Torch state-dict import mapping tests — fabricated state dicts with the
exact torchvision/pt_inception key layout validate the converters without
needing the real pretrained files (zero-egress image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.features import inception as inc
from mtd_gan_tpu.features import resnet as rn
from mtd_gan_tpu.features import vgg as vgg


def test_vgg19_import_mapping(np_rng):
    sd = {}
    in_ch = 3
    for idx, out_ch in zip(vgg.VGG19_CONV_IDX, vgg.VGG19_CONV_CH):
        sd[f"features.{idx}.weight"] = np_rng.standard_normal(
            (out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{idx}.bias"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    params = vgg.import_torch_vgg19(sd)
    assert params["conv0"]["kernel"].shape == (3, 3, 3, 64)
    # HWIO conversion: torch OIHW [o,i,h,w] must land at [h,w,i,o]
    np.testing.assert_allclose(
        np.asarray(params["conv0"]["kernel"][1, 2, 0, 5]),
        sd["features.0.weight"][5, 0, 1, 2])
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    feats = vgg.vgg19_features(params, x)
    assert feats[-1].shape == (1, 4, 4, 512)
    assert bool(jnp.all(jnp.isfinite(feats[-1])))


def test_resnet50_import_mapping(np_rng):
    def conv(o, i, k):
        return np_rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(sd, name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    sd = {"conv1.weight": conv(64, 3, 7)}
    bn(sd, "bn1", 64)
    for li, (blocks, cin, mid, cout, stride) in enumerate(rn.RESNET50_LAYERS, 1):
        for bi in range(blocks):
            pre = f"layer{li}.{bi}"
            c_in = cin if bi == 0 else cout
            sd[f"{pre}.conv1.weight"] = conv(mid, c_in, 1)
            sd[f"{pre}.conv2.weight"] = conv(mid, mid, 3)
            sd[f"{pre}.conv3.weight"] = conv(cout, mid, 1)
            bn(sd, f"{pre}.bn1", mid)
            bn(sd, f"{pre}.bn2", mid)
            bn(sd, f"{pre}.bn3", cout)
            if bi == 0:
                sd[f"{pre}.downsample.0.weight"] = conv(cout, c_in, 1)
                bn(sd, f"{pre}.downsample.1", cout)
    params = rn.import_torch_resnet50(sd)
    feats = rn.resnet50_block_features(
        params, jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)))
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert all(bool(jnp.all(jnp.isfinite(f))) for f in feats)


def test_inception_import_mapping(np_rng):
    sd = {}
    for name, kh, kw, cin, cout in inc._spec():
        sd[f"{name}.conv.weight"] = np_rng.standard_normal(
            (cout, cin, kh, kw)).astype(np.float32) * 0.05
        sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    params = inc.import_torch_inception(sd)
    feats = inc.inception_pool3_features(
        params, jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 1)))
    assert feats.shape == (1, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))
