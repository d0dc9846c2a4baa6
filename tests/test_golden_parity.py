"""Golden-value parity: our flagship modules vs torch oracles with the SAME
weights (SURVEY.md §4 golden-test strategy). The oracles are compact
re-statements of the reference architectures in torch, driven by weights
exported from our flax params — forward outputs must match to fp32 conv
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator
from mtd_gan_tpu.models.red_cnn import REDCNNModel


def _t(x):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def _conv_w(p):  # HWIO -> OIHW
    return torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))


def _deconv_w(p):  # HWIO (in, out) -> torch transposed-conv (in, out, kh, kw)
    return torch.from_numpy(np.asarray(p["kernel"]).transpose(2, 3, 0, 1))


class TorchResFFT(nn.Module):
    """Oracle: Res-FFT-Conv generator forward (arch/Ours/networks.py:38-164
    semantics), parameterized by our flax params."""

    def __init__(self, params, features, num_layers):
        super().__init__()
        self.p = params
        self.features = features
        self.n = num_layers

    def conv(self, x, name):
        p = self.p[name]
        return TF.conv2d(x, _conv_w(p), torch.from_numpy(np.asarray(p["bias"])),
                         padding=1)

    def deconv(self, x, name):
        p = self.p[name]
        return TF.conv_transpose2d(
            x, _deconv_w(p), torch.from_numpy(np.asarray(p["bias"])), padding=1)

    def fft_block(self, x, name):
        p = self.p[name]
        h, w = x.shape[2], x.shape[3]
        z = torch.fft.rfft2(x, s=(h, w), dim=(2, 3), norm="ortho")
        sp = torch.cat([z.real, z.imag], dim=1)
        wk = torch.from_numpy(np.asarray(p["fft_kernel"])).t()
        sp = TF.relu(
            TF.conv2d(sp, wk.reshape(*wk.shape, 1, 1),
                      torch.from_numpy(np.asarray(p["fft_bias"]))))
        re, im = torch.chunk(sp, 2, dim=1)
        spec = torch.fft.irfft2(torch.complex(re, im), s=(h, w), dim=(2, 3),
                                norm="ortho")
        wi = torch.from_numpy(np.asarray(p["img_kernel"]).transpose(3, 2, 0, 1))
        img = TF.relu(TF.conv2d(x, wi, torch.from_numpy(np.asarray(p["img_bias"])),
                                padding=1))
        return x + img + spec

    def forward(self, x):
        skips = []
        h = x
        for i in range(self.n):
            h = TF.relu(self.conv(h, f"enc_{i}"))
            h = self.fft_block(h, f"fft_{i}")
            skips.append(h)
        h = TF.relu(self.conv(h, f"enc_{self.n}"))
        h = self.fft_block(h, f"fft_{self.n}")
        h = TF.relu(self.deconv(h, f"dec_{self.n}") + skips[-1])
        for i in range(self.n - 1, 0, -1):
            h = self.fft_block(h, f"fft_{2 * self.n - i}")
            h = TF.relu(self.deconv(h, f"dec_{i}") + skips[i - 1])
        h = self.fft_block(h, f"fft_{2 * self.n}")
        return TF.relu(self.deconv(h, "dec_0") + x)


def test_resfft_generator_matches_torch_oracle(rng):
    features, layers = 8, 3
    gen = ResFFTGenerator(features=features, num_layers=layers)
    x = jax.random.uniform(rng, (1, 32, 32, 1))
    params = jax.jit(gen.init)(rng, x)["params"]
    ours = np.asarray(gen.apply({"params": params}, x))

    oracle = TorchResFFT(jax.tree_util.tree_map(np.asarray, params),
                         features, layers)
    with torch.no_grad():
        ref = oracle(_t(np.asarray(x)))
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=2e-4
    )


def test_redcnn_matches_torch_oracle(rng):
    model = REDCNNModel(out_ch=8)
    params = model.init(rng)
    x = jax.random.uniform(rng, (1, 40, 40, 1))
    ours = np.asarray(model.apply(params, x))

    p = jax.tree_util.tree_map(np.asarray, params)

    def c(z, name):
        return TF.conv2d(z, _conv_w(p[name]), torch.from_numpy(p[name]["bias"]))

    def d(z, name):
        return TF.conv_transpose2d(
            z, _deconv_w(p[name]), torch.from_numpy(p[name]["bias"]))

    with torch.no_grad():
        z = _t(np.asarray(x))
        r1 = z
        out = TF.relu(c(z, "conv1"))
        out = TF.relu(c(out, "conv2"))
        r2 = out
        out = TF.relu(c(out, "conv3"))
        out = TF.relu(c(out, "conv4"))
        r3 = out
        out = TF.relu(c(out, "conv5"))
        out = d(out, "tconv1") + r3
        out = d(TF.relu(out), "tconv2")
        out = d(TF.relu(out), "tconv3") + r2
        out = d(TF.relu(out), "tconv4")
        out = d(TF.relu(out), "tconv5") + r1
        ref = TF.relu(out)
    np.testing.assert_allclose(
        ours, ref.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4
    )
