"""Loss/metric parity tests: torch-oracle comparisons + analytic cases."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from mtd_gan_tpu import losses
from mtd_gan_tpu.metrics import pixel as M


def _pair(np_rng, shape=(2, 32, 32, 1)):
    a = np_rng.uniform(0, 1, shape).astype(np.float32)
    b = np_rng.uniform(0, 1, shape).astype(np.float32)
    return a, b


def test_ls_gan_and_nds(np_rng):
    a, b = _pair(np_rng)
    assert abs(float(losses.ls_gan(jnp.asarray(a), 1.0)) - np.mean((a - 1) ** 2)) < 1e-6
    # NDS: zero-diff pixels masked out
    diff = (a - b).copy()
    diff[:, :16] = 0.0
    got = float(losses.nds_loss(jnp.asarray(a), 0.0, jnp.asarray(diff)))
    want = np.mean((np.abs(diff) != 0) * a**2)
    assert abs(got - want) < 1e-6


def test_charbonnier(np_rng):
    a, b = _pair(np_rng)
    got = float(losses.charbonnier_loss(jnp.asarray(a), jnp.asarray(b)))
    want = np.mean(np.sqrt((a - b) ** 2 + 1e-6))
    assert abs(got - want) < 1e-6


def test_edge_loss_matches_torch(np_rng):
    """Oracle: independent torch implementation of the Laplacian-pyramid
    Charbonnier loss (reference losses.py:113-138 semantics)."""
    a, b = _pair(np_rng, (1, 32, 32, 1))

    def torch_lap(x_nhwc):
        x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
        k1 = torch.tensor([0.05, 0.25, 0.4, 0.25, 0.05])
        k = torch.outer(k1, k1)[None, None]

        def blur(img):
            img = TF.pad(img, (2, 2, 2, 2), mode="replicate")
            return TF.conv2d(img, k)

        filtered = blur(x)
        down = filtered[:, :, ::2, ::2]
        stuffed = torch.zeros_like(filtered)
        stuffed[:, :, ::2, ::2] = down * 4
        return x - blur(stuffed)

    la, lb = torch_lap(a), torch_lap(b)
    want = torch.mean(torch.sqrt((la - lb) ** 2 + 1e-6)).item()
    got = float(losses.edge_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5


def test_msfr_loss(np_rng):
    a, b = _pair(np_rng, (1, 16, 16, 1))
    got = float(losses.msfr_loss(jnp.asarray(a), jnp.asarray(b)))
    fa = np.fft.rfftn(a)
    fb = np.fft.rfftn(b)
    want = np.mean(np.abs(fa - fb))
    assert abs(got - want) / want < 1e-4


def test_psnr_rmse_analytic():
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.5)
    assert abs(float(M.rmse(a, b)) - 0.5) < 1e-6
    assert abs(float(M.psnr(a, b)) - 10 * np.log10(1 / 0.25)) < 1e-4
    # gt-vs-gt fixture behavior: psnr -> 100, ssim -> 1
    assert float(M.psnr(b, b)) == 100.0
    assert abs(float(M.ssim(b, b)) - 1.0) < 1e-6


def test_ssim_matches_torch_oracle(np_rng):
    """Oracle: direct torch Gaussian-window SSIM with identical constants."""
    a, b = _pair(np_rng, (1, 64, 64, 1))

    xs = np.arange(11) - 5
    g = np.exp(-(xs**2) / (2 * 1.5**2))
    g = g / g.sum()
    win = torch.from_numpy(np.outer(g, g).astype(np.float32))[None, None]

    x = torch.from_numpy(a).permute(0, 3, 1, 2)
    y = torch.from_numpy(b).permute(0, 3, 1, 2)
    mu1 = TF.conv2d(x, win, padding=5)
    mu2 = TF.conv2d(y, win, padding=5)
    s1 = TF.conv2d(x * x, win, padding=5) - mu1**2
    s2 = TF.conv2d(y * y, win, padding=5) - mu2**2
    s12 = TF.conv2d(x * y, win, padding=5) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    want = (
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    ).mean().item()

    got = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-5
