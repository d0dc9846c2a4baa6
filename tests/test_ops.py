"""Op-level parity tests against torch (CPU) as an independent oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from mtd_gan_tpu.ops.fft_conv import fft_conv_block
from mtd_gan_tpu.ops.layers import Conv, ConvTranspose, Dense
from mtd_gan_tpu.ops.pixel_shuffle import pixel_shuffle
from mtd_gan_tpu.ops.filters import laplacian_detail, gauss_blur5


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def _to_nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_conv_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    w = np_rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    b = np_rng.standard_normal((8,)).astype(np.float32)

    layer = Conv(8, kernel_size=(3, 3), padding=1)
    out = layer.apply({"params": {"kernel": w, "bias": b}}, jnp.asarray(x))

    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    ref = TF.conv2d(_nchw(x), wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch(np_rng):
    for k, p in [(5, 0), (3, 1)]:
        x = np_rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
        w = np_rng.standard_normal((k, k, 4, 6)).astype(np.float32)
        b = np_rng.standard_normal((6,)).astype(np.float32)

        layer = ConvTranspose(6, kernel_size=(k, k), padding=p)
        out = layer.apply({"params": {"kernel": w, "bias": b}}, jnp.asarray(x))

        # torch ConvTranspose2d weight layout: (in, out, kh, kw)
        wt = torch.from_numpy(w).permute(2, 3, 0, 1)
        ref = TF.conv_transpose2d(_nchw(x), wt, torch.from_numpy(b), padding=p)
        np.testing.assert_allclose(
            np.asarray(out), _to_nhwc(ref), rtol=1e-4, atol=1e-4
        )


def test_fft_conv_block_matches_torch(np_rng):
    """Bit-level check of the Res-FFT-Conv block against a torch composition
    (rfft2 -> 1x1 conv on stacked Re/Im -> irfft2 + spatial 3x3 branch)."""
    c, h, w = 4, 16, 16
    x = np_rng.standard_normal((2, h, w, c)).astype(np.float32)
    img_k = (np_rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    img_b = np_rng.standard_normal((c,)).astype(np.float32)
    fft_k = (np_rng.standard_normal((2 * c, 2 * c)) * 0.1).astype(np.float32)
    fft_b = np_rng.standard_normal((2 * c,)).astype(np.float32)

    out = fft_conv_block(
        jnp.asarray(x), jnp.asarray(img_k), jnp.asarray(img_b),
        jnp.asarray(fft_k), jnp.asarray(fft_b),
    )

    xt = _nchw(x)
    fft = torch.fft.rfft2(xt, s=(h, w), dim=(2, 3), norm="ortho")
    stacked = torch.cat([fft.real, fft.imag], dim=1)
    # our fft_kernel is (2C_in, 2C_out) matmul == torch 1x1 conv (O, I, 1, 1)
    wk = torch.from_numpy(fft_k).t().reshape(2 * c, 2 * c, 1, 1)
    stacked = TF.relu(TF.conv2d(stacked, wk, torch.from_numpy(fft_b)))
    re, im = torch.chunk(stacked, 2, dim=1)
    spec = torch.fft.irfft2(torch.complex(re, im), s=(h, w), dim=(2, 3), norm="ortho")
    wi = torch.from_numpy(img_k).permute(3, 2, 0, 1)
    img = TF.relu(TF.conv2d(xt, wi, torch.from_numpy(img_b), padding=1))
    ref = xt + img + spec

    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-3, atol=1e-4)


def test_pixel_shuffle_matches_torch(np_rng):
    x = np_rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    out = pixel_shuffle(jnp.asarray(x), 2)
    ref = TF.pixel_shuffle(_nchw(x), 2)
    np.testing.assert_allclose(np.asarray(out), _to_nhwc(ref), rtol=1e-5, atol=1e-6)


def test_spectral_norm_sigma_matches_torch(np_rng):
    """After several updates, our SN conv output should match torch's
    spectral_norm wrapper driven the same number of iterations."""
    torch.manual_seed(0)
    x = np_rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = np_rng.standard_normal((3, 3, 3, 5)).astype(np.float32)
    b = np.zeros((5,), np.float32)

    layer = Conv(5, kernel_size=(3, 3), padding=1, spectral_norm=True)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {
        "params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
        "spectral": variables["spectral"],
    }

    conv_t = torch.nn.Conv2d(3, 5, 3, padding=1, bias=True)
    with torch.no_grad():
        conv_t.weight.copy_(torch.from_numpy(w).permute(3, 2, 0, 1))
        conv_t.bias.zero_()
    conv_t = torch.nn.utils.spectral_norm(conv_t)
    # initialize torch's u to ours for exact parity
    with torch.no_grad():
        conv_t.weight_u.copy_(
            torch.from_numpy(np.asarray(variables["spectral"]["u"]))
        )

    out_j = None
    for _ in range(4):
        out_j, mutated = layer.apply(
            variables, jnp.asarray(x), update_stats=True, mutable=["spectral"]
        )
        variables = {"params": variables["params"], "spectral": mutated["spectral"]}
        out_t = conv_t(_nchw(x))

    np.testing.assert_allclose(
        np.asarray(out_j), _to_nhwc(out_t), rtol=1e-3, atol=1e-4
    )


def test_laplacian_detail_zero_on_constant_interior():
    # borders are nonzero because the zero-stuffed comb is replicate-padded
    # (same in the torch reference); the interior must vanish.
    x = jnp.full((1, 32, 32, 1), 0.7, jnp.float32)
    d = laplacian_detail(x)
    assert float(jnp.max(jnp.abs(d[:, 4:-4, 4:-4, :]))) < 1e-5


def test_gauss_blur_preserves_mean_interior():
    x = jnp.ones((1, 16, 16, 1), jnp.float32)
    out = gauss_blur5(x)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


def test_spectral_norm_eval_mode_freezes_u(np_rng):
    """update_stats=False must not change the stored power-iteration vector."""
    x = jnp.asarray(np_rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
    layer = Conv(4, kernel_size=(3, 3), padding=1, spectral_norm=True)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, mutated = layer.apply(variables, x, update_stats=False,
                               mutable=["spectral"])
    np.testing.assert_array_equal(
        np.asarray(variables["spectral"]["u"]),
        np.asarray(mutated["spectral"]["u"]))


def test_fft_conv_block_bf16_tpu_branch(np_rng, monkeypatch):
    """Exercise the TPU bf16x2 spectral branch on CPU (the _dot2 fallback
    keeps the rounding semantics): bf16-input block output must track the
    fp32 jnp.fft path to bf16 accuracy."""
    from mtd_gan_tpu.ops import fft_conv as fc

    c, h, w = 4, 32, 32
    x = np_rng.standard_normal((2, h, w, c)).astype(np.float32)
    img_k = (np_rng.standard_normal((3, 3, c, c)) * 0.1).astype(np.float32)
    img_b = np_rng.standard_normal((c,)).astype(np.float32)
    fft_k = (np_rng.standard_normal((2 * c, 2 * c)) * 0.1).astype(np.float32)
    fft_b = np_rng.standard_normal((2 * c,)).astype(np.float32)
    args = [jnp.asarray(a) for a in (img_k, img_b, fft_k, fft_b)]

    ref = fft_conv_block(jnp.asarray(x), *args)

    monkeypatch.setattr(fc, "_use_dft_matmul", lambda: True)
    got16 = fft_conv_block(jnp.asarray(x, jnp.bfloat16), *args)
    assert got16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got16, np.float32), np.asarray(ref), rtol=1e-2, atol=5e-2)
