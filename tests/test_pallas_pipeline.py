"""Parity tests for the round-3 channel-major (NCHW) Pallas generator
pipeline (ops/pallas_pipeline.py) — interpret mode on CPU.

The pipeline must reproduce the einsum/fft ResFFTGenerator (the training
path, reference arch/Ours/networks.py:95-164) from the SAME flax params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator
from mtd_gan_tpu.ops import pallas_pipeline as pp


def _gen_and_params(L=2, C=8, H=64, W=64, n=2, seed=0):
    gen = ResFFTGenerator(in_channels=1, features=C, num_layers=L)
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, H, W, 1),
                           jnp.float32)
    params = jax.jit(gen.init)(jax.random.PRNGKey(seed), x)["params"]
    return gen, params, x


def test_full_generator_parity_ct():
    """H=64 -> the radix-4 Cooley-Tukey H-axis path (m=16)."""
    gen, params, x = _gen_and_params(L=2, C=8, H=64, W=64)
    ref = gen.apply({"params": params}, x)
    out = pp.resfft_generator_nchw(params, x, num_layers=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_full_generator_parity_dense_h():
    """H=36 -> (36//4)%8 != 0 -> dense H-DFT fallback path."""
    gen, params, x = _gen_and_params(L=1, C=8, H=36, W=64)
    ref = gen.apply({"params": params}, x)
    out = pp.resfft_generator_nchw(params, x, num_layers=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_per_stage_precision_specs():
    """Round-5 per-stage precision: "sp:22222" must be BIT-identical to
    "bf16x2" (same tables, same pass structure), and an all-single-pass
    "sp:11111" still tracks the einsum reference (the pass count rides the
    pack's leading dim — no kernel branching). The on-chip error budget at
    flagship geometry lives in tools/precision_sweep.py / PERF.md."""
    gen, params, x = _gen_and_params(L=1, C=8, H=64, W=64, n=1)
    ref = gen.apply({"params": params}, x)
    base = pp.resfft_generator_nchw(params, x, num_layers=1,
                                    precision="bf16x2", interpret=True)
    same = pp.resfft_generator_nchw(params, x, num_layers=1,
                                    precision="sp:22222", interpret=True)
    assert jnp.array_equal(base, same)
    single = pp.resfft_generator_nchw(params, x, num_layers=1,
                                      precision="sp:11111", interpret=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(ref),
                               atol=5e-3)


def test_conv3x3_matches_lax_conv():
    rng = np.random.RandomState(0)
    n, c, h, w = 2, 8, 32, 64
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    ref = jax.nn.relu(ref)
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
    km = pp._pack_traced(pp.conv_kmat(k), "bf16x2")
    out = pp.conv3x3(xc, km, b[:, None], h, w, relu=True, interpret=True)
    out = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    # conv compute is bf16 (matching the bf16 einsum model); on randn-scale
    # inputs that costs ~6e-3 abs on O(1) outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_conv3x3_deconv_matches_convtranspose():
    """Flipped-kernel conv == stride-1 ConvTranspose (ops/layers.py)."""
    from mtd_gan_tpu.ops.layers import ConvTranspose

    rng = np.random.RandomState(1)
    n, c, h, w = 1, 8, 64, 64
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    mod = ConvTranspose(c, kernel_size=(3, 3), padding=1)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    ref = mod.apply({"params": params}, x)
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
    km = pp._pack_traced(pp.conv_kmat(params["kernel"], flip=True), "bf16x2")
    out = pp.conv3x3(xc, km, params["bias"][:, None], h, w, relu=False,
                     interpret=True)
    out = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_conv3x3_skip_and_residual_modes():
    rng = np.random.RandomState(2)
    n, c, h, w = 1, 8, 32, 64
    x = jnp.asarray(rng.randn(n, c, h * w).astype(np.float32))
    s = jnp.asarray(rng.randn(n, c, h * w).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    b = jnp.zeros((c, 1), jnp.float32)
    km = pp._pack_traced(pp.conv_kmat(k), "bf16x2")
    plain = pp.conv3x3(x, km, b, h, w, relu=False, interpret=True)
    skip = pp.conv3x3(x, km, b, h, w, skip=s, relu=True, interpret=True)
    res = pp.conv3x3(x, km, b, h, w, relu=True, residual=True, interpret=True)
    np.testing.assert_allclose(np.asarray(skip),
                               np.maximum(np.asarray(plain + s), 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res),
                               np.asarray(x) + np.maximum(np.asarray(plain), 0),
                               atol=1e-5)


def test_ct_fwd_inv_roundtrip_matches_fft():
    """The radix-4 CT forward matches jnp.fft (ortho) up to the digit
    permutation, and inv(fwd(x)) == x."""
    h, r = 64, 16
    m = h // 4
    rng = np.random.RandomState(3)
    ar = jnp.asarray(rng.randn(r, h).astype(np.float32))
    ai = jnp.asarray(rng.randn(r, h).astype(np.float32))
    f_cs, twc, tws = (jnp.asarray(t)
                      for t in pp._h_ct_tables_np(h, "tf32"))
    dots = pp._make_dots("tf32")
    # CT streams bf16 operands by design (f32 accumulate): ~1e-3 relative
    xr, xi = pp._ct_fwd(ar, ai, f_cs, twc, tws, dots, r, m)
    # digit-major lane p = m*u + t <-> spectral index k = 4t + u
    p = np.arange(h)
    u, t = p // m, p % m
    k = 4 * t + u
    want = np.fft.fft(np.asarray(ar + 1j * ai), axis=1, norm="ortho")
    np.testing.assert_allclose(np.asarray(xr), want.real[:, k], atol=1e-2)
    np.testing.assert_allclose(np.asarray(xi), want.imag[:, k], atol=1e-2)
    br, bi = pp._ct_inv(xr, xi, f_cs, twc, tws, dots, r, m)
    np.testing.assert_allclose(np.asarray(br), np.asarray(ar), atol=2e-2)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(ai), atol=2e-2)


@pytest.mark.parametrize("precision,atol", [("tf32", 5e-3), ("bf16x2", 3e-2)])
def test_spectral_block_precisions(precision, atol):
    """fft_block_nchw vs the functional einsum block at both precisions;
    quantifies the bf16-boundary quantization cost (VERDICT r2 item 1b)."""
    from mtd_gan_tpu.ops.fft_conv import fft_conv_block

    rng = np.random.RandomState(4)
    n, c, h, w = 1, 8, 64, 64
    x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    ik = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.05)
    ib = jnp.asarray(rng.randn(c).astype(np.float32) * 0.01)
    fk = jnp.asarray(rng.randn(2 * c, 2 * c).astype(np.float32) * 0.05)
    fb = jnp.asarray(rng.randn(2 * c).astype(np.float32) * 0.01)
    ref = fft_conv_block(x, ik, ib, fk, fb, impl="auto")
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
    km = pp._pack_traced(pp.conv_kmat(ik), "bf16x2")
    mixp = pp._pack_traced(fk.T, precision)
    bdt = jnp.bfloat16 if precision == "bf16x2" else jnp.float32
    out = pp.fft_block_nchw(xc, km, ib[:, None], mixp, fb[:, None], h, w,
                            precision=precision, bound_dtype=bdt,
                            interpret=True)
    out = jnp.transpose(out.reshape(n, c, h, w), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)


def test_ct_w_real_half_fwd_inv_matches_fft():
    """The W-axis radix-4 real half-spectrum CT (VERDICT r3 missing #2):
    forward matches np.fft.rfft (ortho) on the digit-major pair layout,
    and the inverse round-trips (with the Nyquist side term added)."""
    w, r = 64, 16
    m, mt = w // 4, w // 8
    rng = np.random.RandomState(5)
    ar = jnp.asarray(rng.randn(r, w).astype(np.float32))
    (f_fwd1, f_fwd2, f_inv, twc, tws, half0, pm1f, pm1i) = (
        jnp.asarray(t) for t in pp._w_ct_tables_np(w, "tf32"))
    dots = pp._make_dots("tf32")
    pairs, ny = pp._ct_fwd_real_half(ar, f_fwd1, f_fwd2, twc, tws, dots,
                                     r, m, pm1f)
    want = np.fft.rfft(np.asarray(ar), axis=1, norm="ortho")
    for u in range(4):
        ks = 4 * np.arange(mt) + u
        got = np.asarray(pairs[u])
        np.testing.assert_allclose(got[:, :mt], want.real[:, ks], atol=1e-2,
                                   err_msg=f"re digit {u}")
        np.testing.assert_allclose(got[:, mt:], want.imag[:, ks], atol=1e-2,
                                   err_msg=f"im digit {u}")
    np.testing.assert_allclose(np.asarray(ny), want.real[:, w // 2],
                               atol=1e-2)
    back = pp._ct_inv_real_half(pairs, f_inv, twc, tws, dots, r, m, half0)
    back = back + np.asarray(ny)[:, None] * np.asarray(pm1i)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ar), atol=2e-2)


def test_full_generator_parity_ct_w():
    """CT-W forced on at the test geometry: the fused kernel with the
    radix-4 W path must match the einsum generator like the dense-W one."""
    gen, params, x = _gen_and_params(L=2, C=8, H=64, W=64)
    ref = gen.apply({"params": params}, x)
    out = pp.resfft_generator_nchw(params, x, num_layers=2, interpret=True,
                                   use_ct_w=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_packed_conv3x3_seam_masks():
    """pw=64 packed pairs: the conv must NOT bleed across the patch seam."""
    rng = np.random.RandomState(3)
    n, c, h, w = 4, 8, 32, 64
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ref = jax.nn.relu(jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b)
    # pack pairs along W
    xp = x.reshape(n // 2, 2, h, w, c).transpose(0, 4, 2, 1, 3).reshape(
        n // 2, c, h * 2 * w)
    km = pp._pack_traced(pp.conv_kmat(k), "bf16x2")
    out = pp.conv3x3(xp, km, b[:, None], h, 2 * w, relu=True,
                     interpret=True, pw=w)
    out = out.reshape(n // 2, c, h, 2, w).transpose(0, 3, 2, 4, 1).reshape(
        n, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_packed_full_generator_parity():
    """pack=2 (the 64x64 training-patch geometry: 128-lane-dense rows,
    seam-masked convs, block-diagonal W-DFT tables) must reproduce the
    einsum generator sample-for-sample."""
    gen, params, x = _gen_and_params(L=2, C=8, H=64, W=64, n=4)
    ref = gen.apply({"params": params}, x)
    out = pp.resfft_generator_nchw(params, x, num_layers=2, interpret=True,
                                   pack=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
