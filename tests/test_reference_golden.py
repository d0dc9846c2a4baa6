"""Golden-parity tests against the ACTUAL reference implementation.

Unlike tests/test_golden_parity.py (hand-typed torch oracles), these import
the reference modules from /root/reference directly (VERDICT.md round-1 item
4): a transcription error in either codebase shows up here.

Import strategy: /root/reference has no package __init__ files, so
`arch.Ours.networks` / `module.weight_methods` import as namespace packages
once the root is on sys.path. torchvision (absent from the image) is stubbed
— reference losses.py only touches `models.*` lazily inside Vgg19/ResNet50
constructors we never call; cvxpy likewise is only used by NashMTL.

Spectral-norm parity trick: torch SN stores (u, v) and, in eval mode, uses
them as-is; our flax SN stores only u and recomputes v = n(W^T u),
u' = n(W v). If we snapshot torch's INITIAL u0, run exactly ONE train-mode
forward (one torch power iteration: v1 = n(W^T u0), u1 = n(W v1)), then
evaluate torch in eval mode, torch's sigma is u1^T W v1 — and our forward
seeded with u0 computes exactly the same v1, u1, sigma. Bit-for-bit SN
parity with no convergence loop (reference torch SpectralNorm semantics;
arch/Ours/networks.py:181 et seq.).
"""

from __future__ import annotations

import copy
import importlib
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.modules.setdefault("cvxpy", types.ModuleType("cvxpy"))
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    networks = importlib.import_module("arch.Ours.networks")
    weight_methods = importlib.import_module("module.weight_methods")
    return types.SimpleNamespace(networks=networks, weight_methods=weight_methods)


# ---------------------------------------------------------------------------
# torch -> flax weight conversion
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy()


def _conv(sd, name, sn=False):
    w = sd[f"{name}.weight_orig" if sn else f"{name}.weight"]
    return {"kernel": _np(w).transpose(2, 3, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _deconv(sd, name):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out)
    return {
        "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 0, 1),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _dense(sd, name, sn=False):
    w = sd[f"{name}.weight_orig" if sn else f"{name}.weight"]
    return {"kernel": _np(w).T, "bias": _np(sd[f"{name}.bias"])}


def _fft_block(sd, name):
    # reference FFT_ConvBlock (networks.py:15-36): img_conv 3x3, fft_conv 1x1
    p = f"{name}." if name else ""
    return {
        "img_kernel": _np(sd[f"{p}img_conv.weight"]).transpose(2, 3, 1, 0),
        "img_bias": _np(sd[f"{p}img_conv.bias"]),
        "fft_kernel": _np(sd[f"{p}fft_conv.weight"])[:, :, 0, 0].T,
        "fft_bias": _np(sd[f"{p}fft_conv.bias"]),
    }


def _gen_params_from_torch(sd, num_layers=10):
    params = {}
    for i in range(num_layers + 1):
        params[f"enc_{i}"] = _conv(sd, f"encoder.{i}")
        params[f"dec_{i}"] = _deconv(sd, f"decoder.{i}")
    for i in range(2 * num_layers + 1):
        params[f"fft_{i}"] = _fft_block(sd, f"enforce.{i}")
    return params


def _disc_params_from_torch(sd, sd0):
    """sd: weights (post any forwards); sd0: INITIAL state (u0 vectors)."""
    params, spectral = {}, {}

    def sn_conv(name):
        params[name] = _conv(sd, name, sn=True)
        spectral[name] = {"u": _np(sd0[f"{name}.weight_u"])}

    for i in range(1, 7):
        sn_conv(f"conv{i}1")
        sn_conv(f"conv{i}2")
        sn_conv(f"down{i}")
    sn_conv("bconv1")
    sn_conv("bconv2")
    params["c_fc"] = _dense(sd, "c_fc", sn=True)
    spectral["c_fc"] = {"u": _np(sd0["c_fc.weight_u"])}
    for i in range(1, 7):
        sn_conv(f"s_dconv{i}1")
        sn_conv(f"s_dconv{i}2")
        params[f"r_up{i}"] = {"proj": _conv(sd, f"r_up{i}.upsample.0")}
        sn_conv(f"r_dconv{i}1")
        sn_conv(f"r_dconv{i}2")
    params["enc_out"] = _dense(sd, "enc_out")
    params["dec_out"] = _conv(sd, "dec_out")
    params["rec_out"] = _conv(sd, "rec_out")
    return params, spectral


def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return _np(t).transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_fft_convblock_reference_parity(ref, rng):
    from mtd_gan_tpu.ops.fft_conv import FFTConvBlock

    torch.manual_seed(0)
    block_t = ref.networks.FFT_ConvBlock(out_channels=16)
    x = jax.random.uniform(rng, (2, 32, 32, 16), jnp.float32)
    with torch.no_grad():
        want = _nhwc(block_t(_nchw(x).float()))

    params = _fft_block(block_t.state_dict(), "")
    block_j = FFTConvBlock(channels=16)
    got = jax.jit(block_j.apply)({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_resfft_generator_reference_parity(ref, rng):
    from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator

    torch.manual_seed(0)
    gen_t = ref.networks.ResFFT_Generator(
        in_channels=1, out_channels=32, num_layers=10, kernel_size=3, padding=1
    ).eval()
    x = jax.random.uniform(rng, (1, 64, 64, 1), jnp.float32)
    with torch.no_grad():
        want = _nhwc(gen_t(_nchw(x).float()))

    params = _gen_params_from_torch(gen_t.state_dict())
    gen_j = ResFFTGenerator(features=32, num_layers=10)
    got = jax.jit(gen_j.apply)({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_mtd_gan_d_g_loss_reference_parity(ref, rng):
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    torch.manual_seed(1)
    model_t = ref.networks.MTD_GAN_Method()
    # snapshot initial SN u0 vectors, then ONE train-mode power iteration
    sd0 = copy.deepcopy(model_t.state_dict())
    probe = torch.zeros(1, 1, 64, 64)
    model_t.train()
    with torch.no_grad():
        model_t.Discriminator(probe)
    model_t.eval()

    rx, ry = jax.random.split(rng)
    x = jax.random.uniform(rx, (2, 64, 64, 1), jnp.float32)
    y = jnp.clip(x + 0.05 * jax.random.normal(ry, x.shape), 0.0, 1.0)
    with torch.no_grad():
        d_want, d_details_t = model_t.d_loss(_nchw(x).float(), _nchw(y).float())
        g_want, g_details_t = model_t.g_loss(_nchw(x).float(), _nchw(y).float())

    params_g = _gen_params_from_torch(
        {k[len("Generator."):]: v for k, v in model_t.state_dict().items()
         if k.startswith("Generator.")}
    )
    params_d, spectral = _disc_params_from_torch(
        {k[len("Discriminator."):]: v for k, v in model_t.state_dict().items()
         if k.startswith("Discriminator.")},
        {k[len("Discriminator."):]: v for k, v in sd0.items()
         if k.startswith("Discriminator.")},
    )

    model_j = MTDGANModel(gen_features=32, disc_features=64, num_layers=10,
                          remat=False)
    d_got, (_, d_details) = jax.jit(
        lambda pd, pg, sp, xx, yy: model_j.d_loss(
            pd, pg, sp, jax.random.PRNGKey(0), xx, yy, train=False
        )
    )(params_d, params_g, spectral, x, y)
    g_got, (_, g_details) = jax.jit(
        lambda pg, pd, sp, xx, yy: model_j.g_loss(
            pg, pd, sp, jax.random.PRNGKey(0), xx, yy, train=False
        )
    )(params_g, params_d, spectral, x, y)

    np.testing.assert_allclose(
        np.asarray(d_got), _np(d_want), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        float(g_got), float(g_want), rtol=2e-3, atol=2e-4
    )
    for k in ["D/real_enc", "D/fake_enc", "D/real_dec", "D/fake_dec",
              "D/rec_loss_real", "D/rec_loss_fake"]:
        np.testing.assert_allclose(
            float(d_details[k]), float(d_details_t[k]), rtol=2e-3, atol=2e-4,
            err_msg=k,
        )
    for k in ["G/gen_enc", "G/gen_dec", "G/pix_loss", "G/edge_loss"]:
        np.testing.assert_allclose(
            float(g_details[k]), float(g_details_t[k]), rtol=2e-3, atol=2e-4,
            err_msg=k,
        )


def _numpy_pcgrad(grads, order_per_task):
    """PCGrad with explicit projection orders (reference
    module/weight_methods.py:449-464: project vs ORIGINAL grads)."""
    out = []
    for i, order in enumerate(order_per_task):
        g = grads[i].copy()
        for j in order:
            dot = float(g @ grads[j])
            if dot < 0:
                g = g - dot / float(grads[j] @ grads[j]) * grads[j]
        out.append(g)
    return np.sum(out, axis=0)


def test_pcgrad_reference_parity(ref, monkeypatch):
    """Reference PCGrad (shuffle pinned to identity) == fixed-order numpy
    formula; our jax PCGrad (random order) == one of the 8 possible orders."""
    import random as pyrandom

    from mtd_gan_tpu.mto.methods import _pcgrad_shared

    monkeypatch.setattr(pyrandom, "shuffle", lambda lst: None)

    theta = torch.tensor([0.3, -0.7, 1.1], requires_grad=True)
    # 3 tasks with pairwise conflicts
    losses = torch.stack([
        (theta * torch.tensor([1.0, 2.0, -1.0])).sum(),
        (theta * torch.tensor([-2.0, 1.0, 0.5])).sum(),
        (theta * torch.tensor([0.5, -3.0, 1.0])).sum(),
    ])
    wm = ref.weight_methods.WeightMethods(
        "pcgrad", n_tasks=3, device=torch.device("cpu")
    )
    wm.backward(losses, shared_parameters=[theta])
    ref_grad = _np(theta.grad)

    grads = np.array([[1.0, 2.0, -1.0], [-2.0, 1.0, 0.5], [0.5, -3.0, 1.0]])
    ident = [(0, 1, 2)] * 3
    np.testing.assert_allclose(
        ref_grad, _numpy_pcgrad(grads, ident), rtol=1e-4, atol=1e-6,
        err_msg="reference PCGrad != fixed-order formula",
    )

    # ours: random projection order -> must equal SOME per-task order combo
    stacked = {"w": jnp.asarray(grads)}
    ours = np.asarray(_pcgrad_shared(jax.random.PRNGKey(3), stacked, 3)["w"])
    import itertools

    candidates = [
        _numpy_pcgrad(grads, orders)
        for orders in itertools.product(list(itertools.permutations(range(3))),
                                        repeat=3)
    ]
    assert any(np.allclose(ours, c, rtol=1e-5, atol=1e-6) for c in candidates), (
        ours, candidates[:4],
    )


def test_redcnn_reference_parity(ref, rng):
    red = importlib.import_module("arch.RED_CNN.networks")
    from mtd_gan_tpu.models.red_cnn import REDCNNModel

    torch.manual_seed(0)
    net_t = red.RED_CNN(out_ch=32).eval()
    x = jax.random.uniform(rng, (1, 64, 64, 1), jnp.float32)
    with torch.no_grad():
        want = _nhwc(net_t(_nchw(x).float()))

    sd = net_t.state_dict()
    params = {}
    for i in range(1, 6):
        params[f"conv{i}"] = _conv(sd, f"conv{i}")
        params[f"tconv{i}"] = _deconv(sd, f"tconv{i}")
    model_j = REDCNNModel(out_ch=32)
    got = model_j.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_resfft_generator_dft_matmul_path_reference_parity(
        ref, rng, monkeypatch):
    """The TPU TRAINING spectral path (combined-factor DFT einsums,
    ops/dft.py — what actually runs under jit on the chip) against the
    actual reference generator, forced on CPU where the tf32 hint
    resolves to exact fp32 matmuls."""
    from mtd_gan_tpu.models.mtd_gan import ResFFTGenerator
    from mtd_gan_tpu.ops import fft_conv as fc

    torch.manual_seed(0)
    gen_t = ref.networks.ResFFT_Generator(
        in_channels=1, out_channels=32, num_layers=10, kernel_size=3, padding=1
    ).eval()
    x = jax.random.uniform(rng, (1, 64, 64, 1), jnp.float32)
    with torch.no_grad():
        want = _nhwc(gen_t(_nchw(x).float()))

    monkeypatch.setattr(fc, "_use_dft_matmul", lambda: True)
    params = _gen_params_from_torch(gen_t.state_dict())
    gen_j = ResFFTGenerator(features=32, num_layers=10)
    got = jax.jit(gen_j.apply)({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
