"""2-D real DFT as MXU matmuls — the TPU-fast path under the Res-FFT-Conv
block.

XLA's generic TPU FFT lowering is slow for this workload (measured ~10 ms
per 512x512x128-slab direction on v5e); expressing the same transform as
dense DFT factor matmuls keeps all the work on the MXU:

  rfft2(x)  = F_H @ (x @ F_W)          F_W: (W, K) half-spectrum factors,
  irfft2(z) = real(F_H^{-1} @ z) @ G_W  with Hermitian-fold weights in G_W,

all with 'ortho' normalization folded into the factors. Numerics match
jnp.fft.rfft2/irfft2 to ~1e-5 in fp32 (validated in tests/test_dft.py).
Complex arithmetic is spelled out in real/imag parts so XLA sees plain
fp32 matmuls (TPU fp32 matmul = bf16x3 passes, ~1e-6 accurate).

Same insight as FlashFFTConv (arXiv:2311.05908): on matrix-unit hardware,
FFTs decomposed into dense matmul stages beat generic FFT lowerings. At
N=512 the single-stage dense DFT already fills the 128-wide MXU (any
Cooley-Tukey split would leave a sub-128 contraction), so one factor
matmul per axis is the right depth here.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@lru_cache(maxsize=16)
def _rdft_w_factors(w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Forward real-DFT factors along the last spatial axis:
    x(..., W) @ (re - i*im) -> half spectrum (..., K), K = W//2 + 1,
    ortho-normalized."""
    k = w // 2 + 1
    n = np.arange(w)[:, None]
    f = np.arange(k)[None, :]
    ang = 2.0 * np.pi * n * f / w
    scale = 1.0 / np.sqrt(w)
    return (np.cos(ang) * scale).astype(np.float32), (
        -np.sin(ang) * scale
    ).astype(np.float32)


@lru_cache(maxsize=16)
def _irdft_w_factors(w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse factors along W with the Hermitian fold: for half-spectrum
    Z(..., K): out(..., W) = Re(Z) @ A + Im(Z) @ B, ortho-normalized."""
    k = w // 2 + 1
    kk = np.arange(k)[:, None]
    n = np.arange(w)[None, :]
    ang = 2.0 * np.pi * kk * n / w
    c = np.full((k, 1), 2.0)
    c[0] = 1.0
    if w % 2 == 0:
        c[-1] = 1.0
    scale = 1.0 / np.sqrt(w)
    a = (c * np.cos(ang) * scale).astype(np.float32)
    b = (-c * np.sin(ang) * scale).astype(np.float32)
    return a, b


@lru_cache(maxsize=16)
def _dft_h_factors(h: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full complex DFT factors along H (ortho): F[m, n] = exp(-2pi i mn/H)."""
    m = np.arange(h)[:, None]
    n = np.arange(h)[None, :]
    ang = 2.0 * np.pi * m * n / h
    scale = 1.0 / np.sqrt(h)
    return (np.cos(ang) * scale).astype(np.float32), (
        -np.sin(ang) * scale
    ).astype(np.float32)


@lru_cache(maxsize=16)
def _h_combined_fwd(h: int) -> np.ndarray:
    """Complex-combined forward H factor, shape (2, 2, h, h) indexed
    [t, s, m, n]: output part t (0=re, 1=im) from input part s (0=re,
    1=im). One einsum contracting (s, n) — a single 2h-deep GEMM —
    replaces the four h-deep real einsums of the naive complex matmul
    (at the 64x64 training patches 2h = 128 exactly fills the MXU's
    contraction depth; at h-deep the MXU ran half empty)."""
    hr, hi = _dft_h_factors(h)
    f = np.empty((2, 2, h, h), np.float32)
    f[0, 0], f[0, 1] = hr, -hi
    f[1, 0], f[1, 1] = hi, hr
    return f


@lru_cache(maxsize=16)
def _h_combined_inv(h: int) -> np.ndarray:
    """Conjugate (inverse) variant of :func:`_h_combined_fwd`."""
    hr, hi = _dft_h_factors(h)
    f = np.empty((2, 2, h, h), np.float32)
    f[0, 0], f[0, 1] = hr, hi
    f[1, 0], f[1, 1] = -hi, hr
    return f


@lru_cache(maxsize=16)
def _w_combined_fwd(w: int) -> np.ndarray:
    """[wr | wi] K-combined forward W factor, shape (w, 2k)."""
    wr, wi = _rdft_w_factors(w)
    return np.concatenate([wr, wi], axis=1)


@lru_cache(maxsize=16)
def _w_combined_inv(w: int) -> np.ndarray:
    """Stacked inverse W factors with the Hermitian fold, shape (2, k, w)
    indexed [t, k, w] for input part t (0=re, 1=im)."""
    a, b = _irdft_w_factors(w)
    return np.stack([a, b])


def _hilo(f: np.ndarray):
    """hi/lo bf16 split of a constant factor table (hi + lo == f to ~1e-7
    relative — the same factor-precision scheme the Pallas inference
    pipeline validates at 3e-5 end-to-end, ops/pallas_pipeline.py)."""
    import ml_dtypes

    hi = f.astype(ml_dtypes.bfloat16)
    lo = (f - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


@lru_cache(maxsize=16)
def _h_fwd_hilo(h: int):
    return _hilo(_h_combined_fwd(h))


@lru_cache(maxsize=16)
def _h_inv_hilo(h: int):
    return _hilo(_h_combined_inv(h))


@lru_cache(maxsize=16)
def _w_fwd_hilo(w: int):
    return _hilo(_w_combined_fwd(w))


@lru_cache(maxsize=16)
def _w_inv_hilo(w: int):
    return _hilo(_w_combined_inv(w))


def _dot2(eq: str, a: Array, hi, lo) -> Array:
    """2-pass bf16 einsum: bf16 activations x hi/lo-split f32 factor.

    vs 'tensorfloat32' (3 bf16 passes on f32 operands): one fewer MXU
    pass and half the operand traffic, at the cost of bf16-rounding the
    activation — the bf16-training tradeoff already accepted by the
    model's compute dtype."""
    a16 = a.astype(jnp.bfloat16)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    if jax.default_backend() != "tpu":
        # CPU/GPU: bf16 x bf16 dots are unsupported by the unoptimized CPU
        # thunks; upcasting the ALREADY-ROUNDED operands keeps the numerics
        # of the TPU bf16 dot (which accumulates in f32 anyway)
        a16, hi, lo = (t.astype(jnp.float32) for t in (a16, hi, lo))
    return jnp.einsum(eq, a16, hi,
                      preferred_element_type=jnp.float32) + jnp.einsum(
        eq, a16, lo, preferred_element_type=jnp.float32)


def rfft2_matmul(x: Array) -> Tuple[Array, Array]:
    """NHWC real input -> (real, imag) half-spectra, shape (N, H, K, C),
    equal to jnp.fft.rfft2(x, axes=(1, 2), norm='ortho').

    Complex-combined factors (2 einsums instead of 6): the W transform
    emits both spectrum parts from one K-combined factor, and the H
    transform contracts parts and rows together as one (2h)-deep GEMM —
    the MXU-filling formulation at training patch sizes (h=64 -> 128)."""
    n, h, w, c = x.shape
    k = w // 2 + 1
    x32 = x.astype(jnp.float32)
    # W-axis real transform: (N, H, W, C) x (W, 2K) -> (N, H, 2, K, C)
    fw = jnp.asarray(_w_combined_fwd(w))
    z = jnp.einsum("nhwc,wk->nhkc", x32, fw).reshape(n, h, 2, k, c)
    # H-axis complex transform, parts + rows contracted together
    fh = jnp.asarray(_h_combined_fwd(h))
    out = jnp.einsum("tsmh,nhskc->ntmkc", fh, z)
    return out[:, 0], out[:, 1]


def fft2_matmul(x: Array) -> Tuple[Array, Array]:
    """Unnormalized full complex 2-D DFT of a real (N, H, W) batch via factor
    matmuls (the TPU-accurate path; XLA's generic TPU FFT round-trips at
    ~4e-1 max-abs error on 512x512 — PERF.md). Matches
    torch.fft.fft2(x) == old torch.rfft(x, 2, onesided=False)."""
    n, h, w = x.shape
    hr_h, hi_h = _dft_h_factors(h)
    hr_w, hi_w = _dft_h_factors(w)
    # undo the ortho scaling baked into the factors
    fr_h = jnp.asarray(hr_h) * np.sqrt(h)
    fi_h = jnp.asarray(hi_h) * np.sqrt(h)
    fr_w = jnp.asarray(hr_w) * np.sqrt(w)
    fi_w = jnp.asarray(hi_w) * np.sqrt(w)
    x32 = x.astype(jnp.float32)
    # W axis first (real input)
    zr = jnp.einsum("nhw,wk->nhk", x32, fr_w)
    zi = jnp.einsum("nhw,wk->nhk", x32, fi_w)
    # H axis (complex)
    out_r = jnp.einsum("mh,nhk->nmk", fr_h, zr) - jnp.einsum("mh,nhk->nmk", fi_h, zi)
    out_i = jnp.einsum("mh,nhk->nmk", fr_h, zi) + jnp.einsum("mh,nhk->nmk", fi_h, zr)
    return out_r, out_i


def ifft2_matmul(z_re: Array, z_im: Array) -> Tuple[Array, Array]:
    """Normalized (1/HW) full complex 2-D inverse DFT of (N, H, W) spectra,
    matching torch.fft.ifft2 == old torch.ifft(· , 2)."""
    n, h, w = z_re.shape
    hr_h, hi_h = _dft_h_factors(h)
    hr_w, hi_w = _dft_h_factors(w)
    # conjugate factors with 1/N normalization (factors carry 1/sqrt(N))
    fr_h = jnp.asarray(hr_h) / np.sqrt(h)
    fi_h = -jnp.asarray(hi_h) / np.sqrt(h)
    fr_w = jnp.asarray(hr_w) / np.sqrt(w)
    fi_w = -jnp.asarray(hi_w) / np.sqrt(w)
    tr = jnp.einsum("mh,nhk->nmk", fr_h, z_re) - jnp.einsum("mh,nhk->nmk", fi_h, z_im)
    ti = jnp.einsum("mh,nhk->nmk", fr_h, z_im) + jnp.einsum("mh,nhk->nmk", fi_h, z_re)
    out_r = jnp.einsum("nhk,kw->nhw", tr, fr_w) - jnp.einsum("nhk,kw->nhw", ti, fi_w)
    out_i = jnp.einsum("nhk,kw->nhw", tr, fi_w) + jnp.einsum("nhk,kw->nhw", ti, fr_w)
    return out_r, out_i


def irfft2_matmul(z_re: Array, z_im: Array, s: Tuple[int, int]) -> Array:
    """(real, imag) half-spectra (N, H, K, C) -> real NHWC, equal to
    jnp.fft.irfft2(z, s=s, axes=(1, 2), norm='ortho').

    Complex-combined factors (2 einsums instead of 6) — see
    :func:`rfft2_matmul`."""
    h, w = s
    zs = jnp.stack([z_re, z_im], axis=2)  # (N, H, 2, K, C)
    # inverse H-axis complex transform (conjugate factors), one 2h-GEMM
    fh = jnp.asarray(_h_combined_inv(h))
    t = jnp.einsum("tsmh,nhskc->ntmkc", fh, zs)
    # inverse W-axis with Hermitian fold, parts contracted together
    fw = jnp.asarray(_w_combined_inv(w))
    return jnp.einsum("ntmkc,tkw->nmwc", t, fw)


def rfft2_matmul_bf16x2(x: Array) -> Tuple[Array, Array]:
    """bf16-compute variant of :func:`rfft2_matmul` (2-pass hi/lo factor
    dots, bf16 stage boundary between the W and H transforms). For the
    bf16 training mode — ~1.5x fewer MXU passes than the tf32 path."""
    n, h, w, c = x.shape
    k = w // 2 + 1
    z = _dot2("nhwc,wk->nhkc", x, *_w_fwd_hilo(w)).reshape(n, h, 2, k, c)
    out = _dot2("nhskc,tsmh->ntmkc", z, *_h_fwd_hilo(h))
    return out[:, 0], out[:, 1]


def irfft2_matmul_bf16x2(z_re: Array, z_im: Array,
                         s: Tuple[int, int]) -> Array:
    """bf16-compute variant of :func:`irfft2_matmul`."""
    h, w = s
    zs = jnp.stack([z_re, z_im], axis=2)  # (N, H, 2, K, C)
    t = _dot2("nhskc,tsmh->ntmkc", zs, *_h_inv_hilo(h))
    return _dot2("ntmkc,tkw->nmwc", t, *_w_inv_hilo(w))
