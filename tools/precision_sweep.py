"""Per-stage bf16x2 error/speed budget for the fused Pallas pipeline (r5).

Every MXU dot in the fused block kernel pays TWO passes (hi/lo bf16 factor
split, "bf16x2") because round 2 measured the all-single-pass extreme at
~4e-2 output error. This sweep measures the cost of dropping the lo pass
stage-BY-stage at flagship geometry (features=32, L=10, 512x512) on the
real chip:

  spec "sp:XXXXX" = pass count per stage in order (W-fwd, H-fwd, mix,
  H-inv, W-inv); '1' = single-pass bf16 factor, '2' = hi/lo bf16x2.

Error reference: the shipped bf16x2 pipeline output (its own deviation vs
the fp32 einsum path is test-pinned at 3.0e-5 — two orders below the
1e-3-scale errors this sweep judges, and using it avoids a ~13-min einsum
compile on chip). Metrics per spec:

  * max-abs / RMS error vs the bf16x2 reference
  * PSNR of the variant AGAINST the reference output
  * projected PSNR drift for a 32 dB denoiser: a denoiser whose output
    error RMS is sigma (32 dB => sigma ~ 0.025 * range) that picks up an
    independent extra error of RMS eps drifts by
    10*log10(1 + (eps/sigma)^2) dB; the driver gate is <0.1% of 32 dB
    = 0.032 dB => eps <= 0.086*sigma (PSNR vs ref >= ~53 dB).
  * batch-4 wall time (bench-style hard host-fetch sync).

Usage: python tools/precision_sweep.py [spec ...]   (default: full set)
Match: /root/reference/arch/Ours/networks.py:24-29 (FFT_ConvBlock math).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

FLAGSHIP = dict(features=32, num_layers=10)
H = W = 512
BATCH = 4
N_ITERS = 20
SIGMA_REL = 0.025  # 32 dB denoiser error RMS relative to range


def _phantom(rng, n):
    """CT-ish test input: smooth anatomy + noise (not pure white noise —
    spectral content matters for DFT-table rounding error propagation)."""
    base = jax.random.uniform(rng, (n, H // 8, W // 8, 1), jnp.float32)
    img = jax.image.resize(base, (n, H, W, 1), "cubic")
    noise = 0.05 * jax.random.normal(jax.random.fold_in(rng, 1),
                                     (n, H, W, 1), jnp.float32)
    return jnp.clip(img + noise, 0.0, 1.0)


def main():
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel
    from mtd_gan_tpu.ops.pallas_pipeline import resfft_generator_jit

    import __graft_entry__
    __graft_entry__._setup_cache()

    specs = sys.argv[1:] or [
        "bf16x2",      # baseline (== sp:22222)
        "sp:12222", "sp:21222", "sp:22122", "sp:22212", "sp:22221",
        "sp:11111",
    ]

    # identical construction to bench.py so the einsum init program and
    # the bf16x2 pipeline kernels come warm from the persistent cache
    model = MTDGANModel(gen_features=FLAGSHIP["features"],
                        num_layers=FLAGSHIP["num_layers"],
                        dtype=jnp.bfloat16)
    gen = model.Generator
    rng = jax.random.PRNGKey(2024)
    params = jax.jit(gen.init)(
        rng, jnp.zeros((1, H, W, 1), jnp.float32))["params"]
    x = _phantom(jax.random.PRNGKey(7), BATCH)

    def run(spec):
        return resfft_generator_jit(params, x, num_layers=gen.num_layers,
                                    precision=spec)

    results = []
    ref = None
    for spec in specs:
        t_c = time.perf_counter()
        out = run(spec)
        out32 = jnp.asarray(out, jnp.float32)
        float(jnp.sum(out32))  # hard sync (tunnel: block_until_ready lies)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            out = run(spec)
        float(jnp.sum(out))
        ms = (time.perf_counter() - t0) * 1000.0 / N_ITERS
        row = {"spec": spec, "ms_batch4": round(ms, 1),
               "slices_s": round(BATCH * 1000.0 / ms, 1),
               "compile_s": round(compile_s, 1)}
        if ref is None:
            ref = jnp.asarray(out, jnp.float32)
            rng_ref = float(jnp.max(ref) - jnp.min(ref))
            row.update(max_abs=0.0, rms=0.0, psnr_vs_ref_db=None,
                       drift_db_32db=0.0)
        else:
            diff = jnp.asarray(out, jnp.float32) - ref
            max_abs = float(jnp.max(jnp.abs(diff)))
            rms = float(jnp.sqrt(jnp.mean(diff * diff)))
            sigma = SIGMA_REL * rng_ref
            psnr = (20.0 * jnp.log10(rng_ref / rms) if rms > 0
                    else float("inf"))
            drift = 10.0 * jnp.log10(1.0 + (rms / sigma) ** 2)
            row.update(max_abs=round(max_abs, 6), rms=round(rms, 7),
                       psnr_vs_ref_db=round(float(psnr), 1),
                       drift_db_32db=round(float(drift), 4))
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n| spec | ms(b4) | slices/s | max-abs | RMS | PSNR-vs-ref dB "
          "| 32dB drift dB |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['spec']} | {r['ms_batch4']} | {r['slices_s']} "
              f"| {r['max_abs']} | {r['rms']} | {r['psnr_vs_ref_db']} "
              f"| {r['drift_db_32db']} |")


if __name__ == "__main__":
    main()
