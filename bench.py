"""Headline benchmark: 512x512 denoised CT slices/sec on one chip through the
flagship MTD-GAN Res-FFT-Conv generator (the BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the driver target of 5x an H100-PyTorch
reference. The reference repo publishes no throughput numbers (BASELINE.md),
so the H100 figure is an analytic estimate ANCHORED by a measurement of the
actual reference model on this host:
  * measured: /root/reference arch/Ours ResFFT_Generator, torch-CPU,
    1 thread, 512x512: 55.9 s/slice = 0.0179 slices/s (~5 GFLOP/s effective
    on the ~0.29 TFLOP/slice workload — 22 enc/dec convs + 21 FFT blocks at
    512x512x32, fp32).
  * scaling: H100 PyTorch (TF32 cuDNN + cuFFT, 32-channel convs at low
    tensor-core utilization) ~ 60 TFLOP/s effective on this op mix
    => ~200 slices/sec => driver 5x target = 1000 slices/sec/chip.
vs_baseline = value / 1000 (>= 1.0 means the 5x target is met).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

H100_PYTORCH_SLICES_PER_SEC_EST = 200.0
TARGET = 5.0 * H100_PYTORCH_SLICES_PER_SEC_EST


def _setup_cache():
    """Same per-backend persistent compile cache as __graft_entry__ — the
    big generator compiles (~13 min cold) hit it on repeat runs."""
    import __graft_entry__

    __graft_entry__._setup_cache()


def _measure(fwd, x, batch, n_iters=20):
    float(jnp.sum(fwd(x)))  # warmup/compile; hard sync via host fetch —
    #                         block_until_ready can report early (tunnel)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(x)
    float(jnp.sum(out))     # drains the serial execution queue
    return batch * n_iters / (time.perf_counter() - t0)


def main():
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    _setup_cache()
    model = MTDGANModel(gen_features=32, num_layers=10, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(2024)
    params = jax.jit(model.Generator.init)(
        rng, jnp.zeros((1, 512, 512, 1), jnp.float32))["params"]

    # Bench the PRODUCTION inference path (model.generate routes to the
    # channel-major Pallas pipeline on TPU — VERDICT r2 item 9) and sweep
    # batch sizes, reporting the best configuration as the headline.
    # Best-known batch first so a COLD-cache run (each 512x512 pipeline
    # shape compiles ~3 min through the tunnel) reports a strong number
    # even if the wall-clock budget cuts the sweep short.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    t_start = time.perf_counter()
    best = 0.0
    for batch in (32, 64, 16, 8, 4):
        if best > 0.0 and time.perf_counter() - t_start > budget_s:
            print(f"# budget exhausted, skipping batch {batch}",
                  file=sys.stderr)
            continue
        x = jax.random.uniform(rng, (batch, 512, 512, 1), jnp.float32)
        fwd = lambda inp: model.generate(params, inp)
        try:
            sps = _measure(fwd, x, batch)
        except Exception as e:  # e.g. HBM limit at large batch
            print(f"# batch {batch} failed: {type(e).__name__}",
                  file=sys.stderr)
            continue
        print(f"# batch {batch}: {sps:.2f} slices/s", file=sys.stderr)
        best = max(best, sps)
    print(
        json.dumps(
            {
                "metric": "512x512 CT slices/sec/chip (MTD-GAN G inference)",
                "value": round(best, 2),
                "unit": "slices/sec",
                "vs_baseline": round(best / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
