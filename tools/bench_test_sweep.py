"""Measure test.py's metric-sweep throughput (slices/s) on synthetic data.

The reference's test loop (engine.py:107-183) host-syncs every metric per
slice; ours batches the fetches (engine/loops.py run_test, VERDICT r3 weak
#5). This tool records the measured end-to-end sweep rate — model forward +
RMSE/PSNR/SSIM + PNG/CSV artifacts — over a Mayo-sized test set (211 slices
by default) so PERF.md carries a number, not a claim.

Usage: python tools/bench_test_sweep.py [--n 211] [--model MTD_GAN_Method]
       [--feature-metrics]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", default=211, type=int)
    ap.add_argument("--model", default="MTD_GAN_Method", type=str)
    ap.add_argument("--feature-metrics", action="store_true")
    ap.add_argument("--model-kwargs", default="", type=str)
    ap.add_argument("--eval-batch", default=8, type=int,
                    help="grouped-forward size (dn at 512x512 is HBM-bound: "
                         "batch 8 crashes the v5e worker — see PERF.md)")
    args = ap.parse_args()

    import jax

    import __graft_entry__

    __graft_entry__._setup_cache()

    from mtd_gan_tpu.data.transforms import make_eval_preprocess
    from mtd_gan_tpu.engine.loops import build_trainer, family_of, run_test
    from mtd_gan_tpu.models import get_model

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:512, :512]
    disk = ((yy - 256) ** 2 + (xx - 256) ** 2) < 180**2
    hu = np.full((512, 512), -1000, np.int16)
    hu[disk] = 40

    def loader():
        for i in range(args.n):
            noisy = (hu + rng.normal(0, 25, hu.shape)).astype(np.int16)
            yield (noisy[None, :, :, None], hu[None, :, :, None],
                   [f"/synth/{i:04d}.IMA"])

    model = get_model(args.model, **json.loads(args.model_kwargs or "{}"))
    family = family_of(args.model)

    class _A:
        optimizer, lr, method = "adamw", 1e-4, ""

    trainer = build_trainer(args.model, model, _A())
    state = trainer.create_state(jax.random.PRNGKey(42))
    eval_pre = make_eval_preprocess("window", "mayo")

    with tempfile.TemporaryDirectory() as tmp:
        # warm the compiles on 2 slices so the measurement is steady-state
        run_test(model, state, list(loader())[:2], eval_pre, family,
                 save_dir=os.path.join(tmp, "warm"),
                 compute_fid_metric=args.feature_metrics,
                 compute_feature_metrics=args.feature_metrics,
                 eval_batch=args.eval_batch)
        t0 = time.perf_counter()
        run_test(model, state, loader(), eval_pre, family,
                 save_dir=os.path.join(tmp, "run"),
                 compute_fid_metric=args.feature_metrics,
                 compute_feature_metrics=args.feature_metrics,
                 eval_batch=args.eval_batch)
        dt = time.perf_counter() - t0
    print(json.dumps({
        "bench": f"test_sweep/{args.model}"
                 + ("+features" if args.feature_metrics else ""),
        "slices": args.n, "seconds": round(dt, 1),
        "slices_per_s": round(args.n / dt, 2),
    }))


if __name__ == "__main__":
    main()
