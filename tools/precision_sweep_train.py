#!/usr/bin/env python
"""Grad-side error/speed budget for single-pass bf16 factor tables in the
FUSED Pallas TRAINING path (round-5 follow-up to tools/precision_sweep.py,
which retired the x2 bf16x2 MXU pass on the INFERENCE pipeline).

Measures, at the production training geometry (batch 160, 64x64 patches,
features=32, L=10, bf16 compute, pcgrad/pruned):

  1. full PCGrad train-step ms with g_forward="pallas" at g_precision
     "bf16x2" (shipped r4 default) vs "bf16" (single-pass tables);
  2. worst-leaf generator-grad relative error of EACH precision vs the fp32
     einsum graph (the same oracle tests/test_pallas_train.py pins) — if
     single-pass sits at the same representation floor as bf16x2, the lo
     pass buys nothing on the backward either;
  3. a short trajectory A/B: d/g losses over --steps steps, max relative
     drift between the two precisions.

Usage: python tools/precision_sweep_train.py [--batch 160] [--iters 6]
       [--steps 4] [--grad-batch 32] [--cpu]
Match: /root/reference engine.py:26-76 (step), arch/Ours/networks.py:24-29
(the spectral branch whose factor tables are at stake).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(v) -> float:
    return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]))


def _bench_step(trainer, state, x, y, n_iters):
    t0 = time.perf_counter()
    state, m = trainer.train_step(state, x, y)
    _sync(m["g_loss"])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n_iters):
        t0 = time.perf_counter()
        state, m = trainer.train_step(state, x, y)
        _sync(m["g_loss"])
        best = min(best, time.perf_counter() - t0)
    return compile_s, best * 1000.0


def _worst_leaf_relerr(g_ref, g_test):
    flat_t = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_test)}
    worst, worst_key = 0.0, None
    for kp_, ve in jax.tree_util.tree_leaves_with_path(g_ref):
        ks = jax.tree_util.keystr(kp_)
        ve = np.asarray(ve, np.float32)
        vt = np.asarray(flat_t[ks], np.float32)
        rel = float(np.abs(vt - ve).max() / (np.abs(ve).max() + 1e-8))
        if rel > worst:
            worst, worst_key = rel, ks
    return worst, worst_key


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=160)
    ap.add_argument("--grad-batch", type=int, default=32,
                    help="batch for the fp32-oracle grad-parity check "
                         "(full 160 would also need the fp32 einsum step)")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-geometry interpret-mode smoke test")
    args = ap.parse_args()

    if args.cpu:
        # mirror tests/conftest.py: opt-level 0 keeps XLA:CPU off the
        # bf16-dot thunk path its runtime can't execute (and compiles fast)
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_backend_optimization_level=0")
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.grad_batch = 4, 4
        args.features, args.layers = 8, 2
        args.iters, args.steps = 0, 0  # interpret mode: parity only

    import __graft_entry__
    __graft_entry__._setup_cache()

    from mtd_gan_tpu.engine import MTDGANTrainer
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel
    from mtd_gan_tpu.ops.pallas_train import resfft_generator_train

    rng = jax.random.PRNGKey(1)
    hw = 32 if args.cpu else 64
    x = jax.random.uniform(rng, (args.batch, hw, hw, 1))
    y = jnp.clip(x + 0.03, 0, 1)

    # ---- 2. grad parity vs the fp32 einsum oracle --------------------------
    model32 = MTDGANModel(gen_features=args.features, num_layers=args.layers,
                          dtype=jnp.float32)
    params32 = jax.jit(model32.Generator.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 1), jnp.float32)
    )["params"]
    xg = x[: args.grad_batch]
    yg = y[: args.grad_batch]

    def loss(gen):
        return lambda p: jnp.mean((gen(p).astype(jnp.float32) - yg) ** 2)

    g_oracle = jax.jit(jax.grad(loss(
        lambda p: model32.Generator.apply({"params": p}, xg))))(params32)
    # act f32 isolates the factor-TABLE rounding; act bf16 is production
    # (there the bf16 boundary floor may mask the table term — report both).
    # XLA:CPU's DotThunk can't run bf16 x bf16 -> f32, so --cpu is f32-only.
    acts = (jnp.float32,) if args.cpu else (jnp.float32, jnp.bfloat16)
    for act in acts:
        for prec in ("bf16x2", "bf16"):
            g_p = jax.jit(jax.grad(loss(
                lambda p: resfft_generator_train(
                    p, xg, num_layers=args.layers, precision=prec,
                    act_dtype=act))))(params32)
            worst, key = _worst_leaf_relerr(g_oracle, g_p)
            print(json.dumps(
                {"bench": f"grad_parity_{prec}_act{jnp.dtype(act).name}",
                 "worst_leaf_relerr": round(worst, 5),
                 "worst_leaf": key}), flush=True)

    if args.cpu:
        return  # interpret mode: table-parity plumbing check only

    # ---- 1. + 3. step timing and trajectory A/B ----------------------------
    rows = []
    traj = {}
    for prec in ("bf16x2", "bf16"):
        model = MTDGANModel(gen_features=args.features,
                            num_layers=args.layers, dtype=jnp.bfloat16)
        trainer = MTDGANTrainer(model, method="pcgrad",
                                grad_backend="pruned",
                                g_forward="pallas",
                                g_precision=prec)
        state = trainer.create_state(jax.random.PRNGKey(0))
        losses = []
        for _ in range(args.steps):
            state, m = trainer.train_step(state, x, y)
            losses.append((float(m["d_loss"]), float(m["g_loss"])))
        traj[prec] = losses
        c, ms = _bench_step(trainer, state, x, y, args.iters)
        rows.append((prec, ms, c))
        print(json.dumps({"bench": f"step_{prec}", "ms": round(ms, 1),
                          "compile_s": round(c, 1),
                          "losses": [[round(d, 5), round(g, 5)]
                                     for d, g in losses]}), flush=True)

    drift = max(
        max(abs(a[0] - b[0]) / (abs(b[0]) + 1e-8),
            abs(a[1] - b[1]) / (abs(b[1]) + 1e-8))
        for a, b in zip(traj["bf16"], traj["bf16x2"]))
    print(json.dumps({"bench": "trajectory_drift",
                      "max_rel": round(drift, 5),
                      "steps": args.steps}), flush=True)

    print("\n| g_precision | step ms | compile_s |\n|---|---|---|")
    for prec, ms, c in rows:
        print(f"| {prec} | {ms:.1f} | {c:.0f} |")


if __name__ == "__main__":
    main()
