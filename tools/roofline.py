#!/usr/bin/env python
"""Per-kernel device-time decomposition for the two headline programs
(VERDICT r4 item 2: put profiler evidence behind the floor claims).

Captures a jax.profiler trace of
  (a) the batch-N 512x512 inference pipeline (21 fused block kernels), and
  (b) the full PCGrad train step at batch 160 (fused Pallas fwd+bwd),
then decomposes DEVICE-track span time by kernel name: total per kernel,
share of the program, and inter-kernel gap time. Prints a markdown table
for PERF.md.

Usage:
  python tools/roofline.py infer [--batch 64] [--iters 5]
  python tools/roofline.py train [--iters 3]
  python tools/roofline.py analyze <profile_dir>   (re-analyze only)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_latest_trace(profile_dir):
    paths = []
    for pat in ("**/*.trace.json.gz", "**/*.trace.json"):
        paths += glob.glob(os.path.join(profile_dir, pat), recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f), path


def _device_spans(trace):
    """Spans on TPU device tracks: [(t0_us, dur_us, name, (pid,tid))]."""
    pnames, tnames = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pnames[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                tnames[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
    dev_pids = {pid for pid, n in pnames.items()
                if "TPU" in n or "/device:" in n.upper() or "XLA" in n}
    spans = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pid, tid = ev.get("pid"), ev.get("tid")
        tname = tnames.get((pid, tid), "")
        on_dev = pid in dev_pids or re.search(
            r"(XLA Ops|TensorFlow Ops|Steps|XLA Modules)", tname)
        if not on_dev:
            continue
        spans.append((ev.get("ts", 0), ev.get("dur", 0),
                      ev.get("name", "?"), (pid, tid), tname))
    return spans, pnames, tnames


_GROUPS = [
    # (label, regex on kernel/op name) — first match wins
    ("fused block kernel", r"block_fused|kern.*block|pallas.*block"),
    ("pallas train fwd/bwd", r"pallas_train|train_block|block_(fwd|bwd)"),
    ("pallas (other)", r"pallas|custom-call|tpu_custom_call"),
    ("conv (XLA)", r"conv"),
    ("dot/matmul (XLA)", r"dot|gemm|matmul"),
    ("fusion (XLA)", r"^(loop_)?fusion|^wide|input_fusion|output_fusion"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("dynamic-update/slice", r"dynamic|slice|gather|scatter"),
    ("reduce", r"reduce|all-reduce|sum"),
    ("rng", r"rng|threefry|random"),
]


def _bucket(name):
    low = name.lower()
    for label, pat in _GROUPS:
        if re.search(pat, low):
            return label
    return "other"


def analyze(profile_dir):
    trace, path = _load_latest_trace(profile_dir)
    spans, pnames, tnames = _device_spans(trace)
    if not spans:
        print("process names seen:", sorted(set(pnames.values())))
        print("thread names seen:", sorted(set(tnames.values()))[:40])
        raise SystemExit("no device spans recognized — check track names")

    # Prefer the finest-grained device track available: XLA Ops > Modules
    by_track = defaultdict(list)
    for ts, dur, name, key, tname in spans:
        by_track[(key, tname)].append((ts, dur, name))
    # pick the track with the most spans that isn't a "Steps" summary
    cand = [(k, v) for k, v in by_track.items() if "step" not in k[1].lower()]
    (key, tname), ops = max(cand, key=lambda kv: len(kv[1]))
    print(f"# analyzing track {key} '{tname}' with {len(ops)} spans "
          f"(trace: {os.path.basename(path)})")

    ops.sort()
    t0 = ops[0][0]
    t1 = max(ts + dur for ts, dur, _ in ops)
    wall = t1 - t0
    busy = sum(dur for _, dur, _ in ops)

    per_name = defaultdict(float)
    per_bucket = defaultdict(float)
    for _, dur, name in ops:
        per_name[name] += dur
        per_bucket[_bucket(name)] += dur

    print(f"\nwall (first..last op) {wall/1e3:.1f} ms; device busy "
          f"{busy/1e3:.1f} ms ({100*busy/max(wall,1):.1f}%); "
          f"gaps {(wall-busy)/1e3:.1f} ms")

    print("\n| bucket | ms | % busy |\n|---|---|---|")
    for label, us in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"| {label} | {us/1e3:.1f} | {100*us/busy:.1f}% |")

    print("\n| top-15 op | ms | % busy |\n|---|---|---|")
    for name, us in sorted(per_name.items(), key=lambda kv: -kv[1])[:15]:
        print(f"| {name[:70]} | {us/1e3:.1f} | {100*us/busy:.1f}% |")


def capture_infer(batch, iters, outdir):
    import jax
    import jax.numpy as jnp
    import __graft_entry__
    __graft_entry__._setup_cache()
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    model = MTDGANModel(gen_features=32, num_layers=10, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(2024)
    params = jax.jit(model.Generator.init)(
        rng, jnp.zeros((1, 512, 512, 1), jnp.float32))["params"]
    x = jax.random.uniform(rng, (batch, 512, 512, 1), jnp.float32)
    fwd = lambda: model.generate(params, x)
    float(jnp.sum(fwd()))  # compile + warm
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            out = fwd()
        float(jnp.sum(out))
    print(f"# trace written to {outdir}")


def capture_train(iters, outdir):
    import jax
    import jax.numpy as jnp
    import __graft_entry__
    __graft_entry__._setup_cache()
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel
    from mtd_gan_tpu.engine import MTDGANTrainer

    model = MTDGANModel(gen_features=32, num_layers=10, dtype=jnp.bfloat16)
    trainer = MTDGANTrainer(model, method="pcgrad")
    state = trainer.create_state(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (160, 64, 64, 1))
    y = jnp.clip(x + 0.03, 0, 1)
    state, m = trainer.train_step(state, x, y)  # compile + warm
    float(m["d_loss"])
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            state, m = trainer.train_step(state, x, y)
        float(m["d_loss"])
    print(f"# trace written to {outdir}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "infer"
    args = sys.argv[2:]

    def _opt(flag, default):
        return int(args[args.index(flag) + 1]) if flag in args else default

    if mode == "analyze":
        analyze(args[0])
        return
    outdir = f"/tmp/roofline_{mode}"
    if mode == "infer":
        capture_infer(_opt("--batch", 64), _opt("--iters", 5), outdir)
    elif mode == "train":
        capture_train(_opt("--iters", 3), outdir)
    else:
        raise SystemExit(f"unknown mode {mode}")
    analyze(outdir)


if __name__ == "__main__":
    main()
