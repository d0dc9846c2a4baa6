#!/usr/bin/env python
"""Quantify host-loader / device-step overlap from a jax.profiler trace.

Reads the trace.json.gz produced by `train.py --profile-dir` (VERDICT r2
item 8: prove the decode/H2D pipeline actually overlaps the TPU step, not
just that the code wires a prefetch queue). Reports, per wall-clock:

  * total span of train_step dispatch+execute on the main thread,
  * total span of loader decode work on the worker threads,
  * the fraction of decode work that lies INSIDE step spans (overlap),
  * main-thread time blocked on the loader queue (should be ~0 when the
    pipeline keeps up).

Usage: python tools/analyze_trace.py <profile_dir>
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_trace(profile_dir: str) -> dict:
    pats = [
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json"),
    ]
    paths = []
    for p in pats:
        paths += glob.glob(p, recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json[.gz] under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f), path


def spans_by_thread(trace: dict):
    """-> {(pid, tid): [(t0, t1, name)]}, thread name map, process name map."""
    tnames, pnames = {}, {}
    spans = defaultdict(list)
    for ev in trace.get("traceEvents", []):
        ph = ev.get("ph")
        if ph == "M":
            if ev.get("name") == "thread_name":
                tnames[(ev.get("pid"), ev.get("tid"))] = ev["args"]["name"]
            elif ev.get("name") == "process_name":
                pnames[ev.get("pid")] = ev["args"]["name"]
        elif ph == "X":
            t0 = ev.get("ts", 0.0)
            spans[(ev.get("pid"), ev.get("tid"))].append(
                (t0, t0 + ev.get("dur", 0.0), ev.get("name", ""))
            )
    return spans, tnames, pnames


def union_len(ivs):
    ivs = sorted(ivs)
    tot, cur0, cur1 = 0.0, None, None
    out = []
    for a, b, *_ in ivs:
        if cur1 is None or a > cur1:
            if cur1 is not None:
                out.append((cur0, cur1))
                tot += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    if cur1 is not None:
        out.append((cur0, cur1))
        tot += cur1 - cur0
    return tot, out


def overlap_len(ivs_a, ivs_b):
    """Length of union(ivs_a) ∩ union(ivs_b)."""
    _, ua = union_len(ivs_a)
    _, ub = union_len(ivs_b)
    i = j = 0
    tot = 0.0
    while i < len(ua) and j < len(ub):
        a0, a1 = ua[i]
        b0, b1 = ub[j]
        lo, hi = max(a0, b0), min(a1, b1)
        if hi > lo:
            tot += hi - lo
        if a1 < b1:
            i += 1
        else:
            j += 1
    return tot


def main():
    profile_dir = sys.argv[1]
    trace, path = load_trace(profile_dir)
    spans, tnames, pnames = spans_by_thread(trace)

    step, decode, h2d, qwait, device = [], [], [], [], []
    for key, ivs in spans.items():
        pid, tid = key
        tn = tnames.get(key, "")
        pn = pnames.get(pid, "")
        if "TPU" in pn or "/device:" in pn or "Accelerator" in pn:
            device += ivs
            continue
        for t0, t1, name in ivs:
            low = name.lower()
            if "train_step" in low or "pjit" in low and "train" in low:
                step.append((t0, t1))
            elif "decode" in low or "load_batch" in low:
                decode.append((t0, t1))
            elif "device_put" in low or "transfer" in low and "h2d" in low:
                h2d.append((t0, t1))
            elif "loader_wait" in low or ("queue" in low and "get" in low):
                qwait.append((t0, t1))

    def ms(x):
        return x / 1000.0

    s_tot, _ = union_len(step) if step else (0.0, [])
    d_tot, _ = union_len(decode) if decode else (0.0, [])
    h_tot, _ = union_len(h2d) if h2d else (0.0, [])
    q_tot, _ = union_len(qwait) if qwait else (0.0, [])
    dev_tot, _ = union_len(device) if device else (0.0, [])

    print(f"trace: {path}")
    print(f"threads: { {k: v for k, v in tnames.items()} }")
    print(f"step span total:    {ms(s_tot):9.1f} ms")
    print(f"device exec total:  {ms(dev_tot):9.1f} ms")
    print(f"decode work total:  {ms(d_tot):9.1f} ms")
    print(f"h2d copy total:     {ms(h_tot):9.1f} ms")
    print(f"loader-wait total:  {ms(q_tot):9.1f} ms")
    if step and decode:
        ov = overlap_len(step, decode)
        print(f"decode∩step overlap: {ms(ov):8.1f} ms "
              f"({100.0 * ov / max(d_tot, 1e-9):.1f}% of decode hidden)")
    if step and h2d:
        ov = overlap_len(step, h2d)
        print(f"h2d∩step overlap:    {ms(ov):8.1f} ms "
              f"({100.0 * ov / max(h_tot, 1e-9):.1f}% of h2d hidden)")
    # Ground truth for "TPU busy" is the device timeline, not the (short,
    # async) host dispatch spans — report hiding against it too.
    if device and decode:
        ov = overlap_len(device, decode)
        print(f"decode∩device overlap: {ms(ov):6.1f} ms "
              f"({100.0 * ov / max(d_tot, 1e-9):.1f}% of decode hidden "
              f"behind device execution)")
    if device and h2d:
        ov = overlap_len(device, h2d)
        print(f"h2d∩device overlap:  {ms(ov):8.1f} ms "
              f"({100.0 * ov / max(h_tot, 1e-9):.1f}% of h2d hidden "
              f"behind device execution)")


if __name__ == "__main__":
    main()
