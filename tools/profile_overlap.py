#!/usr/bin/env python
"""Host/device overlap evidence (PERF.md "Host/device overlap profile").

Runs TPU train epochs over synthetic DICOMs with the prefetch pipeline ON
vs OFF, then captures a jax.profiler trace of a prefetch-ON epoch. Feed the
trace dir to tools/analyze_trace.py to quantify how much loader decode/H2D
work is hidden behind device execution (reference dataloaders.py:9-16 gets
this from torch DataLoader workers + pin_memory; here it is the
prefetch_to_device queue in engine/loops.py).

Usage: python tools/profile_overlap.py [data_root] [trace_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

import __graft_entry__
__graft_entry__._setup_cache()

from mtd_gan_tpu.data import dicom as D
from mtd_gan_tpu.data.pipeline import PairedDicomDataset, train_loader
from mtd_gan_tpu.data.transforms import make_train_preprocess
from mtd_gan_tpu.engine import MTDGANTrainer
from mtd_gan_tpu.models.mtd_gan import MTDGANModel
from mtd_gan_tpu.engine.loops import train_one_epoch
from mtd_gan_tpu.utils.profiling import trace

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/overlap_data"
TRACE_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/overlap_trace"
N_SLICES = 48

if not os.path.exists(os.path.join(ROOT, "train")):
    rng = np.random.RandomState(0)
    for i in range(N_SLICES):
        for key in ("n_20", "n_100"):
            d = os.path.join(ROOT, "train", "case0", key)
            os.makedirs(d, exist_ok=True)
            img = (rng.rand(512, 512) * 1200).astype(np.float32)
            D.write_synthetic_dicom(os.path.join(d, f"s{i:03d}.dcm"),
                                    img.astype(np.int16))
    print("synthetic dataset written", flush=True)

model = MTDGANModel(gen_features=8, disc_features=8, num_layers=3)
trainer = MTDGANTrainer(model, method="pcgrad")
state = trainer.create_state(jax.random.PRNGKey(0))
pre = make_train_preprocess("window_patch", "mayo")
ds = PairedDicomDataset(ROOT, "train")
print(f"dataset: {len(ds)} slices", flush=True)

loader = train_loader(ds, batch_size=8, seed=0)
t0 = time.perf_counter()
state, avgs, rng = train_one_epoch(trainer, state, loader, pre,
                                   jax.random.PRNGKey(1), 0, print_freq=100)
print(f"compile epoch: {time.perf_counter()-t0:.1f}s", flush=True)

for tag, dp in (("prefetch_ON", True), ("prefetch_OFF", False)):
    times = []
    for rep in range(3):
        loader = train_loader(ds, batch_size=8, seed=rep + 1)
        t0 = time.perf_counter()
        state, avgs, rng = train_one_epoch(
            trainer, state, loader, pre, rng, rep, print_freq=100,
            device_prefetch=dp)
        jax.block_until_ready(state.params_g)
        times.append(time.perf_counter() - t0)
    print(f"{tag}: epoch {min(times):.3f}s (best of 3; "
          f"{min(times) / (len(ds) // 8) * 1000:.1f} ms/step)", flush=True)

loader = train_loader(ds, batch_size=8, seed=9)
with trace(TRACE_DIR):
    state, avgs, rng = train_one_epoch(trainer, state, loader, pre, rng, 9,
                                       print_freq=100)
    jax.block_until_ready(state.params_g)
print("trace written to", TRACE_DIR, flush=True)
