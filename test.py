#!/usr/bin/env python
"""Test CLI — metric sweep over a test split (reference test.py:17-153):
loads a checkpoint, runs full-image / sliding-window inference per family,
computes PL/TML/RMSE/PSNR/SSIM per slice + corpus FID, writes per-slice PNGs
and pred_results.csv, appends a jsonl line to test_log.txt."""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("MTD-GAN TPU test", add_help=False)
    p.add_argument("--dataset", default="mayo", type=str)
    p.add_argument("--data-root", default="", type=str)
    p.add_argument("--split", default="test", type=str)
    p.add_argument("--dataset-type-test", default="window", type=str)
    p.add_argument("--test-batch-size", default=1, type=int)
    p.add_argument("--test-num-workers", default=4, type=int)
    p.add_argument("--model", default="MTD_GAN_Method", type=str)
    p.add_argument("--loss", default="L1 Loss", type=str)
    p.add_argument("--method", default="", type=str)
    p.add_argument("--optimizer", default="adamw", type=str)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--multi-gpu-mode", default="Single", type=str)
    p.add_argument("--device", default="tpu", type=str)
    p.add_argument("--print-freq", default=10, type=int)
    p.add_argument("--checkpoint-dir", default="checkpoints", type=str)
    p.add_argument("--save-dir", default="predictions/test", type=str)
    p.add_argument("--resume", default="", type=str,
                   help="checkpoint dir (orbax) to restore; defaults to "
                        "{checkpoint-dir}/orbax latest")
    p.add_argument("--epoch", default=-1, type=int,
                   help="epoch to restore (-1 = latest)")
    p.add_argument("--eval-batch", default=None, type=int,
                   help="slices per forward in the sweep (metrics/PNGs stay "
                        "per-slice). Default: 8, except 1 for tr (sliding "
                        "window batches internally) and dn — measured on "
                        "v5e, the 512x512 reverse chain saturates the chip "
                        "at batch 1 and group >=4 exceeds HBM (PERF.md)")
    p.add_argument("--no-feature-metrics", action="store_true",
                   help="skip PL/TML/FID (no pretrained weights scenario)")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--model-kwargs", default="", type=str,
                   help='JSON kwargs for the model ctor (e.g. \'{"out_ch": 8}\')')
    p.add_argument("--memo", default="", type=str)
    return p


def main(args):
    import jax

    from mtd_gan_tpu.data.pipeline import PairedDicomDataset, eval_loader
    from mtd_gan_tpu.data.transforms import make_eval_preprocess
    from mtd_gan_tpu.engine.loops import build_trainer, family_of, run_test
    from mtd_gan_tpu.models import get_model
    from mtd_gan_tpu.utils.checkpoint import CheckpointManager

    random.seed(args.seed)
    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    ds = PairedDicomDataset(args.data_root, args.split)
    print(f"test slices: {len(ds)}")
    eval_pre = make_eval_preprocess(args.dataset_type_test, args.dataset)

    model = get_model(args.model, **json.loads(args.model_kwargs or "{}"))
    family = family_of(args.model)
    trainer = build_trainer(args.model, model, args)
    state = trainer.create_state(rng)

    ckpt_dir = args.resume or os.path.join(args.checkpoint_dir, "orbax")
    ckpt = CheckpointManager(ckpt_dir)
    epoch, state = ckpt.restore(state, None if args.epoch < 0 else args.epoch)
    print(f"restored epoch {epoch}")

    # family-aware grouped-forward default: dn measured on v5e at 512x512 —
    # batch 1 13.9 s/slice, batch 2 15.8 (the 65k-token attention saturates
    # the chip at batch 1), batch >=4 crashes the worker (HBM); PERF.md
    eval_batch = args.eval_batch
    if eval_batch is None:
        eval_batch = 1 if family == "dn" else 8
    summary = run_test(
        model, state, eval_loader(ds, args.test_batch_size), eval_pre, family,
        save_dir=args.save_dir, rng=rng,
        compute_fid_metric=not args.no_feature_metrics,
        compute_feature_metrics=not args.no_feature_metrics,
        eval_batch=eval_batch,
    )
    line = {"epoch": epoch, "model": args.model, **summary, "memo": args.memo}
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "test_log.txt"), "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line, indent=2))
    ckpt.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser("MTD-GAN TPU test", parents=[get_args_parser()])
    main(parser.parse_args())
