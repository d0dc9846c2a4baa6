#!/usr/bin/env python
"""End-to-end learning proof on synthetic phantoms — no real data required.

Trains a model on noisy/clean synthetic CT phantoms and asserts the denoised
PSNR clearly beats the input PSNR. Measured on one TPU v5e:
  RED_CNN (150 epochs):                      24.9 dB -> 40.0 dB  (+15.1 dB)
  MTD_GAN_Method + pcgrad (200 ep, 16/16/4): 24.9 dB -> 35.5 dB  (+10.6 dB)
(the GAN trains all three D tasks: d_loss 2.21 -> 0.94, g_loss 7.96 -> 1.54)

Usage:
  python tools/learning_proof.py --model RED_CNN --epochs 150
  python tools/learning_proof.py --model MTD_GAN_Method --method pcgrad \
      --model-kwargs '{"gen_features": 16, "disc_features": 16, "num_layers": 4}'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def phantoms(n=8, size=128, noise_hu=60.0, seed=0):
    rng = np.random.default_rng(seed)
    clean = []
    for i in range(n):
        yy, xx = np.mgrid[:size, :size]
        cx, cy, r = 40 + (i * 13) % 48, 40 + (i * 29) % 48, 20 + (i * 7) % 20
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
        hu = np.full((size, size), -1000, np.int16)
        hu[disk] = 40 + (i * 11) % 60
        clean.append(hu)
    clean = np.stack(clean)[..., None]
    noisy = (clean + rng.normal(0, noise_hu, clean.shape)).astype(np.int16)
    return noisy, clean


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="RED_CNN")
    p.add_argument("--model-kwargs", default="")
    p.add_argument("--method", default="")
    p.add_argument("--epochs", default=150, type=int)
    p.add_argument("--lr", default=3e-4, type=float)
    p.add_argument("--min-gain-db", default=3.0, type=float)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mtd_gan_tpu.data.transforms import (make_eval_preprocess,
                                             make_train_preprocess)
    from mtd_gan_tpu.engine.loops import build_trainer, family_of
    from mtd_gan_tpu.metrics.pixel import psnr
    from mtd_gan_tpu.models import get_model

    noisy, clean = phantoms()
    model = get_model(args.model, **json.loads(args.model_kwargs or "{}"))
    args.optimizer = "adamw"
    trainer = build_trainer(args.model, model, args)
    state = trainer.create_state(jax.random.PRNGKey(0))

    pre = make_train_preprocess("window_patch", "mayo", num_samples=4)
    rng = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        rng, r = jax.random.split(rng)
        state, m = trainer.train_step(
            state, *pre(r, jnp.asarray(noisy), jnp.asarray(clean)))
        if epoch % 50 == 0:
            print(f"epoch {epoch}: "
                  + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()
                             if k in ("loss", "d_loss", "g_loss")))

    eval_pre = make_eval_preprocess("window", "mayo")
    x, y = eval_pre(jnp.asarray(noisy), jnp.asarray(clean))
    fam = family_of(args.model)
    if fam in ("wgan", "mtd", "dugan"):
        pred = model.generate(state.params_g, x)
    else:
        pred = model.apply(state.params, x)
    pred = jnp.clip(pred, 0.0, 1.0)
    p_in, p_out = float(psnr(x, y)), float(psnr(pred, y))
    print(f"PSNR input {p_in:.2f} dB -> denoised {p_out:.2f} dB "
          f"(gain {p_out - p_in:+.2f} dB)")
    assert p_out > p_in + args.min_gain_db, "denoising failed to learn"
    print("LEARNING PROOF OK")


if __name__ == "__main__":
    main()
