"""Train-step benchmark: the numbers behind PERF.md's train-step table.

Usage:  python tools/bench_train.py [--quick]

Measures, on whatever backend jax resolves (numbers in PERF.md are from
the single TPU v5e):
  * MTD-GAN PCGrad full train step at the reference batch (160 patches,
    engine.py:26-76 semantics) across trainer configs;
  * the generator training forward alone (the einsum DFT path);
  * WGAN-VGG / DU-GAN hoisted vs classic two-forward steps.

Prints one JSON line per measurement. Sync is by host scalar fetch —
block_until_ready can report early through the axon tunnel (verify skill).
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


def _sync(v) -> float:
    return float(jnp.sum(v))


def _bench(fn, n_iters: int = 8):
    """fn() -> array to sync on. Returns (compile_s, best_ms)."""
    t0 = time.perf_counter()
    _sync(fn())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = fn()
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return compile_s, best * 1000.0


def _emit(name: str, compile_s: float, ms: float) -> None:
    print(json.dumps({"bench": name, "ms": round(ms, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


def bench_train_steps(x, y, configs, n_iters, mkw):
    from mtd_gan_tpu.engine import MTDGANTrainer
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    for label, dtype, g_remat, *extra in configs:
        model = MTDGANModel(dtype=dtype, **mkw)
        tr = MTDGANTrainer(model, method="pcgrad", grad_backend="pruned",
                           g_remat=g_remat, **(extra[0] if extra else {}))
        state = tr.create_state(jax.random.PRNGKey(0))
        holder = {"s": state}

        def step():
            holder["s"], m = tr.train_step(holder["s"], x, y)
            return m["g_loss"]

        try:
            c, ms = _bench(step, n_iters)
        except Exception as e:  # e.g. HBM rejection of a no-remat config
            print(json.dumps({"bench": f"train_step/{label}",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        _emit(f"train_step/{label}", c, ms)


def bench_g_forward(x, n_iters, mkw):
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel

    for label, dtype in (("bf16", jnp.bfloat16), ("fp32", None)):
        model = MTDGANModel(dtype=dtype, **mkw)
        params = jax.jit(model.Generator.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)))["params"]
        fwd = jax.jit(
            lambda p, z, m=model: m.Generator.apply({"params": p}, z))
        c, ms = _bench(lambda: fwd(params, x), n_iters)
        _emit(f"g_forward_b{x.shape[0]}/{label}", c, ms)


def bench_wgan_family(x, y, n_iters):
    from mtd_gan_tpu.engine.wgan import AdversarialTrainer, DUGANTrainer
    from mtd_gan_tpu.models import get_model

    for name, cls in (("wgan_vgg", AdversarialTrainer),
                      ("dugan", DUGANTrainer)):
        model = get_model("WGAN_VGG" if name == "wgan_vgg" else "DU_GAN")
        for label, hoist in (("hoisted", None), ("two_forward", False)):
            tr = cls(model, hoist=hoist)
            state = tr.create_state(jax.random.PRNGKey(0))
            holder = {"s": state}

            def step():
                holder["s"], m = tr.train_step(holder["s"], x, y)
                return m[next(iter(m))]

            c, ms = _bench(step, n_iters)
            _emit(f"{name}/{label}", c, ms)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small batch + fewer iters (CI smoke)")
    ap.add_argument("--skip-wgan", action="store_true")
    ap.add_argument("--only", default=None,
                    help="substring filter on train-step config labels "
                         "(skips g_forward when set)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars alone cannot "
                         "override the axon sitecustomize pin)")
    args = ap.parse_args()

    import __graft_entry__

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        __graft_entry__._setup_cache()

    batch = 8 if args.quick else 160
    n_iters = 2 if args.quick else 8
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 64, 64, 1))
    y = jnp.clip(x + 0.03, 0, 1)

    mkw = (dict(gen_features=8, disc_features=8, num_layers=2)
           if args.quick else {})
    if args.only is None:
        bench_g_forward(x, n_iters, mkw)
    configs = [
        ("bf16/pruned+save_all_named", jnp.bfloat16, "save_all_named"),
        ("bf16/pruned+save_spectral_full", jnp.bfloat16, "save_spectral_full"),
        ("bf16/pruned+save_spectral", jnp.bfloat16, "save_spectral"),
        ("bf16/pruned", jnp.bfloat16, None),
        # fp32 policy sweep (VERDICT r3 item 5): save_all_named is rejected
        # by the compile helper at fp32; measure the intermediate policies
        # so the fp32 auto-default is a measured choice, not a guess
        ("fp32/pruned+save_all_named", None, "save_all_named"),
        ("fp32/pruned+save_spectral_full", None, "save_spectral_full"),
        ("fp32/pruned+save_spectral", None, "save_spectral"),
        ("fp32/pruned", None, None),
        # VERDICT r3 item 1 A/B: pack=2 Pallas primal + einsum-vjp backward
        ("bf16/pallas_packed_fwd+save_all_named", jnp.bfloat16,
         "save_all_named", {"g_forward": "pallas_packed"}),
        # FULL fused Pallas training path: packed forward + per-block
        # fused backward kernels (ops/pallas_train.py)
        ("bf16/pallas_full", jnp.bfloat16, False, {"g_forward": "pallas"}),
    ]
    if args.only:
        configs = [c for c in configs if args.only in c[0]]
    bench_train_steps(x, y, configs, n_iters, mkw)
    if not args.skip_wgan:
        wb = 8 if args.quick else 128
        bench_wgan_family(x[:wb], y[:wb], n_iters)


if __name__ == "__main__":
    main()
