#!/usr/bin/env python
"""Cost decomposition of the MTD-GAN PCGrad train step (VERDICT r4 weak #2).

The shipped step (batch 160, 64x64 patches, bf16, pcgrad/pruned, fused
Pallas G fwd+bwd) measures ~370 ms but has never had a budget: nobody knows
where the time sits between the G fwd/bwd, the two pair-batched D
applications x 3-task pruned backward, the g_loss D application, the SN
power iterations, the PCGrad solve, and the optimizers. This tool jits each
sub-program at the exact production config and times it with the bench's
hard host-fetch sync, so PERF.md gets a per-stage table and the next lever
has a name.

Components overlap deliberately (g_fwd_bwd contains g_fwd; d_task_grads
contains d_loss_fwd): deltas give the split, and the full step is the
overlap reference (sub-programs can't see XLA's cross-stage scheduling).

Usage: python tools/bench_step_budget.py [--iters 8] [--batch 160]
Match: /root/reference engine.py:26-76 (step structure).
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
    return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]))


def _bench(fn, n_iters: int = 8):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=160)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--layers", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-geometry smoke test on the CPU backend")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of component names")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import __graft_entry__
    __graft_entry__._setup_cache()

    from mtd_gan_tpu.engine import MTDGANTrainer
    from mtd_gan_tpu.models.mtd_gan import MTDGANModel
    from mtd_gan_tpu.mto import combine_grads, per_task_grads_pruned
    from mtd_gan_tpu.models.base import param_labels
    from mtd_gan_tpu.ops.layers import advance_spectral_state
    from mtd_gan_tpu.ops.pallas_train import resfft_generator_train

    model = MTDGANModel(gen_features=args.features, num_layers=args.layers,
                        dtype=jnp.bfloat16)
    trainer = MTDGANTrainer(model, method="pcgrad", grad_backend="pruned")
    state = trainer.create_state(jax.random.PRNGKey(0))
    # full_step donates `state`'s buffers on its first run — the
    # sub-programs close over COPIES so they survive it
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    params_g, params_d = copy(state.params_g), copy(state.params_d)
    state_d, opt_g, opt_d = copy(state.state_d), copy(state.opt_g), copy(state.opt_d)
    mto_state = copy(state.mto_state)
    labels = param_labels(params_d, model.d_param_label)

    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (args.batch, 64, 64, 1))
    y = jnp.clip(x + 0.03, 0, 1)
    rng_d, rng_g, rng_mto = jax.random.split(jax.random.PRNGKey(2), 3)

    num_layers = model.Generator.num_layers

    # ---- sub-programs (mirroring _build_step's production choices:
    # d_remat=False under bf16, update_stats=False, fused Pallas G) ----

    if args.cpu:
        # smoke-test path: the fused Pallas kernels need a real TPU
        gen_fn = lambda pg: model.Generator.apply({"params": pg}, x)
    else:
        gen_fn = lambda pg: resfft_generator_train(
            pg, x, num_layers=num_layers)

    @jax.jit
    def g_fwd(pg):
        return gen_fn(pg)

    @jax.jit
    def g_fwd_bwd(pg):
        out, pull = jax.vjp(gen_fn, pg)
        (g,) = pull(jnp.ones_like(out))
        return g

    fake = jax.lax.stop_gradient(jax.jit(gen_fn)(params_g))

    def d_loss_fn(pd, fk):
        lv, (sp, det) = model.d_loss(
            pd, params_g, state_d, rng_d, x, y,
            update_stats=False, remat=False, fake=fk)
        return lv, (sp, det)

    @jax.jit
    def d_pair_fwd(pd, fk):
        out, _ = model._apply_d(
            pd, state_d, jnp.concatenate([y, fk], axis=0), rng_d,
            train=True, update_stats=False, remat=False)
        return out[0]

    @jax.jit
    def d_loss_fwd(pd, fk):
        lv, _ = d_loss_fn(pd, fk)
        return lv

    @jax.jit
    def d_task_grads(pd, fk):
        lv, stacked, _ = per_task_grads_pruned(
            lambda p: d_loss_fn(p, fk), pd, model.n_d_tasks)
        return stacked

    @jax.jit
    def g_terms_grad(pd, fk):
        def terms(f):
            total, aux = model.g_loss_terms(
                f, pd, state_d, rng_g, x, y, remat=False)
            return total
        return jax.grad(terms)(fk)

    @jax.jit
    def sn_advance(pd, sp):
        return advance_spectral_state(pd, sp, n_iters=trainer.sn_iters)

    stacked0 = jax.jit(d_task_grads)(params_d, fake)
    losses0 = jax.jit(d_loss_fwd)(params_d, fake)

    @jax.jit
    def mto_solve(stacked, lv):
        g, mst, _ = combine_grads(
            trainer.method, mto_state, rng_mto, lv, stacked, labels)
        return g

    grad_d0 = jax.jit(mto_solve)(stacked0, losses0)

    @jax.jit
    def opt_updates(gd, gg):
        upd_d, _ = trainer.tx_d.update(gd, opt_d, params_d)
        pd = jax.tree_util.tree_map(lambda p, u: p + u, params_d, upd_d)
        upd_g, _ = trainer.tx_g.update(gg, opt_g, params_g)
        pg = jax.tree_util.tree_map(lambda p, u: p + u, params_g, upd_g)
        return pd, pg

    grad_g0 = jax.jit(g_fwd_bwd)(params_g)

    holder = {"s": state}

    def full_step():
        holder["s"], m = trainer.train_step(holder["s"], x, y)
        return m["g_loss"]

    components = [
        ("full_step", full_step),
        ("g_fwd", lambda: g_fwd(params_g)),
        ("g_fwd_bwd", lambda: g_fwd_bwd(params_g)),
        ("d_pair_fwd_b320", lambda: d_pair_fwd(params_d, fake)),
        ("d_loss_fwd", lambda: d_loss_fwd(params_d, fake)),
        ("d_task_grads_x3", lambda: d_task_grads(params_d, fake)),
        ("g_terms_grad", lambda: g_terms_grad(params_d, fake)),
        ("sn_advance_x4", lambda: sn_advance(params_d, state_d)),
        ("mto_pcgrad_solve", lambda: mto_solve(stacked0, losses0)),
        ("opt_updates", lambda: opt_updates(grad_d0, grad_g0)),
    ]
    if args.only:
        keep = set(args.only.split(","))
        components = [c for c in components if c[0] in keep]

    rows = []
    for name, fn in components:
        try:
            c, ms = _bench(fn, args.iters)
        except Exception as e:
            print(json.dumps({"bench": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        rows.append((name, c, ms))
        print(json.dumps({"bench": name, "ms": round(ms, 1),
                          "compile_s": round(c, 1)}), flush=True)

    print("\n| component | ms | compile_s |\n|---|---|---|")
    for name, c, ms in rows:
        print(f"| {name} | {ms:.1f} | {c:.0f} |")


if __name__ == "__main__":
    main()
