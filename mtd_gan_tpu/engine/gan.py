"""MTD-GAN trainer: alternating D (multi-task, MTO gradient surgery) and G
steps, fully jitted.

Reference flow (engine.py:26-76 + train.py:117-127):
  * D: d_loss -> stacked [disc, rec, consist]; WeightMethods.backward with
    shared / task-specific / last-shared partitions; AdamW(lr, wd 5e-4);
    when method has learnable params (uw logsigma) they sit in a second
    AdamW group at lr 0.025.
  * G: scalar g_loss -> AdamW.
TPU-native: one jax.vjp + vmapped pullback produces the 3 per-task gradients
(one forward, one batched backward) instead of 3 sequential torch backwards;
everything (solver included) compiles into a single XLA program; the whole
step is donated so parameters update in place in HBM.
"""

from __future__ import annotations

import inspect
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mtd_gan_tpu import optim as optim_lib
from mtd_gan_tpu.models.base import GANVariables, param_labels
from mtd_gan_tpu.ops.layers import advance_spectral_state
from mtd_gan_tpu.mto import (combine_grads, get_method, per_task_grads,
                             per_task_grads_pruned)
from mtd_gan_tpu.mto.methods import uw_logsigma_grad
from mtd_gan_tpu.parallel.mesh import batch_sharding, replicated_sharding


@struct.dataclass
class GANTrainState:
    params_g: Any
    params_d: Any
    state_d: Any
    opt_g: Any
    opt_d: Any
    mto_state: Any
    mto_opt: Any  # optimizer state for learnable method params (uw logsigma)
    rng: jax.Array
    step: jax.Array


class MTDGANTrainer:
    def __init__(
        self,
        model,
        method: Optional[str] = "pcgrad",
        optimizer: str = "adamw",
        lr: float = 1e-4,
        weight_decay: float = 5e-4,
        method_lr: float = 0.025,
        mesh=None,
        sn_iters: int = 4,
        d_microbatch: Optional[int] = None,
        d_remat: Optional[bool] = None,
        g_remat: Optional[bool] = None,
        grad_backend: str = "pruned",
        hoist: Optional[bool] = None,
        tp_axis: Optional[str] = None,
        g_forward: str = "auto",
        g_precision: str = "bf16",
        **method_kwargs,
    ):
        self.model = model
        self.base_lr = lr
        self.mesh = mesh
        self.method_lr = method_lr
        # SN power-iteration cadence per D step. The iteration depends only
        # on the weights (ops/layers.py advance_spectral_state), so it runs
        # decoupled from the forwards; 4 reproduces the reference's
        # 4-forward d_loss cadence EXACTLY (arch/Ours/networks.py:1957-1977)
        # regardless of pair-batching or microbatching. g_loss still
        # advances once through its forward (reference's 5th iteration).
        self.sn_iters = sn_iters
        # microbatch size for the 3-task D backward: chunks the batch under
        # lax.scan with remat OFF (each chunk's activations fit HBM), so
        # the per-task pullbacks never recompute the forwards. Gradients
        # are exact chunk-averages (all d_loss terms are batch means).
        self.d_microbatch = d_microbatch
        # per-side remat overrides (None = auto). Measured r3 at batch
        # 160: D-side no-remat fits HBM at bf16 and saves ~23 ms/step
        # (754 vs 777) but the fp32 activation footprint is rejected by
        # the compile helper, so auto = no-remat only under bf16 compute;
        # G-side no-remat fails to compile even at bf16.
        # g_remat="save_spectral" is the middle ground: remat the
        # generator but store each block's spectral output (skips the DFT
        # recompute, ~74 ms/step at batch 160 bf16 — PERF.md);
        # "save_spectral_full" additionally stores the pre-mix spectrum +
        # pre-ReLU mix output so the G backward does zero spectral forward
        # recompute (~3x the saved bytes of "save_spectral");
        # "save_all_named" also keeps every conv pre-activation — the
        # backward recomputes nothing but elementwise relus (~4.4 GB bf16
        # at batch 160, the fit-on-chip middle of fp32 no-remat).
        # d_microbatch is the memory valve if larger batches OOM the
        # no-remat D backward.
        if d_remat is None:
            d_remat = getattr(model, "dtype", None) != jnp.bfloat16
        self.d_remat = d_remat
        self.g_remat = g_remat
        # per-task gradient backend: "vmap" = one vjp + vmapped basis
        # pullback (dense: every task's cotangent lane traverses every
        # branch); "pruned" = K separate grad traces so DCE drops each
        # task's structurally-dead branches (mto/methods.py
        # per_task_grads_pruned). Measured r3 (MTD-GAN, batch 160, bf16):
        # pruned 607 ms/step vs dense 738 — the rec/consist backwards skip
        # the branches their losses never touch, so pruned is the default.
        self.grad_backend = grad_backend
        # hoist: None = auto (use the single-G-forward fast path when the
        # model's loss API supports it); False forces the classic
        # two-forward step — trajectory equality between the two is pinned
        # by tests/test_engine.py::test_hoisted_step_matches_two_forward
        self.hoist = hoist
        # tp_axis: channel-shard the generator forward over this mesh axis
        # (parallel/tensor.py tp_generate) inside the TRAIN step — the
        # `--multi-gpu-mode TensorParallel` path. Requires a mesh carrying
        # the axis and the hoisted step (the vjp of the shard_mapped
        # forward IS the TP backward; collectives are linear).
        if tp_axis is not None:
            if mesh is None or tp_axis not in mesh.axis_names:
                raise ValueError(
                    f"tp_axis={tp_axis!r} needs a mesh with that axis")
            if hoist is False:
                raise ValueError("TP training requires the hoisted step")
        self.tp_axis = tp_axis
        # g_forward="pallas_packed": run the hoisted step's PRIMAL generator
        # forward through the pack=2 channel-major Pallas pipeline (the
        # 64x64 training geometry as 128-lane-dense rows) behind a
        # jax.custom_vjp whose backward pulls cotangents through the einsum
        # graph — the VERDICT r3 item-1 A/B. Requires even batch and the
        # hoisted step; the backward re-runs the einsum forward under the
        # g_remat policy (its residuals cannot come from the Pallas primal).
        # g_forward="pallas": the FULL fused Pallas training path — packed
        # pair forward AND a fused per-block backward kernel via block-
        # level custom_vjp (ops/pallas_train.py). Requires even batch and
        # the hoisted step; g_remat does not apply (block inputs are the
        # vjp residuals — the natural "save block inputs" remat).
        # g_forward="auto" (default): "pallas" on a real TPU under bf16
        # compute with an even batch (measured 369.8 vs 478.7 ms/step at
        # batch 160 — PERF.md), "einsum" otherwise (fp32, CPU/interpret,
        # TP-sharded, or odd batch).
        if g_forward not in ("auto", "einsum", "pallas_packed", "pallas"):
            raise ValueError(g_forward)
        self.g_forward = g_forward
        # g_precision: spectral factor-table pass count for the FUSED Pallas
        # training path ("bf16" = single-pass tables, "bf16x2" = hi/lo).
        # Measured on chip at batch 160 (tools/precision_sweep_train.py,
        # PERF.md): single-pass grads sit at the SAME worst-leaf error
        # floor as bf16x2 vs the fp32 einsum oracle (2.8e-2 vs 3.0e-2 —
        # the bf16 activation boundary dominates), the 4-step PCGrad
        # trajectory is drift-free, and the step drops 354.3 -> 336.7 ms,
        # so "bf16" is the default.
        if g_precision not in ("bf16", "bf16x2"):
            raise ValueError(g_precision)
        self.g_precision = g_precision
        self.tx_g = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        self.tx_d = optim_lib.get_optimizer(optimizer, lr, weight_decay)
        # second AdamW param group for learnable method params
        # (train.py:122-124); the LR schedule scales it too, like the
        # reference's shared scheduler over both param groups
        self.tx_mto = optim_lib.get_optimizer("adamw", method_lr, 5e-4)
        self.method = (
            get_method(method, n_tasks=model.n_d_tasks, **method_kwargs)
            if method
            else None
        )
        self._labels = None
        self._step_fn = None

    def create_state(self, rng, patch_shape=(1, 64, 64, 1)) -> GANTrainState:
        gv: GANVariables = self.model.init(rng, patch_shape)
        self._labels = param_labels(gv.params_d, self.model.d_param_label)
        mto_state = self.method.init_state() if self.method else None
        mto_opt = (
            self.tx_mto.init(mto_state.logsigma)
            if (self.method and self.method.name == "uw")
            else optax.EmptyState()
        )
        state = GANTrainState(
            params_g=gv.params_g,
            params_d=gv.params_d,
            state_d=gv.state_d,
            opt_g=self.tx_g.init(gv.params_g),
            opt_d=self.tx_d.init(gv.params_d),
            mto_state=mto_state,
            mto_opt=mto_opt,
            # derived key: the caller's rng buffer must not be donated away
            # with the state on the first train_step
            rng=jax.random.fold_in(rng, 0),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        self._step_fn = self._build_step()
        return state

    # ------------------------------------------------------------------
    def _build_step(self):
        model, method, labels = self.model, self.method, self._labels

        # feature-detect the model's loss API: MTDGANModel supports the
        # hoisted-fake fast path (G(x) computed ONCE per step and its vjp
        # reused for the G update — PERF.md "train step" levers); ablation
        # models with the plain d_loss(..., train=True) signature fall back
        # to computing fake inside each loss
        d_sig = inspect.signature(model.d_loss).parameters
        d_extra = {}
        if "update_stats" in d_sig:
            d_extra["update_stats"] = False
        if "remat" in d_sig:
            d_extra["remat"] = self.d_remat
        hoist = "fake" in d_sig and hasattr(model, "g_loss_terms")
        if self.hoist is not None:
            hoist = hoist and self.hoist
        if self.tp_axis is not None and not hoist:
            raise ValueError(
                "TP training requires a model with the hoisted loss API")
        # auto G remat: under bf16 compute the "save_all_named" policy
        # (zero forward recompute in the G backward, ~4.4 GB residuals at
        # batch 160) measured 478.7 ms/step vs 559.9 for plain remat
        # (tools/bench_train.py, PERF.md). Under fp32 both save_all_named
        # and save_spectral_full are rejected by the compile helper
        # (HTTP 500, residual footprint), and the r4 sweep measured
        # save_spectral at 783.8 ms/step vs 865.0 for plain remat at
        # batch 160 — so fp32 auto = "save_spectral" (PERF.md).
        if self.g_remat is not None:
            g_remat = self.g_remat
        elif getattr(model, "dtype", None) == jnp.bfloat16:
            g_remat = "save_all_named"
        else:
            g_remat = "save_spectral"

        def d_update(state: GANTrainState, rng_d, rng_mto, x, y, fake=None):
            fake_kw = {"fake": fake} if fake is not None else {}

            def loss_fn(pd):
                losses_vec, (new_sp, details) = model.d_loss(
                    pd, state.params_g, state.state_d, rng_d, x, y,
                    **d_extra, **fake_kw,
                )
                return losses_vec, (new_sp, details)

            if method is not None and self.d_microbatch:
                mb = self.d_microbatch
                nm = x.shape[0] // mb

                def chunk(pd, *inp):
                    xc, yc, rc = inp[:3]

                    def lf(p):
                        kw = dict(update_stats=False, remat=False)
                        if len(inp) > 3:
                            kw["fake"] = inp[3]
                        lv, (sp_, det) = model.d_loss(
                            p, state.params_g, state.state_d, rc, xc, yc, **kw,
                        )
                        return lv, det

                    return per_task_grads(lf, pd, model.n_d_tasks)

                xs = [
                    x.reshape(nm, mb, *x.shape[1:]),
                    y.reshape(nm, mb, *y.shape[1:]),
                    jax.random.split(rng_d, nm),
                ]
                if fake is not None:
                    xs.append(fake.reshape(nm, mb, *fake.shape[1:]))
                xs = tuple(xs)
                shapes = jax.eval_shape(
                    chunk, state.params_d, *(t[0] for t in xs))
                init = jax.tree_util.tree_map(
                    lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)

                def body(carry, inp):
                    out = chunk(state.params_d, *inp)
                    return jax.tree_util.tree_map(
                        lambda a, b: a + b / nm, carry, out), None

                (losses_vec, stacked, details), _ = jax.lax.scan(
                    body, init, xs)
                new_sp = state.state_d
                grad_d, mto_state, weights = combine_grads(
                    method, state.mto_state, rng_mto, losses_vec, stacked, labels
                )
                mto_opt = state.mto_opt
                if method.name == "uw":
                    ls_grad = uw_logsigma_grad(state.mto_state, losses_vec)
                    upd, mto_opt = self.tx_mto.update(
                        ls_grad, state.mto_opt, state.mto_state.logsigma
                    )
                    mto_state = mto_state.replace(
                        logsigma=optax.apply_updates(
                            state.mto_state.logsigma, upd
                        )
                    )
            elif method is not None:
                ptg = (per_task_grads_pruned if self.grad_backend == "pruned"
                       else per_task_grads)
                losses_vec, stacked, (new_sp, details) = ptg(
                    loss_fn, state.params_d, model.n_d_tasks
                )
                grad_d, mto_state, weights = combine_grads(
                    method, state.mto_state, rng_mto, losses_vec, stacked, labels
                )
                mto_opt = state.mto_opt
                if method.name == "uw":
                    ls_grad = uw_logsigma_grad(state.mto_state, losses_vec)
                    upd, mto_opt = self.tx_mto.update(
                        ls_grad, state.mto_opt, state.mto_state.logsigma
                    )
                    mto_state = mto_state.replace(
                        logsigma=optax.apply_updates(
                            state.mto_state.logsigma, upd
                        )
                    )
            else:
                # no MTO: plain sum of stacked losses (engine.py:57-74 branch)
                def summed(pd):
                    losses_vec, aux = loss_fn(pd)
                    return jnp.sum(losses_vec), (losses_vec, aux)

                (_, (losses_vec, (new_sp, details))), grad_d = (
                    jax.value_and_grad(summed, has_aux=True)(state.params_d)
                )
                mto_state, mto_opt = state.mto_state, state.mto_opt
                weights = None

            updates, opt_d = self.tx_d.update(grad_d, state.opt_d, state.params_d)
            # faithful surgery semantics: the reference leaves grad=None on
            # params outside the method's gradient set and torch optimizers
            # SKIP them entirely (no weight decay, no Adam step) — zero the
            # UPDATES there, not just the gradients (weight_methods.py:429-588)
            frozen = {"pcgrad": ("unassigned",),
                      "cagrad": ("task", "unassigned")}.get(
                          method.name if method else "", ())
            if frozen:
                updates = jax.tree_util.tree_map(
                    lambda lab, u: jnp.zeros_like(u) if lab in frozen else u,
                    labels, updates,
                )
            params_d = optax.apply_updates(state.params_d, updates)
            # decoupled SN cadence: d_loss ran stats-frozen above; advance
            # u with the PRE-UPDATE weights (what torch's hooks iterated)
            new_sp = advance_spectral_state(
                state.params_d, new_sp, n_iters=self.sn_iters)
            state = state.replace(
                params_d=params_d, opt_d=opt_d, state_d=new_sp,
                mto_state=mto_state, mto_opt=mto_opt,
            )
            return state, losses_vec, details

        def g_update(state: GANTrainState, rng_g, x, y):
            def loss_fn(pg):
                total, (new_sp, details) = model.g_loss(
                    pg, state.params_d, state.state_d, rng_g, x, y,
                    remat=g_remat,
                )
                return total, (new_sp, details)

            (g_total, (new_sp, details)), grad_g = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params_g)
            updates, opt_g = self.tx_g.update(grad_g, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            state = state.replace(params_g=params_g, opt_g=opt_g, state_d=new_sp)
            return state, g_total, details

        def g_update_hoisted(state: GANTrainState, rng_g, x, y,
                             fake_raw, g_pull):
            # every params_g dependence of g_loss flows through fake, so one
            # grad w.r.t. fake + the generator vjp pull replaces a second
            # full G forward (chain rule unchanged; state.params_d is the
            # POST-D-update value here, matching the reference order)
            def terms(f):
                # remat here controls the D application inside g_loss;
                # string policies are generator-only, so they fall back to
                # the trainer's D-side remat decision (no-remat under bf16
                # — same activation-footprint argument as d_update)
                total, (new_sp, details) = model.g_loss_terms(
                    f, state.params_d, state.state_d, rng_g, x, y,
                    remat=(g_remat if isinstance(g_remat, bool)
                           else self.d_remat),
                )
                return total, (new_sp, details)

            (g_total, (new_sp, details)), dfake = jax.value_and_grad(
                terms, has_aux=True
            )(fake_raw)
            (grad_g,) = g_pull(dfake)
            updates, opt_g = self.tx_g.update(grad_g, state.opt_g, state.params_g)
            params_g = optax.apply_updates(state.params_g, updates)
            state = state.replace(params_g=params_g, opt_g=opt_g, state_d=new_sp)
            return state, g_total, details

        def step(state: GANTrainState, x, y):
            rng, rng_d, rng_mto, rng_g = jax.random.split(state.rng, 4)
            if hoist:
                # ONE generator forward per step: d_loss consumes its value
                # (stop-grad), the G update consumes its vjp. Identical to
                # computing it in both losses — params_g only updates after
                # both (reference engine.py:26-76)
                # remat policy: "save_spectral" keeps each block's spectral
                # output (skips the DFT-matmul recompute); "save_spectral
                # _full" also keeps spec_in/spec_preact so the G backward
                # does ZERO spectral forward recompute (~3 tensors/block)
                from mtd_gan_tpu.ops.fft_conv import generator_checkpoint

                if self.tp_axis is not None:
                    from mtd_gan_tpu.parallel.tensor import tp_generate

                    base = lambda pg: tp_generate(
                        pg, x, self.mesh,
                        num_layers=model.Generator.num_layers,
                        features=model.Generator.features,
                        axis=self.tp_axis)
                    # named remat policies are einsum-graph checkpoint
                    # names; under TP fall back to plain remat when any
                    # remat was requested
                    gen_fn = jax.checkpoint(base) if g_remat else base
                else:
                    gen_fn = generator_checkpoint(
                        lambda pg: model.Generator.apply({"params": pg}, x),
                        g_remat,
                    )
                    g_forward = self.g_forward
                    if g_forward == "auto":
                        # resolved at trace time (batch shape is known):
                        # the fused Pallas path needs a real TPU (interpret
                        # mode is orders slower), bf16 weights (the kernels
                        # stream bf16x2 factors), and an even batch (pack=2)
                        g_forward = (
                            "pallas"
                            if (jax.default_backend() == "tpu"
                                and getattr(model, "dtype", None)
                                == jnp.bfloat16
                                and x.shape[0] % 2 == 0)
                            else "einsum")
                    if g_forward == "pallas_packed":
                        from mtd_gan_tpu.ops.pallas_pipeline import (
                            resfft_generator_nchw)

                        einsum_fn = gen_fn
                        out_dtype = jax.eval_shape(
                            einsum_fn, state.params_g).dtype

                        def _pallas_primal(pg):
                            out = resfft_generator_nchw(
                                pg, x,
                                num_layers=model.Generator.num_layers,
                                pack=2)
                            return out.astype(out_dtype)

                        gen = jax.custom_vjp(_pallas_primal)
                        gen.defvjp(
                            lambda pg: (_pallas_primal(pg), pg),
                            lambda pg, ct: jax.vjp(einsum_fn, pg)[1](ct))
                        gen_fn = gen
                    elif g_forward == "pallas":
                        # FULL Pallas training path: fused forward AND a
                        # fused per-block backward kernel (block-level
                        # custom_vjp, ops/pallas_train.py) — no einsum
                        # graph, no remat policy (block inputs ARE the
                        # residuals). Grad parity vs the einsum path is
                        # pinned by tests/test_pallas_train.py.
                        from mtd_gan_tpu.ops.pallas_train import (
                            resfft_generator_train)

                        out_dtype = jax.eval_shape(
                            gen_fn, state.params_g).dtype
                        gen_fn = lambda pg: resfft_generator_train(
                            pg, x,
                            num_layers=model.Generator.num_layers,
                            precision=self.g_precision,
                        ).astype(out_dtype)
                fake_raw, g_pull = jax.vjp(gen_fn, state.params_g)
                state, d_losses, d_details = d_update(
                    state, rng_d, rng_mto, x, y,
                    fake=jax.lax.stop_gradient(fake_raw))
                state, g_total, g_details = g_update_hoisted(
                    state, rng_g, x, y, fake_raw, g_pull)
            else:
                state, d_losses, d_details = d_update(state, rng_d, rng_mto, x, y)
                state, g_total, g_details = g_update(state, rng_g, x, y)
            state = state.replace(rng=rng, step=state.step + 1)
            metrics = {**d_details, **g_details}
            metrics["d_loss"] = jnp.sum(d_losses)
            metrics["g_loss"] = g_total
            return state, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0,))
        repl = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        return jax.jit(
            step,
            donate_argnums=(0,),
            in_shardings=(repl, data, data),
            out_shardings=(repl, repl),
        )

    # ------------------------------------------------------------------
    def train_step(self, state: GANTrainState, x, y):
        return self._step_fn(state, x, y)

    def set_epoch_lr(self, state: GANTrainState, lr: float):
        optim_lib.set_learning_rate(state.opt_g, lr)
        optim_lib.set_learning_rate(state.opt_d, lr)
        # the reference scheduler scales BOTH optimizer_D param groups,
        # including the method-params group (train.py:122-127)
        if self.method and self.method.name == "uw":
            optim_lib.set_learning_rate(
                state.mto_opt, self.method_lr * lr / self.base_lr)
        return state

    def generate(self, state: GANTrainState, x):
        return self.model.generate(state.params_g, x)
