"""MTD-GAN — Res-FFT-Conv generator + multi-task discriminator.

Parity targets (reference arch/Ours/networks.py):
  ResFFTGenerator          -> :38-164   (11 convs / 11 deconvs / 21 FFT blocks,
                                         long skip-adds, N(0,0.01) init; final
                                         config in=1 ch=32 layers=10 k=3 p=1,
                                         :1944)
  MultiTaskDiscriminator   -> :177-474  (spectral-norm VGG-ish encoder, 1x1
                                         bottleneck x2, CLS/SEG/REC decoders,
                                         64x64 input contract)
  MTDGANModel.d_loss       -> :1957-1992 (stacked [disc, rec, consist]:
                                         LSGAN CLS + NDS SEG; REC L1; RC
                                         consistency on clipped restorations)
  MTDGANModel.g_loss       -> :1994-2009 (LSGAN + NDS + 50*Charbonnier +
                                         50*EdgeLoss)
  shared/task-specific/last-shared partitions -> :318-380 (D), :63-93 (G)

TPU-first notes: NHWC layout; the 21 FFT blocks are rfft2 -> channel matmul
(MXU) -> irfft2 under XLA (Pallas-fused variant pluggable); spectral-norm u
vectors live in the 'spectral' collection and are threaded explicitly through
the four D applications per d_loss, mirroring torch's per-forward power
iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.models.base import GANVariables
from mtd_gan_tpu.ops.fft_conv import FFTConvBlock
from mtd_gan_tpu.ops.layers import Conv, ConvTranspose, Dense, normal_init
from mtd_gan_tpu.ops.pixel_shuffle import PixelShuffleUpsample
from mtd_gan_tpu.ops.upsample import upsample2x_bilinear

Array = jax.Array

_INIT = normal_init(0.01)

# cast a pytree of activations to fp32 (identity for fp32 — XLA elides it)
_f32 = lambda tree: jax.tree_util.tree_map(
    lambda t: t.astype(jnp.float32), tree)


class ResFFTGenerator(nn.Module):
    """Symmetric encoder/decoder with 21 interleaved Res-FFT-Conv blocks."""

    in_channels: int = 1
    features: int = 32
    num_layers: int = 10
    kernel_size: int = 3
    padding: int = 1
    dtype: Optional[jnp.dtype] = None
    spectral_impl: str = "auto"  # see ops/fft_conv.fft_conv_block

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = (self.kernel_size, self.kernel_size)
        conv = lambda name: Conv(
            self.features, kernel_size=k, padding=self.padding,
            kernel_init=_INIT, dtype=self.dtype, name=name,
        )
        deconv = lambda feats, name: ConvTranspose(
            feats, kernel_size=k, padding=self.padding,
            kernel_init=_INIT, dtype=self.dtype, name=name,
        )
        fft = lambda i: FFTConvBlock(self.features, kernel_init=_INIT,
                                     spectral_impl=self.spectral_impl,
                                     name=f"fft_{i}")

        # conv pre-activations are checkpoint-named: together with the
        # spectral names in ops/fft_conv.py, the save_all_named remat
        # policy gives a backward with ZERO forward recompute (relu
        # outputs rebuild elementwise from the saved preacts)
        from jax.ad_checkpoint import checkpoint_name as _ckpt

        skips = []
        h = x
        for i in range(self.num_layers):
            h = nn.relu(_ckpt(conv(f"enc_{i}")(h), "conv_preact"))
            h = fft(i)(h)
            skips.append(h)

        h = nn.relu(_ckpt(conv(f"enc_{self.num_layers}")(h), "conv_preact"))
        h = fft(self.num_layers)(h)

        h = nn.relu(_ckpt(
            deconv(self.features, f"dec_{self.num_layers}")(h) + skips[-1],
            "conv_preact"))
        for i in range(self.num_layers - 1, 0, -1):
            h = fft(2 * self.num_layers - i)(h)
            h = nn.relu(_ckpt(
                deconv(self.features, f"dec_{i}")(h) + skips[i - 1],
                "conv_preact"))
        h = fft(2 * self.num_layers)(h)
        return nn.relu(_ckpt(deconv(self.in_channels, "dec_0")(h) + x,
                             "conv_preact"))


class MultiTaskDiscriminator(nn.Module):
    """Spectral-norm encoder + CLS/SEG/REC decoders; input must be 64x64
    (CLS flatten -> Dense(512, 512) requires a 1x1x512 bottleneck).

    `heads` selects the decoder subset — the reference's five partial
    discriminators (CLS / SEG / CLS_SEG / CLS_REC / SEG_REC,
    arch/Ours/networks.py:507-1320) are this module with fewer heads;
    outputs are returned in (cls, seg, rec) order for the enabled subset."""

    in_channels: int = 1
    features: int = 64
    dropout_rate: float = 0.3
    heads: Tuple[str, ...] = ("cls", "seg", "rec")
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: Array, train: bool = True, update_stats: bool = True
    ):
        f = self.features
        enc_ch = [f, f * 2, f * 4, f * 8, f * 8, f * 8]

        def sn_conv(feats, name, kernel=(3, 3), stride=(1, 1), pad=1):
            return Conv(
                feats, kernel_size=kernel, strides=stride, padding=pad,
                spectral_norm=True, kernel_init=_INIT, dtype=self.dtype, name=name,
            )

        lrelu = lambda z: nn.leaky_relu(z, 0.2)

        # ---- encoder ----
        h = x
        skips = []
        for i, ch in enumerate(enc_ch, start=1):
            h = lrelu(sn_conv(ch, f"conv{i}1")(h, update_stats))
            h = lrelu(sn_conv(ch, f"conv{i}2")(h, update_stats))
            skips.append(h)
            h = sn_conv(ch, f"down{i}", kernel=(4, 4), stride=(2, 2))(h, update_stats)

        # ---- bottleneck ----
        h = lrelu(sn_conv(f * 8, "bconv1", kernel=(1, 1), pad=0)(h, update_stats))
        x_bot = lrelu(sn_conv(f * 8, "bconv2", kernel=(1, 1), pad=0)(h, update_stats))

        outputs = []

        # ---- CLS decoder ----
        if "cls" in self.heads:
            c = x_bot.reshape(x_bot.shape[0], -1)
            c = Dense(f * 8, spectral_norm=True, kernel_init=_INIT, name="c_fc")(
                c, update_stats
            )
            c = lrelu(c)
            c = nn.Dropout(self.dropout_rate, deterministic=not train,
                           name="c_drop")(c)
            outputs.append(Dense(1, kernel_init=_INIT, name="enc_out")(c))

        # ---- SEG decoder (bilinear upsample + skip concat) ----
        if "seg" in self.heads:
            seg_ch = [f * 8, f * 8, f * 4, f * 2, f, 1]
            s = x_bot
            for i, ch in enumerate(seg_ch, start=1):
                # exact 2x-bilinear + concat-free skip conv: same math as
                # jax.image.resize + jnp.concatenate, but gather/scatter-
                # and split-free in the 3x-per-step PCGrad backward
                s = upsample2x_bilinear(s)
                s = lrelu(sn_conv(ch, f"s_dconv{i}1")(
                    (s, skips[6 - i]), update_stats))
                s = lrelu(sn_conv(ch, f"s_dconv{i}2")(s, update_stats))
            outputs.append(Conv(1, kernel_size=(1, 1), padding=0, kernel_init=_INIT,
                                dtype=self.dtype, name="dec_out")(s))

        # ---- REC decoder (pixel-shuffle upsample + skip concat) ----
        if "rec" in self.heads:
            r = x_bot
            rec_ch = [f * 8, f * 8, f * 4, f * 2, f, 1]
            for i, ch in enumerate(rec_ch, start=1):
                r = PixelShuffleUpsample(
                    r.shape[-1], scale=2, kernel_init=_INIT, name=f"r_up{i}"
                )(r)
                r = lrelu(sn_conv(ch, f"r_dconv{i}1")(
                    (r, skips[6 - i]), update_stats))
                r = lrelu(sn_conv(ch, f"r_dconv{i}2")(r, update_stats))
            outputs.append(Conv(1, kernel_size=(1, 1), padding=0, kernel_init=_INIT,
                                dtype=self.dtype, name="rec_out")(r))

        if len(outputs) == 1:
            return outputs[0]
        return tuple(outputs)


# partition labels for MTO gradient surgery (reference :318-380)
_D_SHARED_PREFIXES = tuple(
    [f"conv{i}{j}" for i in range(1, 7) for j in (1, 2)]
    + [f"down{i}" for i in range(1, 7)]
    + ["bconv1", "bconv2"]
)
_D_TASK_PREFIXES = tuple(
    [f"s_dconv{i}{j}" for i in range(1, 7) for j in (1, 2)]
    + [f"r_up{i}" for i in range(1, 7)]
    + [f"r_dconv{i}{j}" for i in range(1, 7) for j in (1, 2)]
    + ["enc_out", "dec_out", "rec_out"]
)
# NOTE: "c_fc" appears in neither list — faithful to the reference, whose
# PCGrad/CAGrad paths never populate c_fc.grad (weight_methods.py:429-447).


def d_param_label(path: Tuple[str, ...]) -> str:
    top = path[0]
    if top in _D_SHARED_PREFIXES:
        return "shared"
    if top in _D_TASK_PREFIXES:
        return "task"
    return "unassigned"


def d_last_shared_label(path: Tuple[str, ...]) -> bool:
    return path[0] == "bconv2"


class MTDGANModel:
    """Flagship adversarial model. d_loss returns the stacked 3-task vector
    consumed by the MTO layer; g_loss is a scalar."""

    name = "MTD_GAN"
    n_d_tasks = 3

    def __init__(
        self,
        gen_features: int = 32,
        disc_features: int = 64,
        num_layers: int = 10,
        dtype=None,
        remat: bool = True,
    ):
        self.dtype = dtype  # compute dtype (None = fp32); trainer inspects it
        self.Generator = ResFFTGenerator(
            in_channels=1, features=gen_features, num_layers=num_layers,
            kernel_size=3, padding=1, dtype=dtype,
        )
        # same params, Pallas spectral branch: the inference path (no grads
        # through pallas_call needed; training keeps the einsum DFT)
        self.GeneratorTiled = ResFFTGenerator(
            in_channels=1, features=gen_features, num_layers=num_layers,
            kernel_size=3, padding=1, dtype=dtype, spectral_impl="pallas_tiled",
        )
        self.Discriminator = MultiTaskDiscriminator(
            in_channels=1, features=disc_features, dtype=dtype
        )
        # rematerialize D/G forwards in the backward pass: the 3-task vjp
        # otherwise stores every D activation x3 tasks and OOMs a 16GB chip
        # at the reference batch (20 slices x 8 crops); ~30% extra FLOPs for
        # a ~3x activation-memory cut (jax.checkpoint / SURVEY.md TPU notes)
        self.remat = remat

    # ---- init ----
    def init(self, rng, patch_shape=(1, 64, 64, 1)) -> GANVariables:
        rng_g, rng_d = jax.random.split(rng)
        x = jnp.zeros(patch_shape, jnp.float32)
        # init under jit: the axon TPU backend lacks eager FFT kernels, and
        # jitted init is faster everywhere
        params_g = jax.jit(self.Generator.init)(rng_g, x)["params"]
        d_vars = jax.jit(partial(self.Discriminator.init, train=False))(rng_d, x)
        return GANVariables(
            params_g=params_g,
            params_d=d_vars["params"],
            state_d=d_vars.get("spectral", {}),
        )

    # ---- forwards ----
    # jitted by default: the axon TPU backend has no eager FFT kernels, and
    # jit-of-jit inside the trainer is free
    @partial(jax.jit, static_argnums=0)
    def generate(self, params_g, x: Array) -> Array:
        # Full-size TPU inference runs the channel-major NCHW Pallas
        # pipeline (ops/pallas_pipeline.py): lane-dense convs + radix-4
        # Cooley-Tukey H-DFTs + bf16 stage boundaries — measured 2x the
        # einsum path at 512x512 (PERF.md r3). Identical params; training
        # g_loss differentiates Generator.apply directly, never this path.
        if (
            jax.default_backend() == "tpu"
            and x.shape[1] >= 256
            and x.shape[1] % 128 == 0
            and x.shape[2] % 128 == 0
        ):
            from mtd_gan_tpu.ops.pallas_pipeline import resfft_generator_jit

            return resfft_generator_jit(
                params_g, x, num_layers=self.Generator.num_layers,
            )
        if (
            jax.default_backend() == "tpu"
            and x.shape[1] >= 256
            and x.shape[1] % 64 == 0
            and x.shape[2] % 2 == 0
        ):
            # H not 128-tileable: fall back to the round-2 tiled kernels
            return self.GeneratorTiled.apply({"params": params_g}, x)
        return self.Generator.apply({"params": params_g}, x)

    def _apply_d(self, params_d, spectral, x, rng, train,
                 update_stats=None, remat=None):
        if update_stats is None:
            update_stats = train
        if remat is None:
            remat = self.remat

        def fn(pd, sp, z):
            return self.Discriminator.apply(
                {"params": pd, "spectral": sp},
                z,
                train=train,
                update_stats=update_stats,
                rngs={"dropout": rng} if train else None,
                mutable=["spectral"],
            )

        if remat and train:
            fn = jax.checkpoint(fn)
        out, mutated = fn(params_d, spectral, x)
        return out, mutated["spectral"]

    # ---- losses ----
    def d_loss(self, params_d, params_g, state_d, rng, x, y, train=True,
               update_stats=None, remat=None, fake=None):
        """Returns (stacked [disc, rec, consist], (new_state, details)).

        The reference applies D four times per step (y, fake, and the two
        clipped restorations — arch/Ours/networks.py:1957-1977). The first
        two and last two have no data dependence between them, so each pair
        runs as ONE concatenated 2B-batch forward: half the kernel launches
        and weight reads on the D side, which dominates the train step
        (VERDICT r1 item 3). Cadence note: spectral-norm power iteration now
        advances twice per d_loss instead of four times — same fixed point,
        slightly slower u convergence in the first steps; dropout draws one
        mask per fused pair.

        `fake` lets the trainer pass G(x) computed ONCE per step (its value
        is identical for d_loss and g_loss — params_g updates only after
        both, engine.py:26-76), dropping a whole generator forward from the
        step. When None, it is computed here (standalone/golden use)."""
        rngs = jax.random.split(rng, 4)
        if fake is None:
            fake = self.generate(params_g, x)
        fake = jax.lax.stop_gradient(fake)
        sp = state_d
        b = y.shape[0]

        pair1, sp = self._apply_d(
            params_d, sp, jnp.concatenate([y, fake], axis=0), rngs[0], train,
            update_stats=update_stats, remat=remat,
        )
        # loss math always runs fp32: under the bf16 compute mode
        # (MTDGANModel(dtype=bfloat16)) the D heads emit bf16, and mean
        # reductions over 160x64x64 batches need fp32 accumulation
        pair1 = _f32(pair1)
        fake = _f32(fake)
        (real_enc, real_dec, real_rec), (fake_enc, fake_dec, fake_rec) = (
            jax.tree_util.tree_map(lambda t: t[:b], pair1),
            jax.tree_util.tree_map(lambda t: t[b:], pair1),
        )

        diff = x - y
        d_real_enc = losses.ls_gan(real_enc, 1.0)
        d_fake_enc = losses.ls_gan(fake_enc, 0.0)
        d_real_dec = losses.nds_loss(real_dec, 1.0, diff)
        d_fake_dec = losses.nds_loss(fake_dec, 0.0, diff)
        disc_loss = d_real_enc + d_fake_enc + d_real_dec + d_fake_dec

        rec_loss_real = losses.l1(real_rec, y)
        rec_loss_fake = losses.l1(fake_rec, fake)
        rec_loss = rec_loss_real + rec_loss_fake

        # restoration-consistency (RC): D outputs on its own clipped restorations
        pair2, sp = self._apply_d(
            params_d, sp,
            jnp.concatenate([jnp.clip(real_rec, 0.0, 1.0),
                             jnp.clip(fake_rec, 0.0, 1.0)], axis=0),
            rngs[2], train, update_stats=update_stats, remat=remat,
        )
        pair2 = _f32(pair2)
        (rr_enc, rr_dec, _), (rf_enc, rf_dec, _) = (
            jax.tree_util.tree_map(lambda t: t[:b], pair2),
            jax.tree_util.tree_map(lambda t: t[b:], pair2),
        )
        c_re = losses.l2(real_enc, rr_enc)
        c_rd = losses.l2(real_dec, rr_dec)
        c_fe = losses.l2(fake_enc, rf_enc)
        c_fd = losses.l2(fake_dec, rf_dec)
        consist_loss = c_re + c_rd + c_fe + c_fd

        details = {
            "D/real_enc": d_real_enc, "D/fake_enc": d_fake_enc,
            "D/real_dec": d_real_dec, "D/fake_dec": d_fake_dec,
            "D/rec_loss_real": rec_loss_real, "D/rec_loss_fake": rec_loss_fake,
            "D/consist_loss_real_enc": c_re, "D/consist_loss_real_dec": c_rd,
            "D/consist_loss_fake_enc": c_fe, "D/consist_loss_fake_dec": c_fd,
        }
        return jnp.stack([disc_loss, rec_loss, consist_loss]), (sp, details)

    def g_loss(self, params_g, params_d, state_d, rng, x, y, train=True,
               remat=None):
        # Train paths must differentiate Generator.apply directly: generate()
        # may route large inputs to the inference-only Pallas paths, and
        # differentiating through pallas_call is unsupported (ADVICE r2).
        if remat is None:
            remat = self.remat
        if train:
            from mtd_gan_tpu.ops.fft_conv import generator_checkpoint

            gen_fn = generator_checkpoint(
                lambda pg, z: self.Generator.apply({"params": pg}, z), remat)
        else:
            gen_fn = self.generate
        fake = gen_fn(params_g, x)
        # string policies are generator-only — the D application inside
        # g_loss_terms only understands boolean remat
        d_remat = remat if isinstance(remat, bool) else None
        return self.g_loss_terms(fake, params_d, state_d, rng, x, y,
                                 train=train, remat=d_remat)

    def g_loss_terms(self, fake, params_d, state_d, rng, x, y, train=True,
                     remat=None):
        """g_loss given a precomputed G(x): every params_g dependence flows
        through `fake`, so the trainer differentiates this w.r.t. fake and
        pulls the cotangent through one jax.vjp of the generator (the same
        chain rule as g_loss, one fewer G forward per step)."""
        (gen_enc, gen_dec, _), sp = self._apply_d(params_d, state_d, fake, rng,
                                                  train, remat=remat)
        fake = _f32(fake)
        gen_enc, gen_dec = _f32(gen_enc), _f32(gen_dec)

        adv_enc = losses.ls_gan(gen_enc, 1.0)
        adv_dec = losses.nds_loss(gen_dec, 1.0, x - y)
        pix_loss = 50.0 * losses.charbonnier_loss(fake, y)
        edge = 50.0 * losses.edge_loss(fake, y)
        total = adv_enc + adv_dec + pix_loss + edge

        details = {
            "G/gen_enc": adv_enc, "G/gen_dec": adv_dec,
            "G/pix_loss": pix_loss, "G/edge_loss": edge,
        }
        return total, (sp, details)

    # ---- MTO partitions ----
    @staticmethod
    def d_param_label(path):
        return d_param_label(path)

    @staticmethod
    def d_last_shared_label(path):
        return d_last_shared_label(path)

    # ---- full-image D inference ----
    def discriminate_full(self, params_d, state_d, x: Array,
                          overlap: float = 0.5, mode: str = "gaussian",
                          sw_batch_size: int = 64, mesh=None):
        """Run the 64x64-contract discriminator over full-size slices via the
        multi-output sliding window (reference capability target,
        module/sliding_window.py:25-786): returns (cls, seg, rec) with CLS
        per tile, shape (N, T, 1) — the reference concatenates per-tile CLS
        logits (:126) — and SEG/REC blended to full size."""
        from mtd_gan_tpu.ops.sliding_window import sliding_window_inference

        def predictor(tiles):
            out, _ = self.Discriminator.apply(
                {"params": params_d, "spectral": state_d},
                tiles, train=False, update_stats=False, mutable=["spectral"],
            )
            return out

        return sliding_window_inference(
            x, (64, 64), predictor, sw_batch_size=sw_batch_size,
            overlap=overlap, mode=mode, mesh=mesh,
        )
