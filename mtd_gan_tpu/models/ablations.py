"""MTD-GAN ablation family — 10 progressive variants.

Parity target: reference arch/Ours/networks.py:1324-1936. Each ablation is a
REDCNN generator (32ch/k3/p1; the last variant swaps in the ResFFT generator)
plus a head-subset discriminator, returning a SCALAR d_loss (only the final
MTD_GAN_Method stacks per-task losses for MTO — :1992). Recipe matrix:

  name                          heads          NDS    RC
  Ablation_CLS                  (cls,)         -      -
  Ablation_SEG                  (seg,)         -      -
  Ablation_CLS_SEG              (cls, seg)     -      -
  Ablation_CLS_REC              (cls, rec)     -      -
  Ablation_SEG_REC              (seg, rec)     -      -
  Ablation_CLS_SEG_REC          all            -      -
  Ablation_CLS_SEG_REC_NDS      all            yes    -
  Ablation_CLS_SEG_REC_RC       all            -      yes
  Ablation_CLS_SEG_REC_NDS_RC   all            yes    yes
  ..._NDS_RC_ResFFT             all            yes    yes   (ResFFT G)

Faithful quirks preserved: two-head g_loss applies ls_gan(., 1) to BOTH
outputs even when the second head is REC (:1482-1500, :1541-1559); d_loss of
CLS_REC/SEG_REC scores only the first head adversarially.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mtd_gan_tpu import losses
from mtd_gan_tpu.models.base import GANVariables
from mtd_gan_tpu.models.dugan import REDCNNGenerator
from mtd_gan_tpu.models.mtd_gan import MultiTaskDiscriminator, ResFFTGenerator

Array = jax.Array


class AblationModel:
    n_d_tasks = 1  # scalar d_loss -> plain summed backward

    def __init__(self, heads: Tuple[str, ...], use_nds: bool = False,
                 use_rc: bool = False, resfft: bool = False,
                 gen_features: int = 32, disc_features: int = 64,
                 num_layers: int = 10, dtype=None):
        self.heads = heads
        self.use_nds = use_nds
        self.use_rc = use_rc
        if resfft:
            self.Generator = ResFFTGenerator(
                in_channels=1, features=gen_features, num_layers=num_layers,
                kernel_size=3, padding=1, dtype=dtype)
        else:
            self.Generator = REDCNNGenerator(
                features=gen_features, num_layers=num_layers, dtype=dtype)
        self.Discriminator = MultiTaskDiscriminator(
            features=disc_features, heads=heads, dtype=dtype)

    def init(self, rng, patch_shape=(1, 64, 64, 1)) -> GANVariables:
        rng_g, rng_d = jax.random.split(rng)
        x = jnp.zeros(patch_shape, jnp.float32)
        params_g = jax.jit(self.Generator.init)(rng_g, x)["params"]
        d_vars = jax.jit(partial(self.Discriminator.init, train=False))(rng_d, x)
        return GANVariables(params_g=params_g, params_d=d_vars["params"],
                            state_d=d_vars.get("spectral", {}))

    @partial(jax.jit, static_argnums=0)
    def generate(self, params_g, x: Array) -> Array:
        return self.Generator.apply({"params": params_g}, x)

    def _apply_d(self, params_d, spectral, z, rng, train):
        out, mutated = self.Discriminator.apply(
            {"params": params_d, "spectral": spectral}, z, train=train,
            update_stats=train,
            rngs={"dropout": rng} if train else None, mutable=["spectral"],
        )
        if not isinstance(out, tuple):
            out = (out,)
        return out, mutated["spectral"]

    def _seg_metric(self, pred, target, diff):
        if self.use_nds:
            return losses.nds_loss(pred, target, diff)
        return losses.ls_gan(pred, target)

    def d_loss(self, params_d, params_g, state_d, rng, x, y, train=True):
        rngs = jax.random.split(rng, 4)
        fake = jax.lax.stop_gradient(self.generate(params_g, x))
        sp = state_d
        b = y.shape[0]
        # one concatenated 2B forward for (y, fake) — same fusion as
        # MTDGANModel.d_loss (SN power iteration advances once per pair)
        pair, sp = self._apply_d(
            params_d, sp, jnp.concatenate([y, fake], axis=0), rngs[0], train
        )
        real = jax.tree_util.tree_map(lambda t: t[:b], pair)
        fke = jax.tree_util.tree_map(lambda t: t[b:], pair)
        diff = x - y
        details = {}
        total = jnp.float32(0.0)

        order = [h for h in ("cls", "seg", "rec") if h in self.heads]
        cls_i = order.index("cls") if "cls" in order else None
        seg_i = order.index("seg") if "seg" in order else None
        rec_i = order.index("rec") if "rec" in order else None

        if cls_i is not None:
            d_r = losses.ls_gan(real[cls_i], 1.0)
            d_f = losses.ls_gan(fke[cls_i], 0.0)
            total += d_r + d_f
            details["D/real_enc"], details["D/fake_enc"] = d_r, d_f
        if seg_i is not None:
            d_r = self._seg_metric(real[seg_i], 1.0, diff)
            d_f = self._seg_metric(fke[seg_i], 0.0, diff)
            total += d_r + d_f
            details["D/real_dec"], details["D/fake_dec"] = d_r, d_f

        if rec_i is not None:
            rl_r = losses.l1(real[rec_i], y)
            rl_f = losses.l1(fke[rec_i], fake)
            total += rl_r + rl_f
            details["D/rec_loss_real"], details["D/rec_loss_fake"] = rl_r, rl_f

        if self.use_rc:
            rc_pair, sp = self._apply_d(
                params_d, sp,
                jnp.concatenate([jnp.clip(real[rec_i], 0.0, 1.0),
                                 jnp.clip(fke[rec_i], 0.0, 1.0)], axis=0),
                rngs[2], train)
            rr = jax.tree_util.tree_map(lambda t: t[:b], rc_pair)
            rf = jax.tree_util.tree_map(lambda t: t[b:], rc_pair)
            c_re = losses.l2(real[cls_i], rr[cls_i])
            c_rd = losses.l2(real[seg_i], rr[seg_i])
            c_fe = losses.l2(fke[cls_i], rf[cls_i])
            c_fd = losses.l2(fke[seg_i], rf[seg_i])
            total += c_re + c_rd + c_fe + c_fd
            details.update({
                "D/consist_loss_real_enc": c_re, "D/consist_loss_real_dec": c_rd,
                "D/consist_loss_fake_enc": c_fe, "D/consist_loss_fake_dec": c_fd,
            })
        return total, (sp, details)

    def g_loss(self, params_g, params_d, state_d, rng, x, y, train=True):
        fake = self.Generator.apply({"params": params_g}, x)
        outs, sp = self._apply_d(params_d, state_d, fake, rng, train)
        diff = x - y
        details = {}
        if len(self.heads) == 1:
            adv = losses.ls_gan(outs[0], 1.0)
            details["G/gen_enc"] = adv
        else:
            # first two outputs scored (quirk: even REC as second head)
            a1 = losses.ls_gan(outs[0], 1.0)
            if self.use_nds and "seg" in self.heads:
                a2 = losses.nds_loss(outs[1], 1.0, diff)
            else:
                a2 = losses.ls_gan(outs[1], 1.0)
            adv = a1 + a2
            details["G/gen_enc"], details["G/gen_dec"] = a1, a2
        pix = 50.0 * losses.charbonnier_loss(fake, y)
        edge = 50.0 * losses.edge_loss(fake, y)
        details["G/pix_loss"], details["G/edge_loss"] = pix, edge
        return adv + pix + edge, (sp, details)


def _make(heads, **kw):
    return lambda **extra: AblationModel(heads=heads, **kw, **extra)


ABLATIONS = {
    "Ablation_CLS": _make(("cls",)),
    "Ablation_SEG": _make(("seg",)),
    "Ablation_CLS_SEG": _make(("cls", "seg")),
    "Ablation_CLS_REC": _make(("cls", "rec")),
    "Ablation_SEG_REC": _make(("seg", "rec")),
    "Ablation_CLS_SEG_REC": _make(("cls", "seg", "rec")),
    "Ablation_CLS_SEG_REC_NDS": _make(("cls", "seg", "rec"), use_nds=True),
    "Ablation_CLS_SEG_REC_RC": _make(("cls", "seg", "rec"), use_rc=True),
    "Ablation_CLS_SEG_REC_NDS_RC": _make(("cls", "seg", "rec"),
                                         use_nds=True, use_rc=True),
    "Ablation_CLS_SEG_REC_NDS_RC_ResFFT": _make(("cls", "seg", "rec"),
                                                use_nds=True, use_rc=True,
                                                resfft=True),
}
