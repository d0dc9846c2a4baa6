"""DU-GAN — dual U-Net discriminators (image + gradient domain) with CutMix
consistency regularization.

Parity target: reference arch/DUGAN/networks.py:18-145 +
arch/DUGAN/DUGAN_wrapper.py (UNet) + arch/DUGAN/REDCNN/REDCNN_wrapper.py
(generator).
  * Generator: REDCNN-style 11 conv / 11 deconv (32ch, k3, p1) with residual
    adds of each encoder INPUT (note: differs from RED_CNN proper — the
    residual is saved before each conv, REDCNN_wrapper.py:28-33).
  * UNet discriminator: 7 residual down blocks (64..512), double-conv bottom
    with residual, 6 bilinear-up blocks with skip concat + 1x1 shortcut;
    dual heads: encoder logit (lrelu -> global avg pool -> linear) and
    per-pixel decoder map. Spectral norm on convs with in_ch > 4 and
    out_ch != 1 (utils/ops.py:11-21). Init N(0, 0.01).
  * Image_d_loss / Grad_d_loss: LSGAN on (real, fake, INPUT-as-fake) for both
    heads + with prob 0.5 a CutMix pass: D(mix(y, fake)) scored 0 / mask and
    an MSE consistency between the mixed decoder map and mix of maps.
  * g_loss: 0.1*(img adv) + 0.1*(grad adv) + MSE + 20*L1 on Sobel grads.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu import losses
from mtd_gan_tpu.models.base import GANVariables
from mtd_gan_tpu.ops.filters import sobel_magnitude
from mtd_gan_tpu.ops.layers import Conv, ConvTranspose, Dense, normal_init
from mtd_gan_tpu.ops.upsample import upsample2x_bilinear

Array = jax.Array
_INIT = normal_init(0.01)


class REDCNNGenerator(nn.Module):
    """DU-GAN's generator (also the backbone of the MTD-GAN ablations)."""

    in_channels: int = 1
    features: int = 32
    num_layers: int = 10
    kernel_size: int = 3
    padding: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = (self.kernel_size, self.kernel_size)
        residuals = []
        h = x
        for i in range(self.num_layers + 1):
            residuals.append(h)
            h = nn.relu(Conv(self.features, kernel_size=k, padding=self.padding,
                             kernel_init=_INIT, dtype=self.dtype,
                             name=f"enc_{i}")(h))
        # decoder applied deepest-first; dec_0 maps back to in_channels
        for i in range(self.num_layers, -1, -1):
            feats = self.features if i > 0 else self.in_channels
            h = nn.relu(
                ConvTranspose(feats, kernel_size=k, padding=self.padding,
                              kernel_init=_INIT, dtype=self.dtype,
                              name=f"dec_{i}")(h)
                + residuals[i]
            )
        return h


def _sn_flags(cin: int, cout: int) -> bool:
    """turn_on_spectral_norm rule (reference utils/ops.py:13-15)."""
    return cout != 1 and cin > 4


class _DoubleConv(nn.Module):
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Array:
        cin = x.shape[-1]
        h = Conv(self.features, kernel_size=(3, 3), padding=1,
                 spectral_norm=_sn_flags(cin, self.features),
                 kernel_init=_INIT, dtype=self.dtype, name="conv1")(
                     x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        h = Conv(self.features, kernel_size=(3, 3), padding=1,
                 spectral_norm=_sn_flags(self.features, self.features),
                 kernel_init=_INIT, dtype=self.dtype, name="conv2")(
                     h, update_stats=update_stats)
        return nn.leaky_relu(h, 0.2)


class UNetDiscriminator(nn.Module):
    """Dual-head U-Net discriminator (reference DUGAN_wrapper.py:52-113)."""

    conv_dim: int = 64
    repeat_num: int = 6
    in_channels: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Tuple[Array, Array]:
        filters = [self.in_channels] + [
            min(self.conv_dim * (2**i), 512) for i in range(self.repeat_num + 1)
        ]
        filters[-1] = filters[-2]
        pairs = list(zip(filters[:-1], filters[1:]))

        h = x
        residuals = []
        for i, (cin, cout) in enumerate(pairs):
            downsample = i != len(pairs) - 1
            stride = 2 if downsample else 1
            res = Conv(cout, kernel_size=(1, 1), strides=(stride, stride), padding=0,
                       spectral_norm=_sn_flags(cin, cout), kernel_init=_INIT,
                       dtype=self.dtype, name=f"down{i}_res")(
                           h, update_stats=update_stats)
            h = _DoubleConv(cout, dtype=self.dtype, name=f"down{i}_net")(
                h, update_stats=update_stats)
            residuals.append(h)
            if downsample:
                h = Conv(cout, kernel_size=(4, 4), strides=(2, 2), padding=1,
                         spectral_norm=_sn_flags(cout, cout), kernel_init=_INIT,
                         dtype=self.dtype, name=f"down{i}_down")(
                             h, update_stats=update_stats)
            h = h + res

        bottom = _DoubleConv(filters[-1], dtype=self.dtype, name="bottom")(
            h, update_stats=update_stats) + h

        # encoder head
        e = nn.leaky_relu(bottom, 0.2)
        e = jnp.mean(e, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        enc_out = Dense(1, kernel_init=_INIT, name="to_logit")(e)[:, 0]

        # decoder head
        u = bottom
        for j, (cout_pair, cin_pair) in enumerate(pairs[:-1][::-1]):
            # UpBlock(channel_in = cin_pair*2, out = cout_pair)
            # exact shift-add equivalent of jax.image.resize 2x bilinear
            # (gather/scatter-free VJP; see ops/upsample.py)
            u = upsample2x_bilinear(u)
            skip = residuals[:-1][::-1][j]
            cat = jnp.concatenate([u, skip], axis=-1)
            p = _DoubleConv(cout_pair, dtype=self.dtype, name=f"up{j}_net")(
                cat, update_stats=update_stats)
            sc = Conv(cout_pair, kernel_size=(1, 1), padding=0,
                      spectral_norm=_sn_flags(u.shape[-1], cout_pair),
                      kernel_init=_INIT, dtype=self.dtype, name=f"up{j}_sc")(
                          u, update_stats=update_stats)
            u = p + sc
        dec_out = Conv(1, kernel_size=(1, 1), padding=0, kernel_init=_INIT,
                       dtype=self.dtype, name="conv_out")(u)
        return enc_out, dec_out


def cutmix_mask(rng, shape) -> Array:
    """Random rectangular zero-mask (reference networks.py:132-145):
    lam ~ Beta(1,1) = U(0,1); box of area sqrt(1-lam) x sqrt(1-lam)."""
    n, h, w, c = shape
    r_lam, r_cx, r_cy = jax.random.split(rng, 3)
    lam = jax.random.uniform(r_lam)
    cx = jax.random.uniform(r_cx) * w
    cy = jax.random.uniform(r_cy) * h
    bw = w * jnp.sqrt(1.0 - lam)
    bh = h * jnp.sqrt(1.0 - lam)
    x0, x1 = jnp.round(jnp.maximum(cx - bw / 2, 0)), jnp.round(jnp.minimum(cx + bw / 2, w))
    y0, y1 = jnp.round(jnp.maximum(cy - bh / 2, 0)), jnp.round(jnp.minimum(cy + bh / 2, h))
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    inside = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
    mask = jnp.where(inside, 0.0, 1.0)
    return jnp.broadcast_to(mask[None, :, :, None], shape)


def mask_src_tgt(source: Array, target: Array, mask: Array) -> Array:
    return source * mask + (1.0 - mask) * target


class DUGANModel:
    """Three-network adversarial model with separate image/gradient Ds."""

    name = "DU_GAN"
    n_d_tasks = 1

    def __init__(self, dtype=None, gen_features: int = 32, num_layers: int = 10,
                 conv_dim: int = 64, repeat_num: int = 6):
        self.Generator = REDCNNGenerator(features=gen_features,
                                         num_layers=num_layers, dtype=dtype)
        self.Image_Discriminator = UNetDiscriminator(
            conv_dim=conv_dim, repeat_num=repeat_num, dtype=dtype)
        self.Grad_Discriminator = UNetDiscriminator(
            conv_dim=conv_dim, repeat_num=repeat_num, dtype=dtype)
        self.sobel = partial(sobel_magnitude, eps=1e-4)

    def init(self, rng, patch_shape=(1, 64, 64, 1)):
        rng_g, rng_i, rng_gr = jax.random.split(rng, 3)
        x = jnp.zeros(patch_shape, jnp.float32)
        params_g = jax.jit(self.Generator.init)(rng_g, x)["params"]
        vi = jax.jit(self.Image_Discriminator.init)(rng_i, x)
        vg = jax.jit(self.Grad_Discriminator.init)(rng_gr, x)
        return {
            "params_g": params_g,
            "params_img_d": vi["params"], "state_img_d": vi.get("spectral", {}),
            "params_grad_d": vg["params"], "state_grad_d": vg.get("spectral", {}),
        }

    @partial(jax.jit, static_argnums=0)
    def generate(self, params_g, x: Array) -> Array:
        return self.Generator.apply({"params": params_g}, x)

    def _apply_d(self, disc, params, spectral, z, train):
        out, mutated = disc.apply(
            {"params": params, "spectral": spectral}, z,
            update_stats=train, mutable=["spectral"],
        )
        return out, mutated["spectral"]

    def _d_loss_domain(self, disc, params_d, state_d, rng, real, fake, inp, train):
        (real_enc, real_dec), sp = self._apply_d(disc, params_d, state_d, real, train)
        (fake_enc, fake_dec), sp = self._apply_d(disc, params_d, sp, fake, train)
        (inp_enc, inp_dec), sp = self._apply_d(disc, params_d, sp, inp, train)
        g = losses.ls_gan
        disc_loss = (g(real_enc, 1.0) + g(real_dec, 1.0) + g(fake_enc, 0.0)
                     + g(fake_dec, 0.0) + g(inp_enc, 0.0) + g(inp_dec, 0.0))

        r_coin, r_mask = jax.random.split(rng)
        mask = cutmix_mask(r_mask, real_dec.shape)
        (cm_enc, cm_dec), sp = self._apply_d(
            disc, params_d, sp, mask_src_tgt(real, fake, mask), train
        )
        cutmix_loss = g(cm_enc, 0.0) + jnp.mean((cm_dec - mask) ** 2)
        cr_loss = losses.l2(cm_dec, mask_src_tgt(real_dec, fake_dec, mask))
        apply_cutmix = jax.random.uniform(r_coin) >= 0.5
        total = disc_loss + jnp.where(apply_cutmix, cutmix_loss + cr_loss, 0.0)

        details = {"disc_loss": disc_loss, "cutmix_loss": cutmix_loss,
                   "cr_loss": cr_loss}
        return total, sp, details

    def image_d_loss(self, params_d, params_g, state_d, rng, x, y, train=True,
                     fake=None):
        # `fake` is the RAW G(x), hoisted by the trainer so one generator
        # forward serves both D losses and the G update (params_g is
        # constant until the G step — reference engine.py:658-784)
        if fake is None:
            fake = self.generate(params_g, x)
        fake = jax.lax.stop_gradient(fake)
        total, sp, det = self._d_loss_domain(
            self.Image_Discriminator, params_d, state_d, rng, y, fake, x, train
        )
        return total, (sp, {f"D/Img_{k}": v for k, v in det.items()})

    def grad_d_loss(self, params_d, params_g, state_d, rng, x, y, train=True,
                    fake=None):
        if fake is None:
            fake = self.generate(params_g, x)
        fake = jax.lax.stop_gradient(self.sobel(fake))
        total, sp, det = self._d_loss_domain(
            self.Grad_Discriminator, params_d, state_d, rng,
            self.sobel(y), fake, self.sobel(x), train,
        )
        return total, (sp, {f"D/Grad_{k}": v for k, v in det.items()})

    def g_loss(self, params_g, params_img_d, params_grad_d,
               state_img_d, state_grad_d, rng, x, y, train=True):
        fake = self.Generator.apply({"params": params_g}, x)
        return self.g_loss_terms(fake, params_img_d, params_grad_d,
                                 state_img_d, state_grad_d, rng, x, y,
                                 train=train)

    def g_loss_terms(self, fake, params_img_d, params_grad_d,
                     state_img_d, state_grad_d, rng, x, y, train=True):
        """g_loss given a precomputed G(x) (see wgan_vgg.g_loss_terms)."""
        (ie, idec), sp_i = self._apply_d(
            self.Image_Discriminator, params_img_d, state_img_d, fake, train)
        (ge, gdec), sp_g = self._apply_d(
            self.Grad_Discriminator, params_grad_d, state_grad_d,
            self.sobel(fake), train)
        g = losses.ls_gan
        adv = 0.1 * (g(ie, 1.0) + g(idec, 1.0)) + 0.1 * (g(ge, 1.0) + g(gdec, 1.0))
        pix = losses.l2(fake, y)
        grad = 20.0 * losses.l1(self.sobel(fake), self.sobel(y))
        total = adv + pix + grad
        details = {"G/adv_loss": adv, "G/pix_loss": pix, "G/grad_loss": grad}
        return total, (sp_i, sp_g, details)
