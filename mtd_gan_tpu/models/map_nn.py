"""MAP-NN — modularized adaptive processing neural network.

Parity target: reference arch/MAP_NN/networks.py.
  * CPCE_2D (:11-77): 4 VALID conv3x3(32, no bias) encoder; decoder of
    deconv3x3 + concat skip + 1x1 conv (no bias); head deconv to 1 channel;
    output clamp(relu(x + out), 0, 1); xavier-uniform init.
  * Generator (:83-94): CPCE applied recurrently depth=5, weight-tied.
  * Discriminator (:97-137): 6 conv3x3 (64,64/2,128,128/2,256,256/2) lrelu
    0.2 + fc(16384 -> 1024) -> fc(1); 64x64 input.
  * d_loss: WGAN + 10*GP; g_loss: adv + 50*MSE + 50*Sobel-edge MSE
    (Sobel kernels scaled by 1/4, eps 1e-4; :139-205).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu.models.base import GANVariables
from mtd_gan_tpu.models.wgan_vgg import WGANVGGDiscriminator, wgan_gradient_penalty
from mtd_gan_tpu.ops.filters import sobel_magnitude
from mtd_gan_tpu.ops.layers import Conv, ConvTranspose

Array = jax.Array

_XAVIER = nn.initializers.xavier_uniform()


class CPCE2D(nn.Module):
    features: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = lambda feats, k, name: Conv(
            feats, kernel_size=(k, k), padding="VALID", use_bias=False,
            kernel_init=_XAVIER, dtype=self.dtype, name=name)
        deconv = lambda feats, name: ConvTranspose(
            feats, kernel_size=(3, 3), padding=0, use_bias=False,
            kernel_init=_XAVIER, dtype=self.dtype, name=name)

        f = self.features
        x1 = conv(f, 3, "encoder1")(x)
        x2 = conv(f, 3, "encoder2")(nn.relu(x1))
        x3 = conv(f, 3, "encoder3")(nn.relu(x2))
        x4 = conv(f, 3, "encoder4")(nn.relu(x3))

        h = deconv(f, "decoder5")(nn.relu(x4))
        h = nn.relu(conv(f, 1, "decoder5_")(nn.relu(jnp.concatenate([x3, h], -1))))
        h = deconv(f, "decoder6")(h)
        h = nn.relu(conv(f, 1, "decoder6_")(nn.relu(jnp.concatenate([x2, h], -1))))
        h = deconv(f, "decoder7")(h)
        h = nn.relu(conv(f, 1, "decoder7_")(nn.relu(jnp.concatenate([x1, h], -1))))
        out = deconv(1, "decoder8")(h)
        return jnp.clip(nn.relu(x + out), 0.0, 1.0)


class MAPNNGenerator(nn.Module):
    """Weight-tied recurrent application of one CPCE module (depth=5)."""

    depth: int = 5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cpce = CPCE2D(dtype=self.dtype, name="CPCE_2D")
        for _ in range(self.depth):
            x = cpce(x)
        return x


class MAPNNModel:
    name = "MAP_NN"
    n_d_tasks = 1
    d_steps_per_g = 4  # reference engine.py:553-557

    def __init__(self, depth: int = 5, dtype=None):
        self.Generator = MAPNNGenerator(depth=depth, dtype=dtype)
        self.Discriminator = WGANVGGDiscriminator(dtype=dtype)

    def init(self, rng, patch_shape=(1, 64, 64, 1)) -> GANVariables:
        rng_g, rng_d = jax.random.split(rng)
        x = jnp.zeros(patch_shape, jnp.float32)
        params_g = jax.jit(self.Generator.init)(rng_g, x)["params"]
        params_d = jax.jit(self.Discriminator.init)(rng_d, x)["params"]
        return GANVariables(params_g=params_g, params_d=params_d, state_d={})

    @partial(jax.jit, static_argnums=0)
    def generate(self, params_g, x: Array) -> Array:
        return self.Generator.apply({"params": params_g}, x)

    def _d(self, params_d, z):
        return self.Discriminator.apply({"params": params_d}, z)

    def d_loss(self, params_d, params_g, state_d, rng, x, y, train=True,
               fake=None):
        # `fake` lets the trainer hoist G(x) out of the n-critic scan —
        # params_g is constant across the 4 D updates (engine.py:538-653)
        if fake is None:
            fake = self.generate(params_g, x)
        fake = jax.lax.stop_gradient(fake)
        wgan = -jnp.mean(self._d(params_d, y)) + jnp.mean(self._d(params_d, fake))
        gp = wgan_gradient_penalty(partial(self._d, params_d), rng, y, fake)
        return wgan + gp, (state_d, {"D/d_loss": wgan, "D/gp_loss": gp})

    def g_loss(self, params_g, params_d, state_d, rng, x, y, train=True):
        fake = self.Generator.apply({"params": params_g}, x)
        return self.g_loss_terms(fake, params_d, state_d, rng, x, y,
                                 train=train)

    def g_loss_terms(self, fake, params_d, state_d, rng, x, y, train=True):
        """g_loss given a precomputed G(x) (see wgan_vgg.g_loss_terms)."""
        adv = -jnp.mean(self._d(params_d, fake))
        mse = jnp.mean((fake - y) ** 2)
        edge = jnp.mean(
            (sobel_magnitude(fake, eps=1e-4) - sobel_magnitude(y, eps=1e-4)) ** 2
        )
        total = adv + 50.0 * mse + 50.0 * edge
        details = {"G/adv_loss": adv, "G/mse_loss": mse, "G/edge_loss": edge}
        return total, (state_d, details)
