"""WGAN-VGG — Wasserstein GAN with VGG perceptual loss.

Parity target: reference arch/WGAN_VGG/networks.py:11-122.
  * Generator: conv3x3(1->32, no bias) + ReLU, 10x conv3x3(32->32, no bias)
    + ReLU, conv1x1(32->1, no bias); output relu(out + x).
  * Discriminator: 6 conv3x3 stages (64,64/2,128,128/2,256,256/2) LeakyReLU
    0.2, fc(256*8*8 -> 1024) -> lrelu -> fc(1024 -> 1); 64x64 input contract.
  * d_loss: E[D(fake)] - E[D(real)] + 10 * gradient penalty on interpolates.
  * g_loss: -E[D(fake)] + 0.1 * MSE(VGG19[:35](fake), VGG19[:35](real)).
Engine contract: 4 D updates per G update (reference engine.py:434-438).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtd_gan_tpu.models.base import GANVariables
from mtd_gan_tpu.ops.layers import Conv, Dense

Array = jax.Array


class WGANVGGGenerator(nn.Module):
    features: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for i in range(11):
            h = Conv(self.features, kernel_size=(3, 3), padding=1, use_bias=False,
                     torch_init=True, dtype=self.dtype,
                     name=f"conv{i}")(h)
            h = nn.relu(h)
        h = Conv(1, kernel_size=(1, 1), padding=0, use_bias=False,
                 torch_init=True, dtype=self.dtype,
                 name="conv_out")(h)
        return nn.relu(h + x)


class WGANVGGDiscriminator(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = [(64, 1), (64, 2), (128, 1), (128, 2), (256, 1), (256, 2)]
        h = x
        for i, (ch, stride) in enumerate(cfg):
            h = Conv(ch, kernel_size=(3, 3), strides=(stride, stride), padding=1,
                     torch_init=True, dtype=self.dtype,
                     name=f"conv{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        # torch flatten of NCHW (C,H,W) order; transpose NHWC -> NCHW first
        # so torch-trained fc weights import correctly
        h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
        h = Dense(1024, torch_init=True, name="fc1")(h)
        h = nn.leaky_relu(h, 0.2)
        return Dense(1, torch_init=True, name="fc2")(h)


def wgan_gradient_penalty(disc_apply, rng, real: Array, fake: Array,
                          lambda_: float = 10.0) -> Array:
    """((||dD/dx at x=a*y+(1-a)*fake||_2 - 1)^2) * lambda (reference :113-122),
    computed with jax.grad through the interpolates."""
    a = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
    interp = a * real + (1.0 - a) * fake

    def d_sum(z):
        return jnp.sum(disc_apply(z))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2) * lambda_


class WGANVGGModel:
    name = "WGAN_VGG"
    n_d_tasks = 1
    d_steps_per_g = 4  # reference engine.py:434-438

    def __init__(self, dtype=None, feature_fn=None, use_perceptual=True):
        self.Generator = WGANVGGGenerator(dtype=dtype)
        self.Discriminator = WGANVGGDiscriminator(dtype=dtype)
        if use_perceptual:
            if feature_fn is None:
                from mtd_gan_tpu.features import get_perceptual_fn

                feature_fn = get_perceptual_fn("wgan_vgg")
            self.feature_fn = feature_fn
        else:
            self.feature_fn = None

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
        # `fake` lets the trainer hoist G(x) out of the n-critic scan:
        # params_g is constant across the 4 D updates (reference
        # engine.py:419-533 recomputes it per update with the same weights),
        # so one forward serves all of them
        if fake is None:
            fake = self.generate(params_g, x)
        fake = jax.lax.stop_gradient(fake)
        d_fake = self._d(params_d, fake)
        d_real = self._d(params_d, y)
        wgan = -jnp.mean(d_real) + jnp.mean(d_fake)
        gp = wgan_gradient_penalty(partial(self._d, params_d), rng, y, fake)
        details = {"D/d_loss": wgan, "D/gp_loss": gp}
        return wgan + gp, (state_d, details)

    def g_loss(self, params_g, params_d, state_d, rng, x, y, train=True):
        fake = self.Generator.apply({"params": params_g}, x)
        return self.g_loss_terms(fake, params_d, state_d, rng, x, y,
                                 train=train)

    def g_loss_terms(self, fake, params_d, state_d, rng, x, y, train=True):
        """g_loss given a precomputed G(x): all params_g dependence flows
        through `fake`, so the trainer differentiates w.r.t. fake and pulls
        the cotangent through one jax.vjp of the generator."""
        adv = -jnp.mean(self._d(params_d, fake))
        if self.feature_fn is not None:
            p = jnp.mean(
                (self.feature_fn(fake) - self.feature_fn(jax.lax.stop_gradient(y)))
                ** 2
            )
            total = adv + 0.1 * p
            details = {"G/g_loss": adv, "G/p_loss": p}
        else:
            total, details = adv, {"G/g_loss": adv}
        return total, (state_d, details)
