"""Learnable HU windowing as a 1x1 conv with clipped-ReLU / sigmoid
activation, initialized to five radiology presets.

Parity target: reference module/window_conv.py:7-72 ("Practical Window
Setting Optimization", arXiv:1812.00572). Input is the [0,1]
dicom-normalized slice; each output channel is a learnable window
w*x + b squashed to [0,1]:
    brain          W 50.000  B -12.500
    subdural       W 31.250  B  -7.687
    stroke         W 45.455  B -11.682
    temporal bones W  1.464  B  -0.081
    soft tissues   W 11.628  B  -2.465
Named a first-class deliverable by the north star (BASELINE.json): this is
the fused-windowing building block of the preprocessing path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

WINDOW_PRESET_WEIGHTS = np.array([50.0, 31.25, 45.455, 1.464, 11.628], np.float32)
WINDOW_PRESET_BIASES = np.array([-12.5, -7.687, -11.682, -0.081, -2.465], np.float32)


class WindowConv2D(nn.Module):
    """1x1 conv over the HU-normalized channel + bounded activation."""

    mode: str = "relu"  # 'relu' (clip to [0,1]) or 'sigmoid'
    out_channels: int = 5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]

        def w_init(key, shape, dtype=jnp.float32):
            base = WINDOW_PRESET_WEIGHTS[
                np.arange(self.out_channels) % 5
            ].astype(np.float32)
            return jnp.broadcast_to(base, shape).astype(dtype)

        def b_init(key, shape, dtype=jnp.float32):
            base = WINDOW_PRESET_BIASES[np.arange(self.out_channels) % 5]
            return jnp.asarray(base, dtype)

        w = self.param("weight", w_init, (in_ch, self.out_channels))
        b = self.param("bias", b_init, (self.out_channels,))
        y = x @ w.astype(x.dtype) + b.astype(x.dtype)
        if self.mode == "relu":
            return jnp.clip(y, 0.0, 1.0)
        if self.mode == "sigmoid":
            return jax.nn.sigmoid(y)
        raise ValueError(f"unknown mode {self.mode!r}")
