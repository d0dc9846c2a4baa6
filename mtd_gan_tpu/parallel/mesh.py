"""Mesh construction and sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(replicate modules, scatter the batch; train.py:93-110). The TPU-native
equivalent is SPMD over a jax.sharding.Mesh: parameters replicated, the
batch dimension sharded over the 'data' axis, gradients reduced by XLA
collectives over ICI (no NCCL analogue needed).

A 'model' axis is reserved for tensor-parallel sharding of the widest
discriminator convs if models outgrow one chip; the reference never needed
TP (SURVEY.md §2.9), so the default mesh is 1-D data-parallel.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (or reshaped) mesh over the available devices.

    `shape` pins the per-axis sizes (e.g. (1, 8) for a pure tensor-parallel
    ('data', 'model') mesh, (2, 4) for 2-D); -1 fills from the device count.
    Default: all devices on the FIRST axis, trailing axes size 1."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is not None:
        known = int(np.prod([s for s in shape if s != -1]))
        shape = tuple(len(devs) // known if s == -1 else s for s in shape)
        arr = np.array(devs).reshape(shape)
    elif len(axis_names) == 1:
        arr = np.array(devs)
    else:
        # fill trailing axes with 1 except the first
        arr = np.array(devs).reshape(
            (len(devs),) + (1,) * (len(axis_names) - 1))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch sharded over the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
