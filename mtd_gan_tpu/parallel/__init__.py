"""Device-mesh parallelism (TPU-native replacement for torch DataParallel,
reference train.py:93-110)."""

from mtd_gan_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
