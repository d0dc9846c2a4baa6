"""Test configuration: force an 8-virtual-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (standard JAX fake-cluster
trick; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # tests check numerics, not codegen quality: skipping XLA backend
    # optimization cuts CPU compile of the big GAN graphs ~15x
    + " --xla_backend_optimization_level=0"
)

import jax  # noqa: E402

# The axon sitecustomize pins JAX_PLATFORMS to the TPU tunnel before conftest
# runs; force the CPU backend explicitly (must happen before first backend use).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: the big GAN train-step graphs take minutes to
# compile on the single host core; cached re-runs are near-instant. Keyed per
# backend+host so stale AOT entries from other machines never poison a run.
import hashlib  # noqa: E402
import platform  # noqa: E402

_fh = hashlib.sha256(os.environ["XLA_FLAGS"].encode()).hexdigest()[:8]
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/mtd_gan_tpu_jax_cache_cpu-{platform.node() or 'host'}-{_fh}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
