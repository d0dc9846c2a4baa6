"""Channel-axis tensor parallelism for the Res-FFT-Conv generator.

The reference's only parallelism is DataParallel (train.py:93-110); this
module goes beyond parity with a TPU-idiomatic TP decomposition of the
generator (arch/Ours/networks.py:38-164) over a named mesh axis:

* Activations are channel-sharded ``(N, H, W, C/n)`` — the 2-D DFTs of
  every Res-FFT block are per-channel, so the FLOP-dominant spectral
  transforms run fully local with NO communication.
* Every 3x3 conv/deconv and the spectral 1x1 mix contract the full
  channel axis: each device contracts its input shard against the
  matching kernel slice and the partial sums meet in ONE
  ``lax.psum_scatter`` per layer (the reduce-scatter rides ICI), which
  also re-shards the output — Megatron-style row-parallel layers without
  ever materializing a replicated activation.
* The entry conv (C_in=1) is column-parallel (kernel sliced on the
  output axis, no collective); the exit deconv (C_out=1) reduces with a
  plain ``psum``, leaving the output replicated.

Composes with the data axis: run inside a 2-D ('data', 'model') mesh
with the batch sharded over 'data' and channels over 'model'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from mtd_gan_tpu.ops.dft import irfft2_matmul, rfft2_matmul

Array = jax.Array


def _shard(arr: Array, c0, cl: int, axis: int) -> Array:
    return jax.lax.dynamic_slice_in_dim(arr, c0, cl, axis)


def _conv(x: Array, kernel: Array, pad: int = 1, flip: bool = False) -> Array:
    if flip:  # ConvTranspose semantics (ops/layers.py): flipped-kernel conv
        kernel = kernel[::-1, ::-1, :, :]
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _row_parallel(x_s, kernel, bias, c0, cl, axis, *, flip=False):
    """Input-sharded conv: contract the local input shard, reduce-scatter
    the partial output over the mesh axis. Returns the output's own shard
    (+ its bias slice)."""
    part = _conv(x_s, _shard(kernel, c0, cl, 2), flip=flip)
    out_s = jax.lax.psum_scatter(part, axis, scatter_dimension=3, tiled=True)
    return out_s + _shard(bias, c0, cl, 0)


def _fft_block_tp(x_s, p, c_full, c0, cl, axis):
    """Res-FFT-Conv block (ops/fft_conv.py semantics) on a channel shard:
    out = x + ReLU(conv3x3(x)) + irfft2(ReLU(mix([Re; Im] rfft2(x)))).
    DFTs are per-channel (local); conv and mix reduce-scatter."""
    img_s = jax.nn.relu(
        _row_parallel(x_s, p["img_kernel"], p["img_bias"], c0, cl, axis))

    zr, zi = rfft2_matmul(x_s.astype(jnp.float32))
    # mix rows for the local channels: [re rows c0:c0+cl ; im rows C+c0:...]
    mix = p["fft_kernel"].astype(jnp.float32)
    rows_re = _shard(mix, c0, cl, 0)
    rows_im = _shard(mix, c_full + c0, cl, 0)
    part = jnp.einsum("nhkc,cd->nhkd", zr, rows_re) + jnp.einsum(
        "nhkc,cd->nhkd", zi, rows_im)
    # view output columns as (part, channel) so each device's scatter chunk
    # is its own channels' re AND im halves
    n, h, k, _ = part.shape
    part = part.reshape(n, h, k, 2, c_full)
    spec_s = jax.lax.psum_scatter(part, axis, scatter_dimension=4, tiled=True)
    bias = p["fft_bias"].astype(jnp.float32).reshape(2, c_full)
    spec_s = jax.nn.relu(spec_s + _shard(bias, c0, cl, 1))
    fft_out = irfft2_matmul(spec_s[..., 0, :], spec_s[..., 1, :], (x_s.shape[1], x_s.shape[2]))
    return x_s + img_s + fft_out.astype(x_s.dtype)


def _tp_forward(params, x, *, num_layers: int, features: int, cl: int,
                axis: str):
    idx = jax.lax.axis_index(axis)
    c_full = features
    c0 = idx * cl

    # entry conv: C_in = 1 -> column-parallel, no collective
    k0, b0 = params["enc_0"]["kernel"], params["enc_0"]["bias"]
    h = jax.nn.relu(_conv(x, _shard(k0, c0, cl, 3)) + _shard(b0, c0, cl, 0))
    h = _fft_block_tp(h, params["fft_0"], c_full, c0, cl, axis)

    skips = [h]
    for i in range(1, num_layers):
        p = params[f"enc_{i}"]
        h = jax.nn.relu(_row_parallel(h, p["kernel"], p["bias"], c0, cl, axis))
        h = _fft_block_tp(h, params[f"fft_{i}"], c_full, c0, cl, axis)
        skips.append(h)

    p = params[f"enc_{num_layers}"]
    h = jax.nn.relu(_row_parallel(h, p["kernel"], p["bias"], c0, cl, axis))
    h = _fft_block_tp(h, params[f"fft_{num_layers}"], c_full, c0, cl, axis)

    p = params[f"dec_{num_layers}"]
    h = jax.nn.relu(
        _row_parallel(h, p["kernel"], p["bias"], c0, cl, axis, flip=True)
        + skips[-1])
    for i in range(num_layers - 1, 0, -1):
        h = _fft_block_tp(h, params[f"fft_{2 * num_layers - i}"],
                          c_full, c0, cl, axis)
        p = params[f"dec_{i}"]
        h = jax.nn.relu(
            _row_parallel(h, p["kernel"], p["bias"], c0, cl, axis, flip=True)
            + skips[i - 1])
    h = _fft_block_tp(h, params[f"fft_{2 * num_layers}"], c_full, c0, cl, axis)

    # exit deconv: C_out = 1 -> plain psum, output replicated
    p = params["dec_0"]
    part = _conv(h, _shard(p["kernel"], c0, cl, 2), flip=True)
    out = jax.lax.psum(part, axis) + p["bias"]
    return jax.nn.relu(out + x)


def tp_generate(params, x: Array, mesh: Mesh, num_layers: int = 10,
                features: int = 32, axis: str = "model") -> Array:
    """Tensor-parallel generator forward over `mesh`'s `axis`.

    `params` is the ordinary replicated ResFFTGenerator param tree; each
    device slices its own kernel shards (weight memory stays replicated —
    the generator is 1.4 MB, TP here is about splitting the COMPUTE).
    Batch may additionally be sharded over a 'data' axis of the same mesh.
    """
    n = mesh.shape[axis]
    assert features % n == 0, (features, n)
    data_axes = tuple(a for a in mesh.axis_names if a != axis)
    xspec = P(data_axes if data_axes else None)
    fwd = shard_map(
        partial(_tp_forward, num_layers=num_layers, features=features,
                cl=features // n, axis=axis),
        mesh=mesh,
        in_specs=(P(), xspec),
        out_specs=xspec,
        check_rep=False,
    )
    # same DFT-matmul precision as the single-device spectral path
    # (fft_conv.py): without this the TP einsums lower to single-pass-bf16
    # dots on TPU and diverge from the reference numerics
    with jax.default_matmul_precision("tensorfloat32"):
        return fwd(params, x)
