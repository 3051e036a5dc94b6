"""Spatial-domain parallelism: halo exchange over a mesh axis.

The reference has no sequence/context parallelism — its long-context analogue
is 3D spatial resolution, handled by fixed crops + an external sliding-window
container (SURVEY.md §5.7). Here full-resolution whole-gland inference runs as
ONE SPMD program: the volume is sharded into slabs along a spatial axis, each
device extends its slab with neighbor halos via ``lax.ppermute`` (ICI
neighbor exchange — the TPU analogue of ring attention's block exchange),
runs the network on slab+halo, and keeps its core output.

The halo margin must cover the network's receptive-field overlap; for M1 with
5 resolutions and (1,3,3)/(3,3,3) kernels the in-plane receptive radius is a
few dozen voxels — ``receptive_margin`` computes a safe bound from the
architecture spec.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def receptive_margin(
    kernel_sizes: Sequence[Sequence[int]],
    strides: Sequence[Sequence[int]],
    spatial_dim: int,
) -> int:
    """Upper bound on the one-sided receptive field of the M1 encoder/decoder
    along one spatial dim: sum over levels of (k-1)/2 * cumulative stride,
    doubled for the decoder pass."""
    margin = 0
    cum = 1
    for k, s in zip(kernel_sizes, strides):
        margin += (k[spatial_dim] - 1) // 2 * cum
        cum *= s[spatial_dim]
        # each SE bottleneck adds a 3^3 conv at this resolution
        margin += 1 * cum
    return int(2 * margin)


def halo_exchange(
    x: jax.Array, halo: int, axis_name: str, spatial_axis: int
) -> jax.Array:
    """Extend a local slab with ``halo`` slices from each mesh neighbor.

    x: local block, sharded along ``axis_name``; returns the slab padded with
    the neighbors' boundary slices (edge-replicated at the global boundary).
    Runs inside shard_map.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(arr, start, size):
        sl = [slice(None)] * arr.ndim
        sl[spatial_axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return arr[tuple(sl)]

    lo_edge = take(x, 0, halo)           # my lowest slices -> to left neighbor's view
    hi_edge = take(x, -halo, halo)       # my highest slices -> to right neighbor

    # receive from left neighbor (their hi edge), from right (their lo edge)
    from_left = jax.lax.ppermute(
        hi_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        lo_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])

    # Global-boundary devices ZERO-fill their outer halo: that reproduces the
    # implicit zero padding a SAME conv applies at the true volume boundary,
    # so sharded and unsharded outputs agree voxel-for-voxel (given a halo
    # that covers the receptive field and is a multiple of the network's
    # cumulative stride along this axis for phase alignment).
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)

    return jnp.concatenate([from_left, x, from_right], axis=spatial_axis)


def make_spatial_predict(
    predict_fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    halo: int,
    spatial_axis: int = 2,
    mesh_axis: str = "spatial",
):
    """Single-program spatially-sharded inference.

    predict_fn: (B, D, H, W, C) -> (B, D, H, W, C_out), shape-polymorphic in
    the sharded spatial dim (a conv net qualifies as long as dims stay
    divisible by the stride product). Returns a jitted function over the full
    volume sharded along ``mesh_axis``; each device computes slab+halo and
    keeps its core — outputs stay sharded for downstream reduction, and a
    final with_sharding_constraint gathers when the caller asks.
    """
    from jax.experimental.shard_map import shard_map

    ndim = 5
    spec = [None] * ndim
    spec[spatial_axis] = mesh_axis
    part = P(*spec)

    def local_fn(x_local):
        padded = halo_exchange(x_local, halo, mesh_axis, spatial_axis)
        out = predict_fn(padded)
        sl = [slice(None)] * out.ndim
        sl[spatial_axis] = slice(halo, out.shape[spatial_axis] - halo)
        return out[tuple(sl)]

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(part,), out_specs=part, check_rep=False)
    return jax.jit(fn)
