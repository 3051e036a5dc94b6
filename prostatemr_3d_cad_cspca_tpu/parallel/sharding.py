"""Tensor-parallel parameter sharding over the mesh 'model' axis.

The reference has no TP (SURVEY.md §2.1: "optional mesh axis sharding conv
channels via pjit partition specs — cheap to expose since pjit is the
substrate"). This module provides exactly that: partition rules that shard
the OUTPUT-channel axis of wide conv kernels (and the matching biases /
norm affines) across 'model'; everything else replicates. Under pjit, XLA
propagates the shardings through the conv dataflow and inserts the ICI
collectives — no manual all-reduce code.

Sharding the output-channel axis keeps each conv's contraction local (the
input channels of the NEXT conv are then split, which XLA resolves with an
all-gather or keeps sharded when profitable). For M1's widest stages
(256-512 channels) this is the only axis with enough extent to split.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(
    params: Any,
    min_channels: int = 128,
    axis: str = "model",
    axis_size: int = 1,
):
    """PartitionSpec pytree: conv kernels with >= min_channels channels in
    the last axis shard it over ``axis`` (output channels for Conv, input
    channels for ConvTranspose(transpose_kernel=True) — both are valid TP
    splits); matching-width biases/norm affines shard too; everything else
    (and anything not divisible by ``axis_size``) replicates."""

    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        def divisible(n):
            return axis_size <= 1 or n % axis_size == 0
        if (leaf.ndim >= 2 and name == "kernel"
                and leaf.shape[-1] >= min_channels and divisible(leaf.shape[-1])):
            return P(*([None] * (leaf.ndim - 1)), axis)
        if (leaf.ndim == 1 and leaf.shape[0] >= min_channels
                and divisible(leaf.shape[0]) and name in ("bias", "scale")):
            return P(axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh, min_channels: int = 128):
    """Place a param pytree on the mesh with TP sharding applied."""
    specs = param_partition_spec(
        params, min_channels, axis_size=mesh.shape.get("model", 1))
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def state_shardings(state_like: Any, mesh: Mesh, min_channels: int = 128,
                    axis: str = "model"):
    """NamedSharding pytree for a TrainState.

    Optimizer states (optax) mirror the param tree inside their fields (mu/nu
    for Adam, trace for momentum), so the same path-based rule applies: leaf
    paths ending in kernel/bias/scale with wide channels shard over 'model';
    counts and other scalars replicate.
    """

    axis_size = mesh.shape.get(axis, 1)

    def spec(path, leaf):
        if not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        name = path[-1].key if path and hasattr(path[-1], "key") else ""
        def divisible(n):
            return axis_size <= 1 or n % axis_size == 0
        if (leaf.ndim >= 2 and name == "kernel"
                and leaf.shape[-1] >= min_channels and divisible(leaf.shape[-1])):
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1)), axis))
        if (leaf.ndim == 1 and leaf.shape[0] >= min_channels
                and divisible(leaf.shape[0]) and name in ("bias", "scale")):
            return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return type(state_like)(
        params=jax.tree_util.tree_map_with_path(spec, state_like.params),
        opt_state=jax.tree_util.tree_map_with_path(spec, state_like.opt_state),
        step=NamedSharding(mesh, P()),
    )
