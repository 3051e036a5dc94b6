"""Instance normalization for 3D volumes (NDHWC).

Parity target: ``tfa.layers.InstanceNormalization`` as used throughout the
reference (tf2.5/scripts/model/unets/network_blocks.py:38-44 and
networks.py:473): per-sample, per-channel statistics over all spatial dims,
learned scale/offset, epsilon 1e-3 (tfa GroupNormalization default).

TPU notes:
  * statistics are always computed in fp32, even under bf16 compute — IN is
    variance-sensitive and bf16 accumulation loses too many bits over
    20*160*160 voxels;
  * under spatial (halo) sharding the reduction must span the full volume, so
    ``instance_norm`` takes an optional ``axis_name`` and folds shard-local
    sums with ``lax.psum`` (the reference never needed this: its IN always saw
    whole volumes on one GPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ShardedStats:
    """Context for EXACT full-volume statistics under halo-sharded SPMD.

    Inside ``parallel.halo.make_spatial_predict`` every device holds
    slab+2*halo along ``spatial_axis``. Because the halo is a multiple of the
    network's cumulative stride, the tensor at ANY resolution keeps the
    invariant ``local_halo = halo * t // extent`` (t = current local extent):
    the slice [local_halo, t-local_halo) is this shard's core, and the union
    of cores over the mesh axis is exactly the full volume. Statistics are
    therefore computed as core-masked local sums + ``lax.psum`` — bitwise the
    same reduction set as the unsharded network (the reference's IN always saw
    whole volumes on one device, network_blocks.py:38-44).
    """

    axis_name: str     # mesh axis to psum over
    spatial_axis: int  # NDHWC tensor axis that is spatially sharded
    halo: int          # halo width at the network input resolution
    extent: int        # local input extent incl. both halos (slab + 2*halo)


def _core_slice(x: jax.Array, sharded: ShardedStats) -> jax.Array:
    t = x.shape[sharded.spatial_axis]
    h = sharded.halo * t // sharded.extent
    sl = [slice(None)] * x.ndim
    sl[sharded.spatial_axis] = slice(h, t - h)
    return x[tuple(sl)]


def revacuum(x: jax.Array, sharded: Optional[ShardedStats]) -> jax.Array:
    """Zero the outside-the-volume ("vacuum") region of edge shards.

    An unsharded SAME conv pads the TRUE volume boundary with zeros at EVERY
    layer; in halo-sharded execution the vacuum region instead accumulates
    conv biases / IN offsets layer over layer, so a later conv whose window
    crosses the volume edge would read nonzero garbage. Re-zeroing the vacuum
    after each norm (and after transposed convs, which have no following
    norm before the next spatial conv) restores the exact zero-extension the
    unsharded network computes with. No-op for interior shards.
    """
    if sharded is None:
        return x
    ax = sharded.spatial_axis
    t = x.shape[ax]
    h = sharded.halo * t // sharded.extent
    slab = t - 2 * h
    idx = jax.lax.axis_index(sharded.axis_name)
    n = jax.lax.axis_size(sharded.axis_name)
    shape = [1] * x.ndim
    shape[ax] = t
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), ax)
    gpos = pos - h + idx * slab
    keep = (gpos >= 0) & (gpos < n * slab)
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def global_spatial_mean(
    x: jax.Array, sharded: Optional[ShardedStats] = None
) -> jax.Array:
    """fp32-accumulated mean over all spatial dims (keepdims), cross-shard
    exact when ``sharded`` is given. Used by the SE squeeze (GAP), which —
    like instance norm — must span the full volume under spatial sharding."""
    axes = tuple(range(1, x.ndim - 1))
    if sharded is None:
        return jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    core = _core_slice(x, sharded).astype(jnp.float32)
    s = jnp.sum(core, axis=axes, keepdims=True)
    n_local = 1
    for a in axes:
        n_local *= core.shape[a]
    s = jax.lax.psum(s, sharded.axis_name)
    n = n_local * jax.lax.psum(1, sharded.axis_name)
    return s / n


# Lane-packed statistics (round 5, VERDICT r4 item 6). The round-4 per-op
# roofline table (docs/ATTRIBUTION.md, r4_roofline_infer.json) attributes
# ~19 ms of the cfg1 program's 47 ms excess-over-roofline to IN-stats
# reduction fusions (2.5-4.2x their own roofline): XLA lays the big NDHWC
# activations out batch-minor ({0,4,3,2,1}: batch in lanes, C in sublanes)
# and the (D,H,W)-reduction runs at 56-180 GB/s vs the 711 GB/s stream.
# The packed formulation folds q = 128/C spatial positions into the channel
# axis ((B, M, C) -> (B, M/q, 128), a row-major bitcast), reduces over rows
# at full lane occupancy, then folds the q per-channel sub-sums (a (B,128)
# second pass — negligible). Exactness: identical addends, different
# association order; fp32 accumulation both ways (pinned by
# tests/test_normalization.py::test_packed_stats_exact).
_STATS_MODE = "naive"  # "naive" | "packed" | "staged"


def set_packed_stats(enabled: bool) -> None:
    """Back-compat toggle for the lane-packed IN statistics variant."""
    set_stats_mode("packed" if enabled else "naive")


def set_stats_mode(mode: str) -> None:
    """Select the bf16 IN statistics formulation (A/B-measured in
    benchmarks/r5_probe_instats{,2}.py; the measured winner is the default).

    naive   one jnp.mean over all spatial axes (XLA single reduce) — DEFAULT
    packed  fold q=128/C spatial positions into lanes first (measured
            2026-08-20: LOSES — cfg1 b120 304 ms vs 202 naive; the reshape
            materializes a relayout copy against the batch-minor
            {0,4,3,2,1} layouts XLA picks in-context)
    staged  per-axis sum chain W->H->D (measured 2026-08-20: bit-identical
            output AND wall time to naive — XLA canonicalizes both to the
            same program)

    Verdict (docs/ATTRIBUTION.md round-5 addendum): the IN-stats roofline
    outliers are measured-immovable at the JAX expression level; keep naive.
    """
    if mode not in ("naive", "packed", "staged"):
        raise ValueError(f"unknown stats mode {mode!r}")
    global _STATS_MODE
    _STATS_MODE = mode


def _staged_spatial_stats(x: jax.Array):
    """(mean, E[x^2]) via a per-axis reduction chain (minor spatial axis
    first). Same addends as the naive reduce, staged association."""
    n = 1
    for s in x.shape[1:-1]:
        n *= s
    s = x.astype(jnp.float32)
    ss = jnp.square(x.astype(jnp.float32))
    for ax in range(x.ndim - 2, 0, -1):
        s = jnp.sum(s, axis=ax, keepdims=True)
        ss = jnp.sum(ss, axis=ax, keepdims=True)
    return s / n, ss / n


def _packed_spatial_stats(x: jax.Array):
    """(mean, E[x^2]) over spatial dims via a 128-lane-packed reduction.

    Returns fp32 keepdims tensors shaped (B, 1, ..., 1, C), or None when the
    shape doesn't divide into full lanes (C > 128, C not a power-of-two
    divisor of 128, or M % q != 0)."""
    b, c = x.shape[0], x.shape[-1]
    m = 1
    for s in x.shape[1:-1]:
        m *= s
    if c >= 128 or 128 % c != 0:
        return None
    q = 128 // c
    if m % q != 0:
        return None
    xp = x.reshape(b, m // q, q * c)
    s = jnp.sum(xp, axis=1, dtype=jnp.float32)
    ss = jnp.sum(jnp.square(xp.astype(jnp.float32)), axis=1)
    s = jnp.sum(s.reshape(b, q, c), axis=1)
    ss = jnp.sum(ss.reshape(b, q, c), axis=1)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    n = float(m)
    return (s / n).reshape(shape), (ss / n).reshape(shape)


def instance_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    epsilon: float = 1e-3,
    axis_name: Optional[str] = None,
    sharded: Optional[ShardedStats] = None,
) -> jax.Array:
    """Functional instance norm over all dims except batch (0) and channel (-1).

    ``sharded`` switches to EXACT halo-aware cross-shard statistics (see
    ShardedStats): core-masked fp32 sums + psum, then a full-tensor affine —
    halo voxels get normalized with the global stats too, matching what the
    owning shard computes for them.
    """
    reduce_axes = tuple(range(1, x.ndim - 1))
    if sharded is not None:
        core = _core_slice(x, sharded).astype(jnp.float32)
        s = jnp.sum(core, axis=reduce_axes, keepdims=True)
        ss = jnp.sum(jnp.square(core), axis=reduce_axes, keepdims=True)
        n_local = 1
        for a in reduce_axes:
            n_local *= core.shape[a]
        s = jax.lax.psum(s, sharded.axis_name)
        ss = jax.lax.psum(ss, sharded.axis_name)
        n = n_local * jax.lax.psum(1, sharded.axis_name)
        mean = s / n
        var = jnp.maximum(ss / n - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + epsilon)
        a_ = inv * scale.astype(jnp.float32)
        b_ = bias.astype(jnp.float32) - mean * a_
        y = (x.astype(jnp.float32) * a_ + b_).astype(x.dtype)
        return revacuum(y, sharded)
    if axis_name is None and x.dtype != jnp.float32:
        # bf16 fast path: fp32-ACCUMULATED reductions without materializing an
        # fp32 copy (profiling showed the convert+reduce passes of the naive
        # formulation cost ~40% of M1's forward device time). One-pass
        # E[x^2]-E[x]^2 is safe here: post-conv activations are near zero-mean
        # and the accumulator is fp32. The fp32 input path keeps the centered
        # two-pass formula for exact reference parity.
        alt = None
        if _STATS_MODE == "packed":
            alt = _packed_spatial_stats(x)
        elif _STATS_MODE == "staged":
            alt = _staged_spatial_stats(x)
        if alt is not None:
            mean, ex2 = alt
        else:
            mean = jnp.mean(x, axis=reduce_axes, keepdims=True,
                            dtype=jnp.float32)
            ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)),
                           axis=reduce_axes, keepdims=True)
        var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + epsilon)
        a = (inv * scale.astype(jnp.float32)).astype(x.dtype)
        b = (bias.astype(jnp.float32) - mean * inv * scale.astype(jnp.float32)
             ).astype(x.dtype)
        return x * a + b
    xf = x.astype(jnp.float32)
    if axis_name is None:
        mean = jnp.mean(xf, axis=reduce_axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes, keepdims=True)
    else:
        # Cross-shard statistics: each shard holds a slab of the volume.
        n_local = 1
        for a in reduce_axes:
            n_local *= x.shape[a]
        s = jnp.sum(xf, axis=reduce_axes, keepdims=True)
        ss = jnp.sum(jnp.square(xf), axis=reduce_axes, keepdims=True)
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        n = n_local * jax.lax.psum(1, axis_name)
        mean = s / n
        var = ss / n - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + epsilon)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class InstanceNorm(nn.Module):
    """Learned-affine instance normalization (tfa.layers.InstanceNormalization parity)."""

    epsilon: float = 1e-3
    param_dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    sharded: Optional[ShardedStats] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        return instance_norm(
            x, scale, bias, epsilon=self.epsilon, axis_name=self.axis_name,
            sharded=self.sharded,
        )
