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
    """Extend a local slab with ``halo`` slices from each side's neighbors.

    x: local block, sharded along ``axis_name``; returns the slab padded with
    neighbor content. Runs inside shard_map.

    When ``halo`` exceeds the slab extent, multiple ring hops gather content
    from further neighbors (k-th hop = whole slab of the k-th neighbor), so
    deep receptive fields work on thin shards.

    Global-boundary devices ZERO-fill their outer halo: that reproduces the
    implicit zero padding a SAME conv applies at the true volume boundary,
    so sharded and unsharded outputs agree voxel-for-voxel (given a halo
    that covers the receptive field and is a multiple of the network's
    cumulative stride along this axis for phase alignment).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    slab = x.shape[spatial_axis]
    hops = -(-halo // slab)  # ceil

    def take(arr, start, size):
        sl = [slice(None)] * arr.ndim
        sl[spatial_axis] = (
            slice(start, start + size) if start >= 0 else slice(start, None))
        return arr[tuple(sl)]

    left_parts = []   # ordered far -> near, concatenated before x
    right_parts = []  # ordered near -> far, concatenated after x
    for k in range(hops, 0, -1):
        # from the k-th neighbor to the LEFT: its full slab (shift right by k)
        from_left = jax.lax.ppermute(
            x, axis_name, [(i, (i + k) % n) for i in range(n)])
        from_left = jnp.where(idx >= k, from_left, jnp.zeros_like(from_left))
        left_parts.append(from_left)
    for k in range(1, hops + 1):
        from_right = jax.lax.ppermute(
            x, axis_name, [(i, (i - k) % n) for i in range(n)])
        from_right = jnp.where(
            idx < n - k, from_right, jnp.zeros_like(from_right))
        right_parts.append(from_right)

    left = jnp.concatenate(left_parts, axis=spatial_axis) if left_parts else None
    right = jnp.concatenate(right_parts, axis=spatial_axis) if right_parts else None
    left = take(left, -halo, halo)   # innermost `halo` rows adjacent to x
    right = take(right, 0, halo)
    return jnp.concatenate([left, x, right], axis=spatial_axis)


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
    from jax import shard_map

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
        local_fn, mesh=mesh, in_specs=(part,), out_specs=part, check_vma=False)
    return jax.jit(fn)


def _stride_product(strides: Sequence[Sequence[int]], spatial_dim: int) -> int:
    p = 1
    for s in strides:
        p *= s[spatial_dim]
    return p


def _halo_geometry(model, n_shards: int, extent: int, spatial_axis: int,
                   halo: int | None):
    """(halo, slab) for a sharded M1: halo covers the receptive margin and is
    a multiple of the cumulative stride (phase alignment); slab divides."""
    cfg = model.config
    sd = spatial_axis - 1
    stride_prod = _stride_product(cfg["strides"], sd)
    assert extent % n_shards == 0, (extent, n_shards)
    slab = extent // n_shards
    assert slab % stride_prod == 0, (
        f"local slab {slab} must be a multiple of the cumulative stride "
        f"{stride_prod} along axis {spatial_axis}")
    if halo is None:
        margin = receptive_margin(cfg["kernel_sizes"], cfg["strides"], sd)
        halo = ((margin + stride_prod - 1) // stride_prod) * stride_prod
    assert halo % stride_prod == 0, (halo, stride_prod)
    return halo, slab


def make_spatial_train_step(
    model,
    seg_loss,
    optimizer,
    mesh: Mesh,
    spatial_axis: int = 2,
    mesh_axis: str = "spatial",
    halo: int | None = None,
):
    """EXPERIMENTAL: spatially-sharded TRAINING step — full-resolution
    volumes too large for one device's HBM train as ONE SPMD program, the
    long-context-training analogue (SURVEY.md §5.7). The reference could
    only train on fixed crops (preprocess.py:42-49); here the volume/labels
    are slab-sharded along ``spatial_axis``, each device computes its
    slab+halo forward (exact: input halos + cross-shard IN/SE statistics),
    sums the loss over its CORE voxels, and loss + grads are psum'd.

    Contracts (tests/test_spatial_train.py):
      * the LOSS equals the unsharded step to float tolerance for the full
        M1, every step;
      * GRADIENTS are float-exact through every cross-device coupling used
        here, pinned on a conv+IN+SE stack. For the full deep M1, per-leaf
        fp32 gradient comparison against the unsharded program is
        numerically ill-posed (conv-bias-into-IN directions have
        analytically zero gradient computed by catastrophic cancellation —
        the unsharded autodiff disagrees with its own finite difference
        there), so bitwise gradient parity at depth is not asserted.

    seg_loss must expose ``per_sample_sums(y_true, y_pred) -> (B,)``
    (losses.Focal does); deterministic models (dropout off) keep the
    exactness contract — active dropout would draw independent masks for a
    voxel's core and halo computations.

    Returns ``step(params, opt_state, image, label) ->
    (params, opt_state, loss)``, jitted over the mesh.
    """
    from jax import shard_map

    from ..ops.normalization import ShardedStats

    # Constructive guards (ADVICE r2): the exactness contract requires
    # deterministic models. Active dropout would draw independent masks for a
    # voxel's core and halo computations (and net.apply below passes no
    # 'dropout' rng, which would fail at trace with an opaque flax error);
    # deep supervision emits 4*nc-channel y_softmax that per_sample_sums
    # cannot reduce against an nc-length alpha.
    cfg = model.config
    if cfg.get("dropout_rate", 0) > 0:
        raise ValueError(
            "make_spatial_train_step requires a deterministic model: build "
            "the M1 with dropout_rate=0 (got "
            f"{cfg['dropout_rate']}, mode={cfg.get('dropout_mode')!r}).")
    if cfg.get("deep_supervision"):
        raise ValueError(
            "make_spatial_train_step does not support deep_supervision=True: "
            "the stacked 4*num_classes-channel y_softmax is incompatible with "
            "seg_loss.per_sample_sums over core voxels.")
    if cfg.get("probabilistic") or cfg.get("cascaded"):
        raise ValueError(
            "make_spatial_train_step supports stand-alone deterministic M1 "
            "models only (probabilistic/cascaded not yet supported).")

    n = mesh.shape[mesh_axis]
    spec = [None] * 5
    spec[spatial_axis] = mesh_axis
    part = P(*spec)
    geom = {}

    def local_loss(params, img, lab):
        padded = halo_exchange(img, geom["halo"], mesh_axis, spatial_axis)
        net = model.net.clone(sharded=ShardedStats(
            axis_name=mesh_axis, spatial_axis=spatial_axis,
            halo=geom["halo"], extent=padded.shape[spatial_axis]))
        out = net.apply({"params": params}, padded, train=True)
        sl = [slice(None)] * 5
        sl[spatial_axis] = slice(geom["halo"],
                                 padded.shape[spatial_axis] - geom["halo"])
        y_core = out["y_softmax"][tuple(sl)]
        partial = seg_loss.per_sample_sums(lab, y_core)     # (B,) local core
        return jnp.mean(partial)                            # LOCAL partial

    def local_grads(params, img, lab):
        # differentiate the shard-LOCAL partial loss, THEN psum both value
        # and grads: psum inside the differentiated function would let
        # psum's transpose double-count the replicated cotangent.
        loss, grads = jax.value_and_grad(local_loss)(params, img, lab)
        loss = jax.lax.psum(loss, mesh_axis)                # full-volume loss
        grads = jax.lax.psum(grads, mesh_axis)  # sum shard-local contributions
        return loss, grads

    def step(params, opt_state, image, label):
        geom["halo"], _ = _halo_geometry(
            model, n, image.shape[spatial_axis], spatial_axis, halo)
        loss, grads = shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), part, part), out_specs=(P(), P()),
            check_vma=False,
        )(params, image, label)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def spatial_infer_m1(
    model,
    params,
    volume: jax.Array,
    mesh: Mesh,
    spatial_axis: int = 2,
    mesh_axis: str = "spatial",
    halo: int | None = None,
):
    """Single-program halo-sharded M1 inference over a full-resolution volume.

    Picks the halo from the architecture's receptive margin, rounded UP to a
    multiple of the network's cumulative stride along the sharded axis (phase
    alignment: a strided conv on the extended slab must sample the same grid
    as the unsharded network). The local slab must also divide evenly.

    volume: (B, D, H, W, C); returns y_softmax (deterministic M1) computed as
    ONE SPMD program with `ppermute` halo exchange — the TPU-native form of
    whole-gland full-resolution inference (SURVEY.md §5.7).

    ACCURACY CONTRACT: EXACT. Input-level halos make every conv voxel-exact,
    and the instance norms + SE squeezes compute full-volume statistics via
    core-masked psum (ops.normalization.ShardedStats), so sharded and
    unsharded outputs agree to float tolerance (tested at atol 1e-5,
    tests/test_infer_and_parallel.py). The reference's IN always saw whole
    volumes on one device (network_blocks.py:38-44); this reproduces that
    reduction set across shards.
    """
    n = mesh.shape[mesh_axis]
    halo, slab = _halo_geometry(
        model, n, volume.shape[spatial_axis], spatial_axis, halo)

    from ..ops.normalization import ShardedStats

    net = model.net.clone(sharded=ShardedStats(
        axis_name=mesh_axis, spatial_axis=spatial_axis, halo=halo,
        extent=slab + 2 * halo))

    def predict(x):
        return net.apply({"params": params}, x, train=False)["y_softmax"]

    fn = make_spatial_predict(
        predict, mesh, halo=halo, spatial_axis=spatial_axis,
        mesh_axis=mesh_axis)
    return fn(volume)
