"""Inference: Monte-Carlo posterior sampling and sliding-window whole-gland
prediction.

Reference behavior: ``get_detect_model().predict`` called --UNET_PROBA_ITER
times (train_model.py:71) — repeated graph executions, each drawing fresh
prior samples + MC-dropout masks (networks.py:647..., network_blocks.py:142).
TPU-native redesign: ``mc_predict`` vmaps the detect function over a batch of
PRNG keys, so N posterior samples run as ONE batched XLA program — the MC loop
lives on-device, not in Python.

Whole-gland full-resolution inference (BASELINE.json config 5) was done
outside the reference repo by a grand-challenge container (README.md:6);
``sliding_window_predict`` provides it natively: tiled crops with overlap,
Gaussian importance weighting, batched tile evaluation. For single-program
multi-chip spatial partitioning see parallel.halo.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def mc_predict(
    detect_fn: Callable,
    params,
    inputs: jax.Array,
    rng: jax.Array,
    num_samples: int = 1,
    reduce: Optional[str] = "mean",
    scan_samples: bool = False,
):
    """N Monte-Carlo posterior samples as one program.

    detect_fn: (params, inputs, rng) -> probs (from M1.get_detect_model()).
    reduce: 'mean' | 'mean_std' | None (stacked samples).
    scan_samples: run the draws as a ``lax.scan`` over keys instead of a
    vmap. Same one-program amortization of the fixed device cost, but the
    program BODY is a single-draw forward — the vmapped N*B-volume prob
    graph exceeds what the compile helper accepts at B=12 (HTTP 500,
    benchmarks/last_bench.json: prob_mc4_b12_error), while the scan form
    compiles the B-volume body once and iterates it on-device.
    """
    keys = jax.random.split(rng, num_samples)
    if scan_samples:
        _, samples = jax.lax.scan(
            lambda c, k: (c, detect_fn(params, inputs, rng=k)), None, keys)
    else:
        samples = jax.vmap(lambda k: detect_fn(params, inputs, rng=k))(keys)
    if reduce == "mean":
        return jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), samples)
    if reduce == "mean_std":
        return (
            jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), samples),
            jax.tree_util.tree_map(lambda s: jnp.std(s, axis=0), samples),
        )
    return samples


def make_chunked_batch_fn(
    apply_fn: Callable,
    chunk: int,
    n_chunks: int,
    donate: bool = False,
):
    """Compile ONE program that runs ``apply_fn`` over ``n_chunks`` batch
    chunks of size ``chunk`` via ``lax.scan``.

    The TPU-batched-inference amortization lever: on this platform every
    compiled-program execution pays a fixed device cost (~172 ms measured,
    docs/ROUND3_NOTES.md) while the marginal per-volume compute is tiny
    (~0.3 ms for cfg1 bf16). A single device step's batch is capped by peak
    ACTIVATION memory (the b128 HBM knee), but activations live only for
    one scan iteration — so chunking the batch inside the program holds
    peak HBM at chunk size while amortizing the fixed cost over
    ``chunk * n_chunks`` volumes. Inputs/outputs scale with the full batch
    (they are the only K-resident buffers).

    apply_fn: (x: (chunk, ...)) -> y (chunk leading axis; any pytree of
    arrays works). Returns a jitted fn mapping (chunk*n_chunks, ...) ->
    outputs with the same leading batch. ``donate=True`` additionally
    donates the input buffer (production serving; do not use when timing
    a reused input).
    """
    def run(x):
        xr = x.reshape(n_chunks, chunk, *x.shape[1:])
        _, ys = jax.lax.scan(lambda c, xb: (c, apply_fn(xb)), None, xr)
        return jax.tree_util.tree_map(
            lambda t: t.reshape(chunk * n_chunks, *t.shape[2:]), ys)

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def _gaussian_importance(window: Sequence[int], sigma_scale: float = 0.125) -> np.ndarray:
    """nnU-Net-style Gaussian tile weighting: center votes count more."""
    w = np.ones(tuple(window), np.float32)
    for ax, size in enumerate(window):
        x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
        sigma = max(size * sigma_scale, 1e-3)
        g = np.exp(-0.5 * (x / sigma) ** 2)
        shape = [1] * len(window)
        shape[ax] = size
        w = w * g.reshape(shape)
    return w / w.max()


def _tile_starts(full: int, window: int, overlap: float) -> Sequence[int]:
    if window >= full:
        return [0]
    step = max(int(round(window * (1.0 - overlap))), 1)
    starts = list(range(0, full - window + 1, step))
    if starts[-1] != full - window:
        starts.append(full - window)
    return starts


def make_sliding_window_fn(
    predict_fn: Callable[[jax.Array], jax.Array],
    full_spatial: Sequence[int],
    window: Sequence[int],
    in_channels: int,
    out_channels: int,
    overlap: float = 0.5,
    batch_size: int = 4,
    gaussian_weights: bool = True,
    cases: int = 1,
    rng_per_chunk: bool = False,
    mesh=None,
    out_dtype=None,
) -> Callable[[jax.Array], jax.Array]:
    """ONE-program sliding-window inference (VERDICT r2 item 6).

    The eager ``sliding_window_predict`` below dispatches one device program
    per tile batch plus one per blend op — ruinous on a tunnel with a ~9 ms
    dispatch floor (docs/ROUND2_NOTES.md). This factory compiles the WHOLE
    pipeline — tile gather (vmapped dynamic_slice), network forward, and
    Gaussian-blended scatter accumulation — into a single jitted program:
    ``lax.scan`` over tile chunks, ``fori_loop`` + ``dynamic_update_slice``
    for the overlap blend.

    predict_fn must be traceable: (B, *window, C_in) -> (B, *window, C_out).
    Tile geometry is static (shapes fixed at trace time); the tile count is
    padded to a multiple of ``batch_size`` with zero-weight duplicates.

    cases > 1 vmaps the whole pipeline over a leading case axis: K exams run
    as ONE program, amortizing the fixed per-program execution cost (measured
    ~170 ms on this tunnel, docs/ROUND2_NOTES.md — at cases=1 that floor IS
    the whole 0.171 s/case config-5 result). ``run`` then maps
    ``(K, *full_spatial, C_in) -> (K, *full_spatial, out_channels)``.

    rng_per_chunk=True threads a PRNG key through: ``run(volume, key)`` and
    ``predict_fn(tiles, chunk_key)``, where ``chunk_key`` is ``key`` folded
    with the chunk index — each tile chunk draws fresh randomness (MC
    dropout / prior sampling) inside the single program. With cases > 1 the
    key is shared across cases (tiles still differ per case).

    Returns ``run(volume) -> (*full_spatial, out_channels)`` fp32, equal to
    ``sliding_window_predict`` to float tolerance (tests/test_infer_and_parallel.py).
    """
    full_spatial = tuple(full_spatial)
    window = tuple(window)
    ndim = len(window)
    assert ndim == len(full_spatial)
    starts = [_tile_starts(full_spatial[i], window[i], overlap)
              for i in range(ndim)]
    coords = np.asarray(list(itertools.product(*starts)), np.int32)
    n = len(coords)
    n_pad = -(-n // batch_size) * batch_size
    coords_p = np.concatenate(
        [coords, np.repeat(coords[:1], n_pad - n, axis=0)], axis=0)
    mask = np.zeros((n_pad,), np.float32)
    mask[:n] = 1.0
    chunk_coords = jnp.asarray(coords_p.reshape(-1, batch_size, ndim))
    chunk_mask = jnp.asarray(mask.reshape(-1, batch_size))
    weight_np = (_gaussian_importance(window) if gaussian_weights
                 else np.ones(tuple(window), np.float32))

    chunk_ids = jnp.arange(chunk_coords.shape[0], dtype=jnp.uint32)

    def run(volume: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        weight = jnp.asarray(weight_np)[..., None]

        def gather(c):
            return jax.lax.dynamic_slice(
                volume, (*(c[i] for i in range(ndim)), 0),
                (*window, in_channels))

        def body(carry, xs):
            acc, norm = carry
            cs, ms, cid = xs
            tiles = jax.vmap(gather)(cs)
            if rng_per_chunk:
                outs = predict_fn(
                    tiles, jax.random.fold_in(key, cid)).astype(jnp.float32)
            else:
                outs = predict_fn(tiles).astype(jnp.float32)

            def upd(i, an):
                a, nrm = an
                idx = tuple(cs[i][j] for j in range(ndim)) + (0,)
                w = weight * ms[i]
                patch = jax.lax.dynamic_slice(a, idx, (*window, out_channels))
                a = jax.lax.dynamic_update_slice(a, patch + outs[i] * w, idx)
                np_ = jax.lax.dynamic_slice(nrm, idx[:-1] + (0,), (*window, 1))
                nrm = jax.lax.dynamic_update_slice(nrm, np_ + w, idx[:-1] + (0,))
                return a, nrm

            acc, norm = jax.lax.fori_loop(0, cs.shape[0], upd, (acc, norm))
            return (acc, norm), None

        acc = jnp.zeros((*full_spatial, out_channels), jnp.float32)
        norm = jnp.zeros((*full_spatial, 1), jnp.float32)
        (acc, norm), _ = jax.lax.scan(body, (acc, norm),
                                      (chunk_coords, chunk_mask, chunk_ids))
        out = acc / jnp.maximum(norm, 1e-8)
        # out_dtype: fused device-side cast before the host pull — this
        # tunnel's device->host link runs at ~22 MB/s (60x slower than
        # host->device), so halving the transfer bytes ~halves serving
        # latency for whole-gland outputs
        return out if out_dtype is None else out.astype(out_dtype)

    if cases == 1:
        return jax.jit(run)

    # cases > 1: optionally shard the case axis over a mesh's 'data'
    # dimension — K whole-gland exams then run as ONE SPMD program across
    # the slice. The case axis is embarrassingly parallel, so shard_map is
    # the right tool: each device runs the unpartitioned single-case
    # program on its local cases/ K/n_data (no collectives; also sidesteps
    # a GSPMD×scan CPU-codegen failure hit with sharding annotations).
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        assert cases % mesh.shape["data"] == 0, (
            f"cases={cases} must divide the mesh data axis "
            f"({mesh.shape['data']})")
        if rng_per_chunk:
            return jax.jit(jax.shard_map(
                lambda vols, key: jax.vmap(lambda v: run(v, key))(vols),
                mesh=mesh, in_specs=(P("data"), P()), out_specs=P("data"),
                check_vma=False))
        return jax.jit(jax.shard_map(
            jax.vmap(run), mesh=mesh, in_specs=(P("data"),),
            out_specs=P("data"), check_vma=False))
    if rng_per_chunk:
        return jax.jit(lambda vols, key: jax.vmap(
            lambda v: run(v, key))(vols))
    return jax.jit(jax.vmap(run))


def sliding_window_predict(
    predict_fn: Callable[[jax.Array], jax.Array],
    volume: jax.Array,
    window: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    gaussian_weights: bool = True,
    out_channels: Optional[int] = None,
) -> jax.Array:
    """Full-volume prediction by overlapping tiles (EAGER, op-by-op).

    predict_fn: (B, *window, C_in) -> (B, *window, C_out) — any Python
    callable (need not be traceable: serve.py threads RNG/MC logic through
    it). volume: (*full_spatial, C_in). Tiles are batched to keep the MXU
    busy; per-tile Gaussian weights blend overlaps.

    For traceable predict_fns prefer ``make_sliding_window_fn`` — the same
    math as one compiled program (no per-op dispatch tax).
    """
    spatial = volume.shape[:-1]
    assert len(spatial) == len(window)
    starts = [
        _tile_starts(spatial[i], window[i], overlap) for i in range(len(window))
    ]
    coords = list(itertools.product(*starts))

    tiles = jnp.stack([
        jax.lax.dynamic_slice(
            volume, (*c, 0), (*window, volume.shape[-1]))
        for c in coords
    ])

    outs = []
    for i in range(0, len(coords), batch_size):
        chunk = tiles[i : i + batch_size]
        outs.append(predict_fn(chunk))
    outs = jnp.concatenate(outs, axis=0)
    c_out = outs.shape[-1] if out_channels is None else out_channels

    weight = (
        jnp.asarray(_gaussian_importance(window)) if gaussian_weights
        else jnp.ones(tuple(window), jnp.float32)
    )[..., None]

    acc = jnp.zeros((*spatial, c_out), jnp.float32)
    norm = jnp.zeros((*spatial, 1), jnp.float32)
    for idx, c in enumerate(coords):
        acc = jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (*c, 0), (*window, c_out))
            + outs[idx].astype(jnp.float32) * weight,
            (*c, 0),
        )
        norm = jax.lax.dynamic_update_slice(
            norm,
            jax.lax.dynamic_slice(norm, (*c, 0), (*window, 1)) + weight,
            (*c, 0),
        )
    return acc / jnp.maximum(norm, 1e-8)
