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
):
    """N Monte-Carlo posterior samples as one vmapped program.

    detect_fn: (params, inputs, rng) -> probs (from M1.get_detect_model()).
    reduce: 'mean' | 'mean_std' | None (stacked samples).
    """
    keys = jax.random.split(rng, num_samples)
    samples = jax.vmap(lambda k: detect_fn(params, inputs, rng=k))(keys)
    if reduce == "mean":
        return jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), samples)
    if reduce == "mean_std":
        return (
            jax.tree_util.tree_map(lambda s: jnp.mean(s, axis=0), samples),
            jax.tree_util.tree_map(lambda s: jnp.std(s, axis=0), samples),
        )
    return samples


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


def sliding_window_predict(
    predict_fn: Callable[[jax.Array], jax.Array],
    volume: jax.Array,
    window: Sequence[int],
    overlap: float = 0.5,
    batch_size: int = 4,
    gaussian_weights: bool = True,
    out_channels: Optional[int] = None,
) -> jax.Array:
    """Full-volume prediction by overlapping tiles.

    predict_fn: (B, *window, C_in) -> (B, *window, C_out), typically a jitted
    detect closure. volume: (*full_spatial, C_in). Tiles are batched to keep
    the MXU busy; per-tile Gaussian weights blend overlaps.
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
