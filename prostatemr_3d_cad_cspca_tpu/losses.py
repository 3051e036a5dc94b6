"""Training objectives (reference: tf2.5/scripts/model/losses.py).

  * Focal                      — losses.py:20-49 (per-class alpha, gamma;
                                  gamma=0 reduces to CE, train_model.py:91)
  * EvidenceLowerBound         — losses.py:52-63 (beta * KL; KL computed in
                                  the model, passed through)
  * SoftDicePlusBoundarySurface— losses.py:66-128 (soft Dice over classes 1..
                                  + Kervadec boundary loss via an Euclidean
                                  distance transform of the ground truth)

All losses are pure jnp, fp32, and accept the deep-supervision channel-group
layout: when y_pred carries G*num_classes channels the loss is averaged over
the G groups (reference wrapper: losses.py:43-49, 122-128).

The boundary loss needs an EDT, which is not XLA-expressible; it is computed
host-side via ``jax.pure_callback`` (ops.edt) or supplied precomputed by the
data pipeline (preferred in production: the EDT of the static label is
data, not model compute).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # tf.keras.backend.epsilon()


def _group_reduce(loss_fn, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Average a per-prediction loss over deep-supervision channel groups."""
    nc = y_true.shape[-1]
    groups = y_pred.shape[-1] // nc
    vals = [loss_fn(y_true, y_pred[..., i * nc : (i + 1) * nc]) for i in range(groups)]
    return jnp.mean(jnp.stack(vals))


class Focal:
    """Focal loss (reference losses.py:20-49)."""

    def __init__(self, alpha: Sequence[float] = (0.25, 0.75), gamma: float = 2.0):
        self.alpha = tuple(alpha)
        self.gamma = float(gamma)

    def per_sample_sums(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        """Per-sample focal sums, shape (B,) — the pre-batch-mean partial.

        Used directly by the spatially-sharded train step
        (parallel/halo.py::make_spatial_train_step): each shard sums its
        core voxels, shards psum, THEN the batch mean is taken — the same
        reduction set as the unsharded loss."""
        w = jnp.asarray(self.alpha, jnp.float32)
        y_pred = y_pred.astype(jnp.float32)
        y_true = y_true.astype(jnp.float32)
        y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
        y_pred = jnp.clip(y_pred, EPSILON, 1.0 - EPSILON)
        ce = y_true * (-jnp.log(y_pred))
        gamma_weight = y_true * jnp.power(1.0 - y_pred, self.gamma)
        fl = w * gamma_weight * ce
        return jnp.sum(fl, axis=tuple(range(1, fl.ndim)))

    def fl(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        """Sum over voxels+classes, mean over batch (losses.py:32-39)."""
        return jnp.mean(self.per_sample_sums(y_true, y_pred))

    def __call__(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        return _group_reduce(self.fl, y_true, y_pred)

    loss = __call__


class EvidenceLowerBound:
    """beta * sum(KL) pass-through (reference losses.py:52-63)."""

    def __init__(self, beta: float = 1.0):
        self.beta = float(beta)

    def __call__(self, y_true, y_pred) -> jax.Array:
        del y_true  # reference ignores the target (losses.py:62-63)
        return self.beta * jnp.sum(y_pred)

    loss = __call__


class SoftDicePlusBoundarySurface:
    """Soft Dice + boundary/surface loss (reference losses.py:66-128).

    ``dist_map`` (the signed EDT of y_true[...,1:], shape == y_true[...,1:])
    may be passed precomputed; otherwise it is derived on host via
    ``ops.edt.signed_distance_map`` through ``jax.pure_callback`` — matching
    the reference's ``tf.py_function`` escape hatch (losses.py:112).
    """

    def __init__(self, loss_weights: Sequence[float] = (1.0, 1.5), smooth: float = EPSILON):
        self.loss_weights = tuple(loss_weights)
        self.smooth = float(smooth)

    @staticmethod
    def _norm_pred(y_pred: jax.Array) -> jax.Array:
        y_pred = y_pred.astype(jnp.float32)
        y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
        return jnp.clip(y_pred, EPSILON, 1.0 - EPSILON)

    def dice_loss(self, y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        """Global (flattened) soft Dice over classes 1.. (losses.py:99-106)."""
        y_pred = self._norm_pred(y_pred)
        yt = y_true[..., 1:].astype(jnp.float32).reshape(-1)
        yp = y_pred[..., 1:].reshape(-1)
        intersect = jnp.sum(yt * yp)
        denom = jnp.sum(yt + yp)
        return 1.0 - (2.0 * intersect / (denom + self.smooth))

    def boundary_surface_loss(
        self, y_true: jax.Array, y_pred: jax.Array,
        dist_map: Optional[jax.Array] = None,
    ) -> jax.Array:
        """sum(softmax[...,1:] * signed_EDT(y_true[...,1:])) (losses.py:109-113)."""
        y_pred = self._norm_pred(y_pred)
        if dist_map is None:
            from .ops.edt import signed_distance_map_callback

            dist_map = signed_distance_map_callback(y_true[..., 1:])
        return jnp.sum(y_pred[..., 1:] * dist_map.astype(jnp.float32))

    def db(self, y_true, y_pred, dist_map=None) -> jax.Array:
        return self.loss_weights[0] * self.dice_loss(y_true, y_pred) + \
            self.loss_weights[1] * self.boundary_surface_loss(y_true, y_pred, dist_map)

    def __call__(self, y_true, y_pred, dist_map=None) -> jax.Array:
        return _group_reduce(partial(self.db, dist_map=dist_map), y_true, y_pred)

    loss = __call__
