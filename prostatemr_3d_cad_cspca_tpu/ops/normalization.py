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

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def instance_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    epsilon: float = 1e-3,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Functional instance norm over all dims except batch (0) and channel (-1)."""
    reduce_axes = tuple(range(1, x.ndim - 1))
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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        return instance_norm(
            x, scale, bias, epsilon=self.epsilon, axis_name=self.axis_name
        )
