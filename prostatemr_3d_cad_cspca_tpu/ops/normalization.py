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
    if axis_name is None and x.dtype != jnp.float32:
        # bf16 fast path: fp32-ACCUMULATED reductions without materializing an
        # fp32 copy (profiling showed the convert+reduce passes of the naive
        # formulation cost ~40% of M1's forward device time). One-pass
        # E[x^2]-E[x]^2 is safe here: post-conv activations are near zero-mean
        # and the accumulator is fp32. The fp32 input path keeps the centered
        # two-pass formula for exact reference parity.
        mean = jnp.mean(x, axis=reduce_axes, keepdims=True, dtype=jnp.float32)
        ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=reduce_axes,
                       keepdims=True)
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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,), self.param_dtype)
        return instance_norm(
            x, scale, bias, epsilon=self.epsilon, axis_name=self.axis_name
        )
