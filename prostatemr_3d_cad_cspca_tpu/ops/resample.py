"""Resampling primitives: nearest upsampling and gather-based bilinear sampling.

These back two reference behaviors:

  * ``tf.keras.layers.UpSampling3D`` (nearest, integer factors) used by the
    attention gates and deep supervision (reference: network_blocks.py:116,123,
    networks.py:739-747) -> ``upsample_nearest``.
  * ``tf.image.resize`` / ``tfa.image.rotate`` style warps inside the
    train-time augmentations (reference: model/augmentations.py) ->
    ``resize_bilinear_2d`` / ``sample_bilinear_2d``.

Everything is static-shape: dynamic zoom/rotation factors are expressed as
*traced coordinates* into a fixed-size gather, never as dynamic output shapes
— the XLA-friendly formulation of the reference's dynamic-resize-then-crop
pipelines.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def upsample_nearest(x: jax.Array, factors: Sequence[int]) -> jax.Array:
    """Integer-factor nearest-neighbor upsampling over the spatial dims.

    ``x`` is (B, *spatial, C); ``factors`` has one integer per spatial dim.
    Equivalent to tf.keras.layers.UpSampling3D(size=factors).
    """
    spatial_ndim = x.ndim - 2
    assert len(factors) == spatial_ndim, (factors, x.shape)
    for i, f in enumerate(factors):
        if f != 1:
            x = jnp.repeat(x, f, axis=1 + i)
    return x


def _gather_hw(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img: (H, W, C); iy/ix: integer index arrays of shape (h, w) -> (h, w, C)."""
    return img[iy, ix]


def _reflect_index(idx: jax.Array, size: int) -> jax.Array:
    """SYMMETRIC (half-sample) boundary reflection of integer indices.

    Matches tf.pad(mode='SYMMETRIC'): ...2 1 0 | 0 1 2 ... n-1 | n-1 n-2...
    Valid for any offset magnitude via period-2n folding.
    """
    period = 2 * size
    idx = jnp.mod(idx, period)
    return jnp.where(idx >= size, period - 1 - idx, idx)


def sample_bilinear_2d(
    img: jax.Array,
    coords_y: jax.Array,
    coords_x: jax.Array,
    *,
    boundary: str = "symmetric",
) -> jax.Array:
    """Bilinearly sample (H, W, C) image at float coords (h_out, w_out).

    boundary: 'symmetric' reflects out-of-range samples (emulating the
    reference's SYMMETRIC pre-pad + crop), 'edge' clamps, 'zero' fills 0.
    """
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    wy = (coords_y - y0).astype(img.dtype)[..., None]
    wx = (coords_x - x0).astype(img.dtype)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = y0i + 1
    x1i = x0i + 1

    if boundary == "symmetric":
        y0c, y1c = _reflect_index(y0i, H), _reflect_index(y1i, H)
        x0c, x1c = _reflect_index(x0i, W), _reflect_index(x1i, W)
    else:  # edge-clamp (zero handled by masking below)
        y0c, y1c = jnp.clip(y0i, 0, H - 1), jnp.clip(y1i, 0, H - 1)
        x0c, x1c = jnp.clip(x0i, 0, W - 1), jnp.clip(x1i, 0, W - 1)

    v00 = _gather_hw(img, y0c, x0c)
    v01 = _gather_hw(img, y0c, x1c)
    v10 = _gather_hw(img, y1c, x0c)
    v11 = _gather_hw(img, y1c, x1c)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy

    if boundary == "zero":
        inside = (
            (coords_y >= 0) & (coords_y <= H - 1) & (coords_x >= 0) & (coords_x <= W - 1)
        )
        out = jnp.where(inside[..., None], out, jnp.zeros_like(out))
    return out


def resize_bilinear_2d(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """tf.image.resize(..., method='bilinear', antialias=False) parity on (H,W,C).

    Uses half-pixel centers: in = (out + 0.5) * (in_size / out_size) - 0.5.
    """
    H, W = img.shape[0], img.shape[1]
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (H / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (W / out_w) - 0.5
    cy = jnp.clip(ys, 0.0, H - 1)[:, None] * jnp.ones((1, out_w), jnp.float32)
    cx = jnp.clip(xs, 0.0, W - 1)[None, :] * jnp.ones((out_h, 1), jnp.float32)
    return sample_bilinear_2d(img, cy, cx, boundary="edge")


def resize_nearest_2d(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """tf.image.resize(..., method='nearest') parity on (H,W,C)."""
    H, W = img.shape[0], img.shape[1]
    ys = jnp.floor((jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (H / out_h)).astype(
        jnp.int32
    )
    xs = jnp.floor((jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (W / out_w)).astype(
        jnp.int32
    )
    ys = jnp.clip(ys, 0, H - 1)
    xs = jnp.clip(xs, 0, W - 1)
    return img[ys][:, xs]
