"""Packed-width ("W-pack") tensor representation for small-channel 3D convs.

TPU vector lanes are 128 wide; M1's full-resolution stages carry 2-32
channels (reference networks.py:472-487 with filters (16,32,...)), so every
elementwise op, instance-norm pass and conv at those stages runs mostly-idle
lanes — measured at 4-7x below the HBM roofline on v5e/v6e (see
benchmarks/r2_probe_layout.py / r2_probe_conv.py and docs/ROUND2_NOTES.md).

The fix implemented here re-expresses those stages on a PACKED tensor: fold
``p`` adjacent W positions into the channel axis so that ``p*C`` fills the
128 lanes:

    (B, D, H, W, C)  ->  (B, D, H, W/p, p*C)        [a pure row-major
                                                      reshape: zero cost]

Elementwise ops are unchanged (lane = (w%p, c)); instance-norm statistics
fold the p slots after a full-lane reduction; and any original conv —
strided, 1x1 (pack-changing) or transposed — becomes a REGULAR packed conv
with block-structured 128-wide weights built by index algebra
(``pack_conv_weights``). The packed conv does p-times more MACs, but those
MACs ride otherwise-idle MXU columns; the model goes from lane-bound to
HBM/MXU-bound.

Semantics are EXACT (same taps, same zero padding — the packed SAME padding
reads the identical zero-extension the original conv read), so the packed
path shares the parameter pytree with the reference-parity path and is
golden-tested against it (tests/test_packing.py).

Index algebra (single axis): with the original conv written in the canonical
lhs-dilated form

    y[o] = sum_delta  w[delta] * x_dil[o*s + delta - pad_lo]

(x_dil = x dilated by ``l``: regular conv has l=1; a transposed conv is
l=stride with the flipped kernel — exactly jax.lax.conv_transpose's
lowering), substitute o = p_out*u + s_o and i = p_in*v + s_i:

    j = s*(p_out*u + s_o) + delta - pad_lo     (tap exists iff l | j)
    i = j/l = (s*p_out/l)*u + c,   c = (s*s_o + delta - pad_lo)/l
    v = sp*u + r,  (r, s_i) = divmod(c, p_in),  sp = s*p_out/(l*p_in)

which is a regular conv over packed positions with stride ``sp`` whenever
``l*p_in`` divides ``s*p_out`` (the builder asserts this; callers pick p_out
accordingly — pack changes between layers are free reshapes).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Tuple3 = Tuple[int, int, int]


def pack_width(x: jax.Array, p: int) -> jax.Array:
    """(B, D, H, W, C) -> (B, D, H, W//p, p*C). Pure reshape (row-major)."""
    if p == 1:
        return x
    b, d, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(b, d, h, w // p, p * c)


def unpack_width(x: jax.Array, p: int, channels: int) -> jax.Array:
    """Inverse of pack_width. Pure reshape."""
    if p == 1:
        return x
    b, d, h, wp, pc = x.shape
    assert pc == p * channels, (pc, p, channels)
    return x.reshape(b, d, h, wp * p, channels)


def repack(x: jax.Array, p_from: int, p_to: int, channels: int) -> jax.Array:
    """Change the pack factor. Pure reshape (both flatten to w*C + c)."""
    if p_from == p_to:
        return x
    return pack_width(unpack_width(x, p_from, channels), p_to)


def pick_pack(channels: int, width: int, lanes: int = 128) -> int:
    """Largest p with p*channels <= lanes, p | width (>=1)."""
    p = max(1, lanes // channels)
    while p > 1 and width % p != 0:
        p -= 1
    return p


def _axis_taps(kw: int, s: int, l: int, pad_lo: int, p_in: int, p_out: int):
    """Enumerate packed-axis taps: yields (r, s_i, s_o, delta) per the module
    docstring algebra, plus (sp, r_min, r_max)."""
    assert (s * p_out) % (l * p_in) == 0, (
        f"pack mismatch: l*p_in={l * p_in} must divide s*p_out={s * p_out}")
    sp = (s * p_out) // (l * p_in)
    taps = []
    for s_o in range(p_out):
        for delta in range(kw):
            c_num = s * s_o + delta - pad_lo
            if c_num % l != 0:
                continue
            r, s_i = divmod(c_num // l, p_in)
            taps.append((r, s_i, s_o, delta))
    assert taps, "conv has no surviving taps (bad geometry)"
    r_min = min(t[0] for t in taps)
    r_max = max(t[0] for t in taps)
    return taps, sp, r_min, r_max


def pack_conv_weights(
    w: jax.Array,
    p_in: int,
    p_out: int,
    stride_w: int = 1,
    lhs_dil_w: int = 1,
    pad_lo_w: int = 0,
) -> Tuple[jax.Array, int, int]:
    """Build packed-W conv weights from original (kd, kh, kw, ci, co).

    Returns (wp, sp, r_min): wp has shape (kd, kh, kwp, p_in*ci, p_out*co)
    with kwp = r_max - r_min + 1; the packed conv runs with window stride
    ``sp`` on the packed axis and explicit padding derived from r_min (see
    ``packed_axis_padding``). The original kernel must already be in the
    canonical lhs-dilated orientation (i.e. for transposed convs, pass the
    spatially-flipped, in/out-swapped kernel — what conv_transpose lowers to).
    """
    kd, kh, kw, ci, co = w.shape
    taps, sp, r_min, r_max = _axis_taps(kw, stride_w, lhs_dil_w, pad_lo_w,
                                        p_in, p_out)
    kwp = r_max - r_min + 1
    wp = jnp.zeros((kd, kh, kwp, p_in * ci, p_out * co), w.dtype)
    for r, s_i, s_o, delta in taps:
        wp = wp.at[
            :, :, r - r_min,
            s_i * ci : (s_i + 1) * ci,
            s_o * co : (s_o + 1) * co,
        ].set(w[:, :, delta])
    return wp, sp, r_min


def packed_axis_padding(
    wp_in: int, wp_out: int, kwp: int, sp: int, r_min: int
) -> Tuple[int, int]:
    """Explicit (lo, hi) padding for the packed axis: output u reads packed
    positions [sp*u + r_min, sp*u + r_min + kwp)."""
    lo = -r_min
    hi = sp * (wp_out - 1) + kwp - lo - wp_in
    assert lo >= 0 and hi >= 0, (lo, hi)
    return lo, hi


def _same_pad(kernel: int, stride: int, size: int) -> Tuple[int, int]:
    """TF/XLA 'SAME' padding for a regular conv axis."""
    out = -(-size // stride)
    total = max(0, (out - 1) * stride + kernel - size)
    return total // 2, total - total // 2


def _transpose_pad(kernel: int, stride: int) -> Tuple[int, int]:
    """jax.lax.conv_transpose 'SAME' padding (its _conv_transpose_padding)."""
    pad_len = kernel + stride - 2
    pad_a = kernel - 1 if stride > kernel - 1 else int(np.ceil(pad_len / 2))
    return pad_a, pad_len - pad_a


class PackedConvSpec:
    """Precomputed geometry for one packed conv (built once per layer)."""

    def __init__(
        self,
        kernel: Tuple3,
        strides: Tuple3,
        in_shape: Tuple3,         # original (D, H, W)
        ci: int,
        co: int,
        p_in: int,
        transposed: bool = False,
        p_out: Optional[int] = None,
        lanes: int = 128,
    ):
        kd, kh, kw = kernel
        sd, sh, sw = strides
        d, h, w = in_shape
        self.transposed = transposed
        self.ci, self.co, self.p_in = ci, co, p_in
        if transposed:
            out_w = w * sw
            l_w, s_w = sw, 1
            pad_w = _transpose_pad(kw, sw)
            self.out_spatial = (d * sd, h * sh, out_w)
            # D/H axes: lhs-dilated with conv_transpose SAME padding
            self.lhs_dilation = (sd, sh, 1)
            self.pad_d = _transpose_pad(kd, sd)
            self.pad_h = _transpose_pad(kh, sh)
        else:
            out_w = -(-w // sw)
            l_w, s_w = 1, sw
            pad_w = _same_pad(kw, sw, w)
            self.out_spatial = (-(-d // sd), -(-h // sh), out_w)
            self.lhs_dilation = (1, 1, 1)
            self.pad_d = _same_pad(kd, sd, d)
            self.pad_h = _same_pad(kh, sh, h)
            self.strides_dh = (sd, sh)
        # choose p_out: smallest multiple of l*p_in/gcd(s, l*p_in) that
        # divides out_w, preferring p_out*co >= lanes
        if p_out is None:
            base = (l_w * p_in) // math.gcd(s_w, l_w * p_in)
            cands = [m for m in range(base, out_w + 1, base) if out_w % m == 0]
            assert cands, (out_w, base)
            full = [m for m in cands if m * co >= lanes]
            p_out = min(full) if full else max(cands)
        self.p_out = p_out
        self.wp_in = w // p_in
        self.wp_out = out_w // p_out
        self._w_geom = (kw, s_w, l_w, pad_w[0])
        taps, sp, r_min, r_max = _axis_taps(kw, s_w, l_w, pad_w[0], p_in, p_out)
        self.sp = sp
        self.r_min = r_min
        kwp = r_max - r_min + 1
        self.pad_w_packed = packed_axis_padding(
            self.wp_in, self.wp_out, kwp, sp, r_min)

    def pack_weights(self, w: jax.Array) -> jax.Array:
        """w: original (kd, kh, kw, ci, co); flax ConvTranspose
        (transpose_kernel=True) stores (kd, kh, kw, co, ci) — pass the raw
        param and this handles the flip/swap for transposed convs."""
        if self.transposed:
            # conv_transpose lowering: flip spatial dims, swap in/out
            w = jnp.flip(w, axis=(0, 1, 2))
            w = jnp.swapaxes(w, -1, -2)  # (k..., co, ci) -> (k..., ci, co)
        kw = w.shape[2]
        _, s_w, l_w, pad_lo = self._w_geom
        wp, sp, r_min = pack_conv_weights(
            w, self.p_in, self.p_out, stride_w=s_w, lhs_dil_w=l_w,
            pad_lo_w=pad_lo)
        assert sp == self.sp and r_min == self.r_min
        return wp

    def __call__(self, x_packed: jax.Array, wp: jax.Array,
                 bias: Optional[jax.Array] = None) -> jax.Array:
        """Apply the packed conv. x_packed: (B, D, H, W/p_in, p_in*ci)."""
        if self.transposed:
            strides = (1, 1, self.sp)
        else:
            strides = (*self.strides_dh, self.sp)
        y = jax.lax.conv_general_dilated(
            x_packed, wp,
            window_strides=strides,
            padding=(self.pad_d, self.pad_h, self.pad_w_packed),
            lhs_dilation=self.lhs_dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x_packed.dtype,
        )
        if bias is not None:
            # per original channel -> tile over the p_out slots
            y = y + jnp.tile(bias.astype(y.dtype), self.p_out)
        return y


def packed_instance_norm(
    x_packed: jax.Array, scale: jax.Array, bias: jax.Array,
    p: int, channels: int, *, epsilon: float = 1e-3,
    negative_slope: Optional[float] = None,
) -> jax.Array:
    """Instance norm on a packed tensor: full-lane reductions, slot-folded
    per-channel stats, affine (optionally fused LeakyReLU) on full lanes.

    Follows ops.normalization.instance_norm's dtype policy: centered
    two-pass variance at fp32 (reference-exact), one-pass E[x^2]-E[x]^2 with
    fp32 accumulation under bf16 compute (where a second full read costs
    more than it buys)."""
    red = (1, 2, 3)
    n = x_packed.shape[1] * x_packed.shape[2] * x_packed.shape[3] * p
    b = x_packed.shape[0]

    def fold(t):  # (B, p*C) -> (B, C)
        return jnp.sum(t.reshape(b, p, channels), axis=1)

    s = fold(jnp.sum(x_packed, axis=red, dtype=jnp.float32))
    mean = s / n
    if x_packed.dtype == jnp.float32:
        mu_l = jnp.tile(mean, (1, p))[:, None, None, None, :]
        var = fold(jnp.sum(jnp.square(x_packed - mu_l), axis=red)) / n
    else:
        q = fold(jnp.sum(jnp.square(x_packed.astype(jnp.float32)), axis=red))
        var = jnp.maximum(q / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)
    a = inv * scale.astype(jnp.float32)
    c = bias.astype(jnp.float32) - mean * a
    a = jnp.tile(a, (1, p))[:, None, None, None, :].astype(x_packed.dtype)
    c = jnp.tile(c, (1, p))[:, None, None, None, :].astype(x_packed.dtype)
    y = x_packed * a + c
    if negative_slope is not None:
        y = jnp.where(y >= 0, y, jnp.asarray(negative_slope, y.dtype) * y)
    return y


def packed_spatial_mean(x_packed: jax.Array, p: int, channels: int) -> jax.Array:
    """Global average pool per original channel: (B, 1, 1, 1, C), fp32
    accumulated (matches ops.normalization.global_spatial_mean)."""
    s = jnp.sum(x_packed, axis=(1, 2, 3), dtype=jnp.float32)
    b = x_packed.shape[0]
    s = jnp.sum(s.reshape(b, p, channels), axis=1)
    n = x_packed.shape[1] * x_packed.shape[2] * x_packed.shape[3] * p
    return (s / n)[:, None, None, None, :]


def broadcast_channel_gate(
    gate: jax.Array, p: int
) -> jax.Array:
    """Tile a per-(B,1,1,1,C) gate across the p pack slots -> (B,1,1,1,p*C)."""
    return jnp.tile(gate, (1, 1, 1, 1, p))


def broadcast_width_map(m: jax.Array, p: int, channels: int) -> jax.Array:
    """Expand a 1-channel per-voxel map packed at (W/p, p) into (W/p, p*C)
    lanes so it can gate a C-channel packed tensor elementwise.

    m: (B, D, H, W/p, p) [i.e. a packed 1-channel tensor]."""
    b, d, h, wp, p_ = m.shape
    assert p_ == p
    return jnp.broadcast_to(
        m[..., None], (b, d, h, wp, p, channels)
    ).reshape(b, d, h, wp, p * channels)


def upsample_width_packed(
    x_packed: jax.Array, p: int, channels: int, factor: int
) -> jax.Array:
    """Nearest-neighbor upsample of the ORIGINAL W axis by ``factor`` on a
    packed tensor; output re-packed at the same p. Pure
    reshape/broadcast (XLA fuses it into the consumer)."""
    if factor == 1:
        return x_packed
    b, d, h, wp, pc = x_packed.shape
    x = x_packed.reshape(b, d, h, wp, p, 1, channels)
    x = jnp.broadcast_to(x, (b, d, h, wp, p, factor, channels))
    # new pack factor p*factor over the upsampled axis, then repack to p
    x = x.reshape(b, d, h, wp, p * factor * channels)
    return repack(x, p * factor, p, channels)
