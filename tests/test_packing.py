"""Packed-width conv/norm equivalence tests (ops/packing.py).

Every geometry the M1 backbone uses at its small-channel stages is checked
EXACTLY (same taps + same zero padding) against the reference-parity flax
conv the model normally runs: pack -> packed conv -> unpack == nn.Conv /
nn.ConvTranspose. fp32, atol 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from prostatemr_3d_cad_cspca_tpu.ops.packing import (
    PackedConvSpec,
    broadcast_channel_gate,
    broadcast_width_map,
    pack_width,
    packed_instance_norm,
    packed_spatial_mean,
    pick_pack,
    repack,
    unpack_width,
    upsample_width_packed,
)

B, D, H, W = 2, 4, 8, 32


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def _flax_conv(x, w, b, strides):
    conv = nn.Conv(w.shape[-1], w.shape[:3], strides, padding="SAME")
    return conv.apply({"params": {"kernel": w, "bias": b}}, x)


def _flax_convt(x, w, b, strides):
    # transpose_kernel=True: kernel layout (k..., out, in), TF parity
    conv = nn.ConvTranspose(w.shape[-2], w.shape[:3], strides,
                            transpose_kernel=True, padding="SAME")
    return conv.apply({"params": {"kernel": w, "bias": b}}, x)


@pytest.mark.parametrize("kernel,strides,ci,co", [
    ((1, 3, 3), (1, 1, 1), 16, 16),   # stem-like / sersd0.conv1
    ((1, 3, 3), (1, 1, 1), 3, 16),    # actual stem (3 input channels)
    ((1, 3, 3), (1, 2, 2), 16, 8),    # serse1.conv1 (f/4, strided)
    ((3, 3, 3), (1, 1, 1), 8, 8),     # f/4 3x3x3 mid conv
    ((3, 3, 3), (2, 2, 2), 16, 8),    # serse3-like geometry
    ((1, 1, 1), (1, 1, 1), 4, 16),    # 1x1 pack-heavy expand (conv3)
    ((1, 3, 3), (1, 2, 2), 16, 32),   # shortcut conv4 (full filters)
])
def test_packed_conv_matches_flax(kernel, strides, ci, co):
    x = _rand((B, D, H, W, ci), seed=1)
    w = _rand((*kernel, ci, co), seed=2) * 0.2
    b = _rand((co,), seed=3) * 0.1
    ref = _flax_conv(x, w, b, strides)

    p_in = pick_pack(ci, W)
    spec = PackedConvSpec(kernel, strides, (D, H, W), ci, co, p_in)
    y = spec(pack_width(x, p_in), spec.pack_weights(w), b)
    got = unpack_width(y, spec.p_out, co)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("kernel,strides,ci,co", [
    ((1, 3, 3), (1, 2, 2), 32, 16),   # convtd0
    ((3, 3, 3), (1, 2, 2), 32, 16),   # convtd1-like
    ((1, 3, 3), (1, 2, 2), 8, 4),     # small-channel transposed
])
def test_packed_conv_transpose_matches_flax(kernel, strides, ci, co):
    x = _rand((B, D, H, W, ci), seed=4)
    w = _rand((*kernel, co, ci), seed=5) * 0.2   # transpose layout (k..., out, in)
    b = _rand((co,), seed=6) * 0.1
    ref = _flax_convt(x, w, b, strides)

    p_in = pick_pack(ci, W)
    spec = PackedConvSpec(kernel, strides, (D, H, W), ci, co, p_in,
                          transposed=True)
    y = spec(pack_width(x, p_in), spec.pack_weights(w), b)
    got = unpack_width(y, spec.p_out, co)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pack_unpack_repack_roundtrip():
    x = _rand((B, D, H, W, 4), seed=7)
    xp = pack_width(x, 8)
    assert xp.shape == (B, D, H, W // 8, 32)
    np.testing.assert_array_equal(np.asarray(unpack_width(xp, 8, 4)), np.asarray(x))
    xq = repack(xp, 8, 16, 4)
    assert xq.shape == (B, D, H, W // 16, 64)
    np.testing.assert_array_equal(np.asarray(unpack_width(xq, 16, 4)), np.asarray(x))


def test_packed_instance_norm_matches_unpacked():
    from prostatemr_3d_cad_cspca_tpu.ops.normalization import instance_norm

    c, p = 16, 8
    x = _rand((B, D, H, W, c), seed=8)
    scale = _rand((c,), seed=9)
    bias = _rand((c,), seed=10)
    ref = instance_norm(x, scale, bias, epsilon=1e-3)
    got = unpack_width(
        packed_instance_norm(pack_width(x, p), scale, bias, p, c), p, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # fused lrelu variant
    ref2 = jnp.where(ref >= 0, ref, 0.1 * ref)
    got2 = unpack_width(
        packed_instance_norm(pack_width(x, p), scale, bias, p, c,
                             negative_slope=0.1), p, c)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=1e-5)


def test_packed_spatial_mean_and_gates():
    c, p = 16, 8
    x = _rand((B, D, H, W, c), seed=11)
    ref = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    got = packed_spatial_mean(pack_width(x, p), p, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gate = _rand((B, 1, 1, 1, c), seed=12)
    gp = broadcast_channel_gate(gate, p)
    ref_g = x * gate
    got_g = unpack_width(pack_width(x, p) * gp, p, c)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=1e-5)

    # per-voxel 1-channel map gating a c-channel tensor
    m = _rand((B, D, H, W, 1), seed=13)
    mp = pack_width(m, p)  # (B,D,H,W/p,p)
    ref_m = x * m
    got_m = unpack_width(
        pack_width(x, p) * broadcast_width_map(mp, p, c), p, c)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), atol=1e-5)


def test_upsample_width_packed():
    from prostatemr_3d_cad_cspca_tpu.ops.resample import upsample_nearest

    c, p, f = 8, 4, 2
    x = _rand((B, D, H, W // f, c), seed=14)
    ref = upsample_nearest(x, (1, 1, f))
    got = unpack_width(
        upsample_width_packed(pack_width(x, p), p, c, f), p, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
