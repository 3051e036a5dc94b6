"""Shape/semantics goldens for core blocks vs the reference schematic
(reference: network_blocks.py; expected topology networks.py:411-416)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.models.blocks import (
    GridAttentionBlock3D,
    MonteCarloDropout,
    SEResNetBottleNeck,
    StitchingProbDecoder,
)
from prostatemr_3d_cad_cspca_tpu.ops import (
    InstanceNorm,
    upsample_nearest,
)
from prostatemr_3d_cad_cspca_tpu.ops.distributions import (
    DiagGaussian,
    kl_diag_gaussians,
)


def test_instance_norm_stats():
    x = jnp.asarray(np.random.default_rng(0).normal(3.0, 2.0, (2, 4, 8, 8, 3)), jnp.float32)
    y, _ = InstanceNorm().init_with_output(jax.random.PRNGKey(0), x)
    m = jnp.mean(y, axis=(1, 2, 3))
    s = jnp.std(y, axis=(1, 2, 3))
    np.testing.assert_allclose(m, 0.0, atol=1e-5)
    # epsilon=1e-3 biases std slightly below 1
    np.testing.assert_allclose(s, 1.0, atol=2e-3)


def test_se_resnet_bottleneck_shapes_and_multiply_combine():
    blk = SEResNetBottleNeck(filters=32, kernel_size=(1, 3, 3), strides=(1, 2, 2), reduction=8)
    x = jnp.ones((1, 4, 16, 16, 16))
    y, variables = blk.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 4, 8, 8, 32)
    # projection shortcut params exist (channels changed)
    assert "conv4" in variables["params"]
    # SE convs are unregularized TF-default convs
    assert "se_conv6" in variables["params"] and "se_conv7" in variables["params"]


def test_se_resnet_no_projection_when_channels_match():
    blk = SEResNetBottleNeck(filters=16, kernel_size=(3, 3, 3), strides=(1, 1, 1), reduction=8)
    x = jnp.ones((1, 4, 8, 8, 16))
    y, variables = blk.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert "conv4" not in variables["params"]


def test_grid_attention_shapes():
    att = GridAttentionBlock3D(inter_channels=8, sub_samp=(1, 1, 1))
    x = jnp.ones((1, 4, 16, 16, 8))
    g = jnp.ones((1, 2, 4, 4, 64))
    (w_y, att_map), _ = att.init_with_output(jax.random.PRNGKey(0), x, g)
    assert w_y.shape == (1, 4, 16, 16, 8)
    assert att_map.shape == (1, 4, 16, 16, 1)
    assert jnp.all(att_map >= 0) and jnp.all(att_map <= 1)


def test_upsample_nearest_matches_repeat():
    x = jnp.arange(2 * 2 * 3 * 1, dtype=jnp.float32).reshape(1, 2, 2, 3, 1)
    y = upsample_nearest(x, (2, 2, 1))
    assert y.shape == (1, 4, 4, 3, 1)
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, :, 0]), np.asarray(y[0, 1, 1, :, 0]))


def test_mc_dropout_active_at_eval():
    drop = MonteCarloDropout(rate=0.5)
    x = jnp.ones((1, 2, 8, 8, 4))
    y = drop.apply({}, x, train=False, rngs={"dropout": jax.random.PRNGKey(0)})
    # Active dropout at eval: zeros present, survivors scaled by 1/(1-rate).
    arr = np.asarray(y)
    assert (arr == 0).any() and np.isclose(arr.max(), 2.0)


def test_diag_gaussian_kl_closed_form():
    # KL(N(mu,s^2) || N(0,1)) per-dim closed form sanity
    mu = jnp.asarray([[0.5, -0.25]])
    logsig = jnp.asarray([[0.05, -0.05]])
    q = DiagGaussian.from_mu_logsigma(mu, logsig)
    p = DiagGaussian(loc=jnp.zeros_like(mu), scale=jnp.ones_like(mu))
    kl = kl_diag_gaussians(q, p)
    expect = 0.0
    for m, ls in [(0.5, 0.05), (-0.25, -0.05)]:
        s = np.exp(np.clip(ls, -0.1, 0.1))
        expect += np.log(1.0 / s) + (s**2 + m**2) / 2.0 - 0.5
    np.testing.assert_allclose(np.asarray(kl)[0], expect, rtol=1e-4)


def test_kl_zero_for_identical():
    mu = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 4, 4, 3)), jnp.float32)
    q = DiagGaussian.from_mu_logsigma(mu, mu * 0.01)
    kl = kl_diag_gaussians(q, q)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)
    assert kl.shape == (2, 3, 4, 4)


def test_logsigma_clip():
    mu = jnp.zeros((1, 2))
    big = jnp.full((1, 2), 10.0)
    q = DiagGaussian.from_mu_logsigma(mu, big)
    np.testing.assert_allclose(np.asarray(q.scale), np.exp(0.1), rtol=1e-6)


def test_stitching_prob_decoder():
    dec = StitchingProbDecoder(num_classes=2)
    x = jnp.ones((1, 4, 8, 8, 24))
    y, _ = dec.init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (1, 4, 8, 8, 2)


def test_instance_norm_bf16_fast_path_matches_fp32():
    """The bf16 one-pass statistics path must match the fp32 two-pass
    formula within bf16 resolution (ops/normalization.py fast path)."""
    x = np.random.default_rng(5).normal(0.3, 1.7, (2, 4, 16, 16, 8)).astype(np.float32)
    scale = np.random.default_rng(6).normal(1.0, 0.2, (8,)).astype(np.float32)
    bias = np.random.default_rng(7).normal(0.0, 0.2, (8,)).astype(np.float32)
    from prostatemr_3d_cad_cspca_tpu.ops.normalization import instance_norm

    ref = instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    fast = instance_norm(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(scale), jnp.asarray(bias))
    assert fast.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(fast, np.float32), np.asarray(ref), atol=0.15, rtol=0.05)
    # channel-wise statistics still normalized
    m = np.asarray(fast, np.float32).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(m, np.tile(bias, (m.shape[0], 1)), atol=0.05)


def test_packed_stats_exact():
    """Lane-packed IN statistics (ops/normalization.py:_packed_spatial_stats,
    round 5) reduce the SAME addends in a different association order — must
    match the naive bf16 fast path to fp32 round-off, and fall back to naive
    on non-divisible shapes."""
    from prostatemr_3d_cad_cspca_tpu.ops import normalization
    from prostatemr_3d_cad_cspca_tpu.ops.normalization import instance_norm

    rng = np.random.default_rng(11)
    for shape in [(2, 4, 16, 16, 4), (2, 4, 16, 16, 8), (2, 2, 8, 8, 64),
                  (2, 2, 8, 8, 128)]:
        x = jnp.asarray(rng.normal(0.2, 1.3, shape), jnp.bfloat16)
        scale = jnp.asarray(rng.normal(1.0, 0.2, shape[-1:]), jnp.float32)
        bias = jnp.asarray(rng.normal(0.0, 0.2, shape[-1:]), jnp.float32)
        ref = instance_norm(x, scale, bias)
        for mode in ("packed", "staged"):
            normalization.set_stats_mode(mode)
            try:
                alt = instance_norm(x, scale, bias)
                st = normalization._packed_spatial_stats(x)
            finally:
                normalization.set_stats_mode("naive")
            if shape[-1] < 128:
                assert st is not None, shape
            else:
                assert st is None  # C=128 fills the lanes already: fallback
            np.testing.assert_allclose(
                np.asarray(alt, np.float32), np.asarray(ref, np.float32),
                atol=0.02, rtol=0.02, err_msg=f"{mode} {shape}")
    # odd spatial extent that doesn't divide q: must fall back, not crash
    x = jnp.asarray(rng.normal(size=(1, 3, 5, 7, 4)), jnp.bfloat16)
    normalization.set_stats_mode("packed")
    try:
        assert normalization._packed_spatial_stats(x) is None
        y = instance_norm(x, jnp.ones((4,)), jnp.zeros((4,)))
        assert y.shape == x.shape
    finally:
        normalization.set_stats_mode("naive")


def test_split_stitch_matches_concat():
    """Decoder-stitch part lists produce the same params and outputs as the
    materialized channel concat (ops.convolution.SplitInputConv identity:
    conv(concat(a,b), W) == conv(a, W[...,:ca,:]) + conv(b, W[..,ca:,:]))."""
    import dataclasses

    from prostatemr_3d_cad_cspca_tpu.ops.convolution import ConvConfig

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 5)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 3)), jnp.float32)

    split_blk = SEResNetBottleNeck(
        filters=8, kernel_size=(1, 3, 3), strides=(1, 1, 1), reduction=4,
        conv_cfg=ConvConfig(split_stitch=True))
    cat_blk = SEResNetBottleNeck(
        filters=8, kernel_size=(1, 3, 3), strides=(1, 1, 1), reduction=4,
        conv_cfg=ConvConfig(split_stitch=False))

    vs = split_blk.init(jax.random.PRNGKey(1), (a, b))
    vc = cat_blk.init(jax.random.PRNGKey(1), (a, b))
    # identical param tree (names, shapes, and init draws)
    fs = jax.tree_util.tree_flatten_with_path(vs)[0]
    fc = jax.tree_util.tree_flatten_with_path(vc)[0]
    assert [p for p, _ in fs] == [p for p, _ in fc]
    for (_, ls), (_, lc) in zip(fs, fc):
        np.testing.assert_array_equal(np.asarray(ls), np.asarray(lc))

    ys = split_blk.apply(vs, (a, b))
    yc = cat_blk.apply(vs, (a, b))
    yc2 = cat_blk.apply(vs, jnp.concatenate([a, b], axis=-1))
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yc2), atol=0)
