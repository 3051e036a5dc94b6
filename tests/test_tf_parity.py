"""Numerical parity vs TensorFlow for the primitives whose conventions the
reference depends on (SURVEY.md §7 hard parts): SAME padding for strided
conv / transposed conv, instance-norm statistics, leaky-relu/sigmoid gates.

These are the contracts that make TF-reference weights loadable into this
framework. TF runs on CPU; shapes are tiny.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from prostatemr_3d_cad_cspca_tpu.ops.normalization import InstanceNorm  # noqa: E402


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("stride,kernel", [
    ((1, 1, 1), (1, 3, 3)),
    ((1, 2, 2), (1, 3, 3)),
    ((2, 2, 2), (3, 3, 3)),
    ((1, 2, 2), (3, 3, 3)),
])
def test_conv3d_same_padding_matches_tf(stride, kernel):
    x = _rand((1, 4, 8, 8, 3))
    w = _rand((*kernel, 3, 5), seed=1)  # TF layout: (kd,kh,kw,in,out)
    b = _rand((5,), seed=2)

    tf_out = tf.nn.conv3d(
        tf.constant(x), tf.constant(w), strides=(1, *stride, 1), padding="SAME"
    ).numpy() + b

    conv = nn.Conv(5, kernel, stride, padding="SAME")
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    jax_out = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jax_out, tf_out, atol=2e-5)


@pytest.mark.parametrize("stride,kernel", [
    ((1, 2, 2), (1, 3, 3)),
    ((2, 2, 2), (3, 3, 3)),
    ((1, 2, 2), (3, 3, 3)),
])
def test_conv3d_transpose_same_matches_tf(stride, kernel):
    """flax ConvTranspose(transpose_kernel=True) == tf.keras Conv3DTranspose
    with kernel layout (kd,kh,kw,out,in). Output shape = input * stride."""
    x = _rand((1, 4, 8, 8, 3))
    w_tf = _rand((*kernel, 5, 3), seed=3)  # TF transpose layout: (k..., out, in)
    lay = tf.keras.layers.Conv3DTranspose(
        5, kernel, strides=stride, padding="same", use_bias=False)
    lay.build(x.shape)
    lay.kernel.assign(w_tf)
    tf_out = lay(tf.constant(x)).numpy()

    conv = nn.ConvTranspose(5, kernel, stride, padding="SAME", use_bias=False,
                            transpose_kernel=True)
    params = {"params": {"kernel": jnp.asarray(w_tf)}}
    jax_out = np.asarray(conv.apply(params, jnp.asarray(x)))
    assert jax_out.shape == tf_out.shape
    np.testing.assert_allclose(jax_out, tf_out, atol=2e-5)


def test_instance_norm_matches_keras_groupnorm():
    x = _rand((2, 4, 8, 8, 6), seed=4)
    gn = tf.keras.layers.GroupNormalization(groups=-1, epsilon=1e-3)
    gn.build(x.shape)
    tf_out = gn(tf.constant(x)).numpy()
    jax_out = np.asarray(
        InstanceNorm().apply(
            {"params": {"scale": jnp.ones((6,)), "bias": jnp.zeros((6,))}},
            jnp.asarray(x)))
    np.testing.assert_allclose(jax_out, tf_out, atol=2e-5)


def test_leaky_relu_alpha_01_matches_tf():
    x = _rand((64,), seed=5)
    tf_out = tf.nn.leaky_relu(tf.constant(x), alpha=0.1).numpy()
    jax_out = np.asarray(nn.leaky_relu(jnp.asarray(x), negative_slope=0.1))
    np.testing.assert_allclose(jax_out, tf_out, atol=1e-7)


@pytest.mark.slow
def test_full_m1_forward_parity():
    """End-to-end oracle (BASELINE.md config 1): identical weights through the
    reconstructed Keras M1 and the Flax M1 must give voxel-identical softmax
    outputs. This is the strongest structural-parity evidence available in
    this image (the original TF2.5 stack's deps are absent)."""
    import sys

    sys.path.insert(0, "/root/repo/benchmarks")
    from tf_cpu_baseline import build_m1_tf

    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import import_keras_m1_weights

    filters = (4, 8, 12, 16, 24)
    strides = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
    kernels = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
    se_red = (2, 2, 2, 2, 2)
    spatial = (4, 16, 16)

    tf_model = build_m1_tf(
        input_shape=(*spatial, 3), num_classes=2, filters=filters,
        strides=strides, kernels=kernels, se_reduction=se_red)
    model = M1(
        input_spatial_dims=spatial, input_channels=3, num_classes=2,
        filters=filters, strides=strides, kernel_sizes=kernels,
        se_reduction=se_red,
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False)

    params = import_keras_m1_weights(tf_model.layers, model.params)
    x = _rand((2, *spatial, 3), seed=9)
    tf_out = tf_model(tf.constant(x), training=False).numpy()
    jax_out = np.asarray(model.apply(params, jnp.asarray(x))["y_softmax"])
    np.testing.assert_allclose(jax_out, tf_out, atol=5e-4)


def test_resize_bilinear_matches_tf_image_resize():
    """augmentations' bilinear warps must match tf.image.resize semantics
    (half-pixel centers, antialias=False) — the reference's resample op
    (augmentations.py:143, 267)."""
    from prostatemr_3d_cad_cspca_tpu.ops.resample import (
        resize_bilinear_2d, resize_nearest_2d)

    img = _rand((17, 23, 3), seed=11)
    for out_hw in [(25, 31), (9, 12), (17, 23)]:
        tf_out = tf.image.resize(
            tf.constant(img), out_hw, method="bilinear", antialias=False).numpy()
        jax_out = np.asarray(resize_bilinear_2d(jnp.asarray(img), *out_hw))
        np.testing.assert_allclose(jax_out, tf_out, atol=2e-5)

        tf_nn = tf.image.resize(
            tf.constant(img), out_hw, method="nearest").numpy()
        jax_nn = np.asarray(resize_nearest_2d(jnp.asarray(img), *out_hw))
        np.testing.assert_allclose(jax_nn, tf_nn, atol=0)


def test_symmetric_pad_shift_matches_tf():
    """_translate == tf.pad(SYMMETRIC) + crop (augmentations.py:167-181)."""
    from prostatemr_3d_cad_cspca_tpu.augment import _translate

    vol = _rand((2, 8, 8, 1), seed=12)  # (D,H,W,C)
    pt, pb, pr, pl = 3, 1, 2, 4
    # reference: pad (top,left), then crop offset (bottom,right)
    tf_p = tf.pad(tf.constant(vol), [[0, 0], [pt, pb], [pl, pr], [0, 0]],
                  mode="SYMMETRIC").numpy()
    tf_out = tf_p[:, pb:pb + 8, pr:pr + 8, :]
    jax_out = np.asarray(_translate(jnp.asarray(vol), pb - pt, pr - pl))
    np.testing.assert_allclose(jax_out, tf_out, atol=0)
