"""Subpixel transposed-conv dispatch (ops.convolution.SubpixelConvTranspose).

The cfg1 trace's worst speed-of-light outliers are the decoder's
stride-(1,2,2) transposed convs, which XLA lowers through full-resolution
C=4 intermediates at 4x their HBM roofline (docs/ATTRIBUTION.md). The
subpixel form — a low-res conv producing prod(stride)*C_out channels + a
depth-to-space interleave — is mathematically the SAME operator; these
tests pin that it is a drop-in for nn.ConvTranspose(transpose_kernel=True,
SAME): identical param trees (names, shapes, initializer draws), equal
outputs, equal gradients, and correct factory routing off ConvConfig.
Reference op semantics: tf2.5/scripts/model/unets/networks.py:495-624
(Conv3DTranspose decoder upsamples).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from prostatemr_3d_cad_cspca_tpu.ops.convolution import (
    ConvConfig,
    SubpixelConvTranspose,
    conv3d_transpose,
)

CK = ConvConfig().conv_kwargs()


def _init_and_apply(mod, x, key=0):
    params = mod.init(jax.random.PRNGKey(key), x)
    return params, mod.apply(params, x)


@pytest.mark.parametrize("kern,stride", [
    ((1, 3, 3), (1, 2, 2)),   # the decoder's real op
    ((3, 3, 3), (2, 2, 2)),   # the deep-stage upsample
    ((1, 3, 3), (1, 1, 1)),   # degenerate stride
    ((2, 2, 2), (2, 2, 2)),   # k == s (zero-overlap phases)
    ((1, 4, 4), (1, 2, 2)),   # even kernel
    ((1, 3, 3), (1, 3, 3)),   # s > k-1 branch of the padding rule
])
def test_subpixel_matches_conv_transpose(kern, stride):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6, 6, 5))
    ref = nn.ConvTranspose(7, kern, stride, transpose_kernel=True, **CK)
    sub = SubpixelConvTranspose(features=7, kernel_size=kern, strides=stride,
                                **CK)
    p_ref, y_ref = _init_and_apply(ref, x)
    p_sub, y_sub = _init_and_apply(sub, x)
    assert y_sub.shape == y_ref.shape
    # identical param trees: same names, shapes, AND initializer draws
    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_sub)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_sub)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sub),
                               atol=1e-5)
    # cross-apply: reference params through the subpixel module
    np.testing.assert_allclose(
        np.asarray(sub.apply(p_ref, x)), np.asarray(y_ref), atol=1e-5)


def test_subpixel_gradients_match():
    kern, stride = (1, 3, 3), (1, 2, 2)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 6, 6, 4))
    ref = nn.ConvTranspose(5, kern, stride, transpose_kernel=True, **CK)
    sub = SubpixelConvTranspose(features=5, kernel_size=kern, strides=stride,
                                **CK)
    params = ref.init(jax.random.PRNGKey(0), x)

    def loss(mod):
        return lambda p, v: jnp.sum(mod.apply(p, v) ** 2)

    g_ref = jax.grad(loss(ref))(params, x)
    g_sub = jax.grad(loss(sub))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sub)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_subpixel_factory_routing():
    on = ConvConfig(subpixel=True)
    assert isinstance(conv3d_transpose(on, 4, (1, 3, 3), (1, 2, 2)),
                      SubpixelConvTranspose)
    assert isinstance(conv3d_transpose(on, 4, (3, 3, 3), (2, 2, 2)),
                      SubpixelConvTranspose)
    off = ConvConfig()
    assert isinstance(conv3d_transpose(off, 4, (1, 3, 3), (1, 2, 2)),
                      nn.ConvTranspose)
    # fold2d=True takes precedence on unit-depth kernels (both are exact;
    # fold2d was the earlier measured experiment)
    both = ConvConfig(fold2d=True, subpixel=True)
    assert not isinstance(conv3d_transpose(both, 4, (1, 3, 3), (1, 2, 2)),
                          SubpixelConvTranspose)


def test_subpixel_bf16_compute():
    ck = dict(CK, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 8, 8, 4),
                          jnp.bfloat16)
    ref = nn.ConvTranspose(6, (1, 3, 3), (1, 2, 2), transpose_kernel=True,
                           **ck)
    sub = SubpixelConvTranspose(features=6, kernel_size=(1, 3, 3),
                                strides=(1, 2, 2), **ck)
    params = ref.init(jax.random.PRNGKey(0), x)
    y_ref = ref.apply(params, x)
    y_sub = sub.apply(params, x)
    assert y_sub.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_sub, np.float32),
        atol=2e-2)
