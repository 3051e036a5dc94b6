"""2D-folded conv dispatch (ops.convolution.Fold2DConv/Fold2DConvTranspose).

The M1 family issues many (1,kh,kw)-kernel 3D convs (reference kernel_sizes
tf2.5/scripts/model/unets/networks.py:39); XLA dispatches them measurably
faster as 2D convs with D folded into batch (docs/ROUND2_NOTES.md). These
tests pin the contract that the folded modules are drop-in equal to
nn.Conv / nn.ConvTranspose(transpose_kernel=True): identical param trees
(names, shapes, initializer draws) and equal outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from prostatemr_3d_cad_cspca_tpu.ops.convolution import (
    ConvConfig,
    Fold2DConv,
    Fold2DConvTranspose,
    conv3d,
    conv3d_transpose,
)

CK = ConvConfig().conv_kwargs()


def _init_and_apply(mod, x, key=0):
    params = mod.init(jax.random.PRNGKey(key), x)
    return params, mod.apply(params, x)


@pytest.mark.parametrize("kern,stride", [
    ((1, 3, 3), (1, 1, 1)),
    ((1, 3, 3), (1, 2, 2)),
    ((1, 1, 1), (1, 1, 1)),
    ((1, 5, 3), (1, 1, 2)),
])
def test_fold2d_conv_matches_nn_conv(kern, stride):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 12, 12, 5))
    ref = nn.Conv(7, kern, stride, **CK)
    fold = Fold2DConv(features=7, kernel_size=kern, strides=stride, **CK)
    p_ref, y_ref = _init_and_apply(ref, x)
    p_fold, y_fold = _init_and_apply(fold, x)
    # identical param trees: same names, shapes, AND initializer draws
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_fold)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fold)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fold), atol=1e-5)
    # cross-apply: reference params through the folded module
    np.testing.assert_allclose(
        np.asarray(fold.apply(p_ref, x)), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("kern,stride", [
    ((1, 3, 3), (1, 2, 2)),
    ((1, 3, 3), (1, 1, 1)),
    ((1, 2, 2), (1, 2, 2)),
])
def test_fold2d_convtranspose_matches_nn(kern, stride):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 6, 6, 5))
    ref = nn.ConvTranspose(7, kern, stride, transpose_kernel=True, **CK)
    fold = Fold2DConvTranspose(features=7, kernel_size=kern, strides=stride, **CK)
    p_ref, y_ref = _init_and_apply(ref, x)
    p_fold, y_fold = _init_and_apply(fold, x)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_fold)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_fold)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fold), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fold.apply(p_ref, x)), np.asarray(y_ref), atol=1e-5)


def test_factory_routing():
    on = ConvConfig(fold2d=True)
    assert isinstance(conv3d(on, 4, (1, 3, 3), (1, 1, 1)), Fold2DConv)
    assert isinstance(conv3d(on, 4, (3, 3, 3), (1, 1, 1)), nn.Conv)
    # depth stride > 1 cannot fold even with unit depth kernel
    assert isinstance(conv3d(on, 4, (1, 3, 3), (2, 2, 2)), nn.Conv)
    assert isinstance(conv3d_transpose(on, 4, (1, 3, 3), (1, 2, 2)),
                      Fold2DConvTranspose)
    assert isinstance(conv3d_transpose(on, 4, (3, 3, 3), (2, 2, 2)),
                      nn.ConvTranspose)
    fwd = ConvConfig(fold2d="forward")
    assert isinstance(conv3d(fwd, 4, (1, 3, 3), (1, 1, 1)), Fold2DConv)
    assert isinstance(conv3d_transpose(fwd, 4, (1, 3, 3), (1, 2, 2)),
                      nn.ConvTranspose)
    # default OFF: full-model composition lost on the measured toolchain
    # (docs/ROUND3_NOTES.md)
    off = ConvConfig()
    assert off.fold2d is False
    assert isinstance(conv3d(off, 4, (1, 3, 3), (1, 1, 1)), nn.Conv)
    assert isinstance(conv3d_transpose(off, 4, (1, 3, 3), (1, 2, 2)),
                      nn.ConvTranspose)


def test_fold2d_bf16_compute():
    ck = dict(CK, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 8, 8, 4), jnp.bfloat16)
    ref = nn.Conv(6, (1, 3, 3), (1, 2, 2), **ck)
    fold = Fold2DConv(features=6, kernel_size=(1, 3, 3), strides=(1, 2, 2), **ck)
    p = ref.init(jax.random.PRNGKey(4), x)
    y_ref, y_fold = ref.apply(p, x), fold.apply(p, x)
    assert y_fold.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_fold, np.float32), atol=2e-2)


def test_fold2d_gradients_match():
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 8, 8, 4))
    ref = nn.Conv(6, (1, 3, 3), (1, 1, 1), **CK)
    fold = Fold2DConv(features=6, kernel_size=(1, 3, 3), strides=(1, 1, 1), **CK)
    p = ref.init(jax.random.PRNGKey(6), x)
    g_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2))(p)
    g_fold = jax.grad(lambda p: jnp.sum(fold.apply(p, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fold)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
