"""Golden tests: PackedM1 fast path == M1Core reference path.

The packed forward (models/m1_packed.py) re-expresses the deterministic
trunk on width-packed tensors; it must be numerically equivalent (fp32) to
the parity-oracle path for every supported configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.models.m1_packed import PackedM1

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 32, 32)
FILTERS = (8, 16, 32, 64, 96)
STRIDES = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
SE_RED = (2, 2, 2, 2, 2)


def _model(**kw):
    return M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
        se_reduction=SE_RED, att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, **kw)


def _packed(model, **kw):
    return PackedM1(
        input_spatial_dims=SPATIAL, input_channels=3,
        num_classes=2, filters=FILTERS, strides=STRIDES,
        kernel_sizes=KERNELS, se_reduction=SE_RED, **kw)


@pytest.mark.parametrize("dense_skip,deep_supervision", [
    (False, False),
    (True, False),
    (True, True),
    (False, True),
])
def test_packed_forward_matches_reference_path(dense_skip, deep_supervision):
    model = _model(dense_skip=dense_skip, deep_supervision=deep_supervision)
    fast = _packed(model, dense_skip=dense_skip,
                   deep_supervision=deep_supervision)

    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, *SPATIAL, 3)), jnp.float32)
    ref = np.asarray(model.apply(model.params, x)["y_softmax"])
    got = np.asarray(fast(model.params["core"], x))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=3e-4)
    # classification agreement must be essentially perfect
    nc = 2
    assert np.mean(np.argmax(got[..., :nc], -1) ==
                   np.argmax(ref[..., :nc], -1)) > 0.999


def test_packed_forward_jits_and_batches():
    model = _model()
    fast = _packed(model)
    fn = jax.jit(lambda p, x: fast(p, x))
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(4, *SPATIAL, 3)), jnp.float32)
    out = np.asarray(fn(model.params["core"], x))
    assert out.shape == (4, *SPATIAL, 2)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
