"""Layer freezing (--FREEZE_LAYERS parity) and shape-summary tests."""

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.train.trainer import (
    init_train_state,
    make_loss,
    make_optimizer,
    make_train_step,
)

import pytest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)
KW = dict(
    input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
    filters=(4, 8, 12, 16, 24),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(2, 2, 2, 2, 2),
    att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    dropout_rate=0.0, summary=False,
)


def test_freeze_first_n_modules_get_zero_updates():
    model = M1(**KW)
    opt = make_optimizer("momentum", 1e-2, freeze_first_n=3)
    step = make_train_step(model, make_loss("distribution_focal"), opt)
    state = init_train_state(model, opt)
    p0 = jax.device_get(state.params)

    rng = np.random.default_rng(0)
    lab = np.zeros((2, *SPATIAL), np.int64)
    lab[:, 1:3, 4:10, 4:10] = 1
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, *SPATIAL, 3)), np.float32),
        "detection": jnp.asarray(np.eye(2, dtype=np.float32)[lab]),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    p1 = jax.device_get(state.params)

    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = jax.tree_util.tree_leaves(p1)
    modules = sorted({
        "/".join(str(p.key) for p in path[:2]) for path, _ in flat0})
    frozen = set(modules[:3])
    n_frozen = n_trained = 0
    for (path, a), b in zip(flat0, flat1):
        mod = "/".join(str(p.key) for p in path[:2])
        if mod in frozen:
            np.testing.assert_array_equal(a, b)
            n_frozen += 1
        else:
            n_trained += int(not np.array_equal(a, b))
    assert n_frozen > 0 and n_trained > 0


def test_describe_prints_stage_shapes(capsys):
    model = M1(**KW)
    lines = model.describe()
    assert any("att" in ln for ln in lines)
    out = capsys.readouterr().out
    assert str((1, *SPATIAL)) [: -1] in out or "4, 16, 16" in out
