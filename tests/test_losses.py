"""Analytic cases for the objectives (reference model/losses.py).

Key contracts: focal==CE at gamma=0 (train_model.py:91 help text),
deep-supervision channel-group averaging (losses.py:43-49), signed-EDT
boundary map semantics (losses.py:82-96)."""

import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.losses import (
    EvidenceLowerBound,
    Focal,
    SoftDicePlusBoundarySurface,
)
from prostatemr_3d_cad_cspca_tpu.ops.edt import signed_distance_map


def _one_hot_vol(rng, shape=(2, 2, 4, 4), nc=2):
    lab = rng.integers(0, nc, size=shape)
    return np.eye(nc, dtype=np.float32)[lab]


def test_focal_gamma0_equals_ce():
    rng = np.random.default_rng(0)
    y_true = _one_hot_vol(rng)
    logits = rng.normal(size=y_true.shape).astype(np.float32)
    y_pred = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    fl = Focal(alpha=[1.0, 1.0], gamma=0.0).loss(jnp.asarray(y_true), jnp.asarray(y_pred))
    ce = -(y_true * np.log(np.clip(y_pred, 1e-7, 1 - 1e-7))).sum(axis=(1, 2, 3, 4)).mean()
    np.testing.assert_allclose(np.asarray(fl), ce, rtol=1e-5)


def test_focal_downweights_easy_examples():
    y_true = np.zeros((1, 1, 2, 2, 2), np.float32)
    y_true[..., 1] = 1.0
    easy = np.stack([np.full((1, 1, 2, 2), 0.05), np.full((1, 1, 2, 2), 0.95)], -1)
    g0 = Focal(alpha=[1, 1], gamma=0.0).loss(jnp.asarray(y_true), jnp.asarray(easy))
    g2 = Focal(alpha=[1, 1], gamma=2.0).loss(jnp.asarray(y_true), jnp.asarray(easy))
    assert float(g2) < float(g0)


def test_focal_deep_supervision_grouping():
    rng = np.random.default_rng(1)
    y_true = _one_hot_vol(rng)
    y_pred = rng.uniform(0.1, 0.9, size=y_true.shape).astype(np.float32)
    loss = Focal(alpha=[1, 1], gamma=2.0)
    single = loss.loss(jnp.asarray(y_true), jnp.asarray(y_pred))
    # duplicated prediction groups must average to the same value
    doubled = loss.loss(jnp.asarray(y_true), jnp.asarray(np.concatenate([y_pred, y_pred], -1)))
    np.testing.assert_allclose(np.asarray(single), np.asarray(doubled), rtol=1e-6)


def test_elbo_scales_kl():
    kl = jnp.asarray(3.0)
    assert float(EvidenceLowerBound(beta=10.0).loss(None, kl)) == 30.0


def test_soft_dice_perfect_prediction():
    rng = np.random.default_rng(2)
    y_true = _one_hot_vol(rng)
    d = SoftDicePlusBoundarySurface().dice_loss(jnp.asarray(y_true), jnp.asarray(y_true))
    assert float(d) < 1e-3


def test_signed_distance_map_semantics():
    seg = np.zeros((1, 1, 5, 5, 1), np.float32)
    seg[0, 0, 2, 2, 0] = 1.0
    dm = signed_distance_map(seg)
    assert dm.shape == seg.shape
    # inside voxel: -(edt(pos)-1)*pos = -(1-1)= 0 at the single voxel
    assert dm[0, 0, 2, 2, 0] == 0.0
    # neighbors at distance 1 outside
    assert dm[0, 0, 2, 3, 0] == 1.0
    np.testing.assert_allclose(dm[0, 0, 0, 0, 0], np.sqrt(8), rtol=1e-6)


def test_boundary_loss_with_precomputed_map():
    seg = np.zeros((1, 2, 4, 4, 2), np.float32)
    seg[..., 0] = 1.0
    seg[0, :, 1:3, 1:3, 1] = 1.0
    seg[0, :, 1:3, 1:3, 0] = 0.0
    dm = signed_distance_map(seg[..., 1:])
    loss = SoftDicePlusBoundarySurface(loss_weights=[0.0, 1.0])
    # predicting exactly the label: boundary term is negative-ish (inside) or 0
    val = loss.loss(jnp.asarray(seg), jnp.asarray(seg), dist_map=jnp.asarray(dm))
    assert np.isfinite(float(val))


def test_numpy_edt_matches_scipy():
    from prostatemr_3d_cad_cspca_tpu.ops.edt import _numpy_edt, _scipy_edt

    if _scipy_edt is None:
        return
    rng = np.random.default_rng(3)
    mask = rng.random((6, 7, 8)) > 0.6
    np.testing.assert_allclose(_numpy_edt(mask), _scipy_edt(mask), atol=1e-6)
