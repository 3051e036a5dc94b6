"""Property tests for the fused on-device augmentation pipeline
(reference model/augmentations.py semantics — see augment.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.augment import (
    AugmentParams,
    augment_batch,
    augment_sample,
)

D, H, W = 4, 16, 16


def _blob_label(nc=2):
    lab = np.zeros((D, H, W), np.float32)
    lab[1:3, 4:10, 5:11] = 1.0
    return np.stack([1.0 - lab, lab], axis=-1).astype(np.float32)


def _geom_only(**kw):
    base = dict(
        prob=1.0, tx_prob=0.0, translate_factor=0.2, rotation_degree=15.0,
        axial_hflip=True, zoom_factor=1.3, gauss_noise_stddev=0.0,
        chan_shift_factor=0.0, sim_poor_scan=False, gamma_correct=(0.0, 0.0))
    base.update(kw)
    return AugmentParams(**base)


def test_master_prob_zero_is_identity():
    p = AugmentParams(prob=0.0)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(D, H, W, 3)), jnp.float32)
    lbl = jnp.asarray(_blob_label())
    out_i, out_l = augment_sample(jax.random.PRNGKey(0), img, lbl, p)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lbl))


def test_deterministic_given_key():
    p = _geom_only()
    img = jnp.asarray(np.random.default_rng(1).normal(size=(D, H, W, 3)), jnp.float32)
    lbl = jnp.asarray(_blob_label())
    a = augment_sample(jax.random.PRNGKey(7), img, lbl, p)
    b = augment_sample(jax.random.PRNGKey(7), img, lbl, p)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    c = augment_sample(jax.random.PRNGKey(8), img, lbl, p)
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_shared_draws_keep_image_label_aligned():
    """The reference's geometric label-consistency contract
    (augmentations.py:114-120): identical inputs must stay identical through
    the shared-draw geometric transforms."""
    p = _geom_only()
    lbl = _blob_label()
    # image whose 3 channels each equal the label's foreground channel
    img = np.repeat(lbl[..., 1:2], 3, axis=-1)
    for seed in range(4):
        out_i, out_l = augment_sample(
            jax.random.PRNGKey(seed), jnp.asarray(img), jnp.asarray(lbl), p)
        np.testing.assert_allclose(
            np.asarray(out_i[..., 0]), np.asarray(out_l[..., 1]), atol=1e-5)


def test_intensity_transforms_never_touch_labels():
    p = AugmentParams(
        prob=1.0, tx_prob=0.0, translate_factor=0.0, rotation_degree=0.0,
        axial_hflip=False, zoom_factor=0.0, gauss_noise_stddev=0.5,
        chan_shift_factor=0.0, sim_poor_scan=True, gamma_correct=(0.5, 1.5))
    img = jnp.asarray(np.random.default_rng(2).normal(size=(D, H, W, 3)), jnp.float32)
    lbl = jnp.asarray(_blob_label())
    out_i, out_l = augment_sample(jax.random.PRNGKey(3), img, lbl, p)
    np.testing.assert_array_equal(np.asarray(out_l), np.asarray(lbl))
    assert not np.allclose(np.asarray(out_i), np.asarray(img))


def test_channel_shift_moves_exactly_one_mri_channel():
    p = AugmentParams(
        prob=1.0, tx_prob=0.0, translate_factor=0.0, rotation_degree=0.0,
        axial_hflip=False, zoom_factor=0.0, gauss_noise_stddev=0.0,
        chan_shift_factor=0.2, sim_poor_scan=False, gamma_correct=(0.0, 0.0))
    img = np.random.default_rng(4).normal(size=(D, H, W, 4)).astype(np.float32)
    lbl = _blob_label()
    out_i, _ = augment_sample(
        jax.random.PRNGKey(11), jnp.asarray(img), jnp.asarray(lbl), p,
        train_obj="lesion")
    out_i = np.asarray(out_i)
    changed = [not np.allclose(out_i[..., c], img[..., c]) for c in range(4)]
    assert sum(changed[:3]) <= 1          # at most one MRI channel shifted
    assert not changed[3]                 # appended label channel untouched


def test_batch_augment_jits_and_preserves_shapes():
    p = AugmentParams()
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(5).normal(size=(2, D, H, W, 3)), jnp.float32),
        "detection": jnp.stack([jnp.asarray(_blob_label())] * 2),
    }
    out = augment_batch(jax.random.PRNGKey(0), batch, p, "lesion")
    assert out["image"].shape == batch["image"].shape
    assert out["detection"].shape == batch["detection"].shape
    assert np.all(np.isfinite(np.asarray(out["image"])))


def test_zoom_preserves_label_mass_approximately():
    """Zoom-in should keep a centered blob's foreground present (scaled up)."""
    p = _geom_only(translate_factor=0.0, rotation_degree=0.0,
                   axial_hflip=False, zoom_factor=1.2)
    lbl = _blob_label()
    img = np.repeat(lbl[..., 1:2], 3, axis=-1)
    out_i, out_l = augment_sample(
        jax.random.PRNGKey(1), jnp.asarray(img), jnp.asarray(lbl), p)
    assert float(jnp.sum(out_l[..., 1])) > 0.5 * float(np.sum(lbl[..., 1]))
