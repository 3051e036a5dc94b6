"""Round-2 pipeline features: precomputed boundary-loss EDT (incl. its ride
through the augmentation warps), sample caching (--CACHE_TDS_PATH), warm-start
load_weights, and producer-thread lifecycle."""

import csv
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.augment import AugmentParams, augment_sample
from prostatemr_3d_cad_cspca_tpu.data.generators import (
    batch_iterator,
    custom_data_generator,
    load_sample,
)
from prostatemr_3d_cad_cspca_tpu.ops.edt import signed_distance_map

pytestmark = pytest.mark.slow  # compile-heavy full-model tier


@pytest.fixture
def dataset(tmp_path):
    rows = []
    r = np.random.default_rng(0)
    for i in range(3):
        img = r.normal(size=(4, 16, 16, 3)).astype(np.float32)
        lab = np.zeros((4, 16, 16), np.float32)
        lab[1:3, 4:10, 4:10] = 2.0
        zones = np.zeros((4, 16, 16), np.uint8)
        paths = {}
        for k, arr in (("image", img), ("label", lab), ("zones", zones)):
            p = str(tmp_path / f"case{i}_{k}.npy")
            np.save(p, arr)
            paths[k] = p
        rows.append({"p-id": f"case{i}", "image_path": paths["image"],
                     "label_path": paths["label"], "zones_path": paths["zones"]})
    mpath = str(tmp_path / "fold.csv")
    with open(mpath, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        for row in rows:
            w.writerow(row)
    return mpath, rows


def test_load_sample_dist_map_matches_edt(dataset):
    _, rows = dataset
    s = load_sample(rows[0], "lesion", mode="train", with_dist_map=True)
    assert s["dist_map"].shape == s["detection"][..., 1:].shape
    expect = signed_distance_map(s["detection"][..., 1:])
    np.testing.assert_allclose(s["dist_map"], expect)
    # foreground voxels are negative (inside), background positive
    fg = s["detection"][..., 1:] > 0.5
    assert (s["dist_map"][fg] <= 0).all()
    assert (s["dist_map"][~fg] >= 0).all()


def test_augment_warps_dist_map_with_label():
    """Flip-only augmentation: the warped EDT must equal the EDT of the warped
    label exactly (flips are isometries)."""
    r = np.random.default_rng(1)
    img = jnp.asarray(r.normal(size=(4, 16, 16, 3)), jnp.float32)
    lab = np.zeros((4, 16, 16, 2), np.float32)
    lab[..., 1][1:3, 4:9, 2:7] = 1.0
    lab[..., 0] = 1.0 - lab[..., 1]
    dm = jnp.asarray(signed_distance_map(lab[..., 1:]))
    p = AugmentParams(prob=1.0, tx_prob=0.0, translate_factor=0.0,
                      rotation_degree=0.0, axial_hflip=True, zoom_factor=0.0,
                      gauss_noise_stddev=0.0, chan_shift_factor=0.0,
                      sim_poor_scan=False, gamma_correct=(0.0, 0.0))
    # find a key whose flip coin lands on True
    for seed in range(20):
        key = jax.random.PRNGKey(seed)
        _, lbl2, dm2 = augment_sample(key, img, jnp.asarray(lab), p, "lesion", dm)
        if not np.allclose(np.asarray(lbl2), lab):
            break
    else:
        pytest.fail("no flip draw found")
    expect = signed_distance_map(np.asarray(lbl2)[..., 1:])
    np.testing.assert_allclose(np.asarray(dm2), expect, atol=1e-5)


def test_region_boundary_step_uses_precomputed_edt(dataset, monkeypatch):
    """With dist_map in the batch the train step must not fall back to the
    per-step host callback."""
    from prostatemr_3d_cad_cspca_tpu import losses
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    from prostatemr_3d_cad_cspca_tpu.train.trainer import (
        init_train_state, make_loss, make_optimizer, make_train_step)

    def boom(*a, **k):
        raise AssertionError("pure_callback EDT used despite precomputed dist_map")

    monkeypatch.setattr(
        "prostatemr_3d_cad_cspca_tpu.ops.edt.signed_distance_map_callback", boom)

    _, rows = dataset
    samples = [load_sample(r, "lesion", mode="train", with_dist_map=True)
               for r in rows[:2]]
    batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
             for k in samples[0]}

    model = M1(
        input_spatial_dims=(4, 16, 16), input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        summary=False)
    opt = make_optimizer("adam", 1e-3)
    step = make_train_step(
        model, make_loss("region_boundary", dsc_bd_weights=(1.0, 0.5)), opt,
        augment_params=[1.0, 0.0, 0.1, 5.0, True, 1.1, 0.0, 0.0, False, (0.8, 1.2)],
        train_obj="lesion")
    state = init_train_state(model, opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_cache_dir_roundtrip(dataset, tmp_path):
    mpath, _ = dataset
    cache = str(tmp_path / "tds_cache")
    gen = custom_data_generator(mpath, "lesion", mode="train",
                                with_dist_map=True, cache_dir=cache)
    first = [next(gen) for _ in range(3)]  # fills the cache
    gen2 = custom_data_generator(mpath, "lesion", mode="train",
                                 with_dist_map=True, cache_dir=cache)
    second = [next(gen2) for _ in range(3)]
    for a, b in zip(first, second):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    import os

    files = os.listdir(cache)
    assert len(files) == 3 and all(f.endswith(".npz") for f in files)


def test_load_weights_warm_start_tolerates_head_mismatch(tmp_path):
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    kw = dict(
        input_spatial_dims=(4, 16, 16), input_channels=1,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        summary=False)
    donor = M1(num_classes=2, **kw)
    path = str(tmp_path / "donor.npz")
    donor.save(path)

    target = M1(num_classes=3, seed=7, **kw)  # different segmentation head
    before = jax.tree_util.tree_map(np.asarray, target.params)
    target.load_weights(path)

    # backbone leaves must now equal the donor's ...
    np.testing.assert_allclose(
        np.asarray(target.params["core"]["conve0"]["kernel"]),
        np.asarray(donor.params["core"]["conve0"]["kernel"]))
    # ... while the mismatched logits head keeps its own init
    np.testing.assert_allclose(
        np.asarray(target.params["core"]["logits"]["kernel"]),
        np.asarray(before["core"]["logits"]["kernel"]))
    with pytest.raises(ValueError):
        target.load_weights(path, strict=True)


def test_batch_iterator_producer_shuts_down(dataset):
    mpath, _ = dataset
    gen = custom_data_generator(mpath, "lesion", mode="train")
    n0 = threading.active_count()
    batches = batch_iterator(gen, batch_size=2, prefetch=2)
    assert next(batches)["image"].shape[0] == 2
    batches.close()
    # producer exits within its 0.25 s put timeout
    import time

    for _ in range(40):
        if threading.active_count() <= n0:
            break
        time.sleep(0.1)
    assert threading.active_count() <= n0
