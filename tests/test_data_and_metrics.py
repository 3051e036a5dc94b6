"""Data pipeline + metrics + native-kernel tests."""

import csv
import os

import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.data.generators import (
    contour_smoothening,
    custom_data_generator,
    load_sample,
)
from prostatemr_3d_cad_cspca_tpu.data.manifest import read_manifest
from prostatemr_3d_cad_cspca_tpu.data.preprocess import (
    center_crop,
    resize_image_with_crop_or_pad,
    whitening,
)
from prostatemr_3d_cad_cspca_tpu.train.metrics import (
    dice_3d,
    froc_curve,
    lesion_average_precision,
    patient_auroc,
)


@pytest.fixture
def dataset(tmp_path):
    rows = []
    r = np.random.default_rng(0)
    for i in range(3):
        img = r.normal(size=(4, 16, 16, 3)).astype(np.float32)
        lab = np.zeros((4, 16, 16), np.float32)
        lab[1:3, 4:10, 4:10] = 2.0 + (i % 3)
        zones = np.zeros((4, 16, 16), np.uint8)
        zones[1:3, 2:8, 2:8] = 1
        zones[1:3, 8:14, 8:14] = 2
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
    return mpath


def test_read_reference_xlsx_feed():
    path = "/root/reference/tf2.5/feed/prostateX_200_valid-fold-1.xlsx"
    if not os.path.exists(path):
        pytest.skip("reference feed not mounted")
    rows = read_manifest(path)
    assert len(rows) == 40
    assert set(rows[0].keys()) == {"p-id", "image_path", "label_path", "zones_path"}


def test_lesion_sample_binarizes_ggg(dataset):
    rows = read_manifest(dataset)
    s = load_sample(rows[0], train_obj="lesion", mode="train")
    assert s["image"].shape == (4, 16, 16, 3)
    assert s["detection"].shape == (4, 16, 16, 2)
    # GGG>=2 became binary fg, one-hot sums to 1
    np.testing.assert_allclose(s["detection"].sum(-1), 1.0)


def test_zonal_sample_one_hot(dataset):
    rows = read_manifest(dataset)
    s = load_sample(rows[0], train_obj="zonal", mode="train")
    assert s["image"].shape == (4, 16, 16, 1)
    assert s["detection"].shape == (4, 16, 16, 3)


def test_probabilistic_sample_appends_labels(dataset):
    rows = read_manifest(dataset)
    tr = load_sample(rows[0], "lesion", probabilistic=True, mode="train")
    va = load_sample(rows[0], "lesion", probabilistic=True, mode="valid")
    assert tr["image"].shape[-1] == 4
    assert tr["KL"].shape == tr["detection"].shape
    # valid mode zeroes the appended label channel (data_generators.py:77)
    assert np.all(va["image"][..., 3] == 0)
    assert tr["image"][..., 3].max() > 0


def test_generator_cycles(dataset):
    gen = custom_data_generator(dataset, train_obj="lesion", shuffle_seed=0)
    seen = [next(gen)["image"].shape for _ in range(5)]
    assert all(s == (4, 16, 16, 3) for s in seen)


def test_contour_smoothening_softens_edges():
    lab = np.zeros((2, 32, 32), np.uint8)
    lab[:, 8:24, 8:24] = 1
    sm = contour_smoothening(lab.copy())
    assert sm.max() <= 1 and sm.min() >= 0
    assert sm.shape == lab.shape


def test_native_contour_smooth_close_to_cv2():
    cv2 = pytest.importorskip("cv2")
    from prostatemr_3d_cad_cspca_tpu.utils.native import contour_smooth

    lab = (np.random.default_rng(0).random((4, 32, 32)) > 0.7).astype(np.uint8)
    nat = contour_smooth(lab, 7)
    if nat is None:
        pytest.skip("native lib unavailable")
    ref = np.stack([cv2.GaussianBlur(s, (7, 7), cv2.BORDER_DEFAULT) for s in lab])
    assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1


def test_whitening_and_crops():
    img = np.random.default_rng(0).normal(5, 3, (8, 32, 32)).astype(np.float32)
    w = whitening(img, percentile=99)
    assert abs(float(w.mean())) < 1e-4 and abs(float(w.std()) - 1) < 1e-3
    c = center_crop(img, 4, 16, 16)
    assert c.shape == (4, 16, 16)
    rp = resize_image_with_crop_or_pad(img, (12, 40, 20))
    assert rp.shape == (12, 40, 20)


def test_dice_and_auroc():
    a = np.zeros((4, 8, 8)); a[1:3, 2:6, 2:6] = 1
    assert abs(dice_3d(a, a) - 1.0) < 1e-6
    assert dice_3d(np.zeros_like(a), a) < 1e-3
    auroc = patient_auroc(
        [np.full((2, 2), 0.9), np.full((2, 2), 0.2), np.full((2, 2), 0.8)],
        [1, 0, 1])
    assert auroc == 1.0


def test_froc_and_ap_perfect_detection():
    lab = np.zeros((4, 16, 16)); lab[1:3, 4:8, 4:8] = 1
    prob = lab * 0.9
    fr = froc_curve([prob], [lab], threshold=0.5, min_overlap=0.5)
    assert fr["n_lesions"] == 1
    assert fr["sensitivity"][-1] == 1.0
    ap = lesion_average_precision([prob], [lab], threshold=0.5, min_overlap=0.5)
    assert ap == 1.0


def test_froc_multi_lesion_partial_detection():
    """Two GT lesions, one detected + one false positive: sensitivity tops at
    0.5 and the FP registers against the case count."""
    lab = np.zeros((4, 32, 32))
    lab[1:3, 2:8, 2:8] = 1      # lesion A
    lab[1:3, 20:26, 20:26] = 1  # lesion B
    prob = np.zeros_like(lab)
    prob[1:3, 2:8, 2:8] = 0.9           # hits A
    prob[1:3, 12:16, 12:16] = 0.8       # false positive
    fr = froc_curve([prob], [lab], threshold=0.5, min_overlap=0.5)
    assert fr["n_lesions"] == 2
    assert fr["sensitivity"][-1] == 0.5
    assert fr["fp_per_case"][-1] == 1.0
    ap = lesion_average_precision([prob], [lab], threshold=0.5, min_overlap=0.5)
    assert 0.2 < ap <= 0.5  # precision@1 = 1 for the hit, half the GT found


def test_candidate_matching_does_not_double_count():
    """Two candidates over the same GT lesion: only one true positive."""
    lab = np.zeros((4, 32, 32)); lab[1:3, 4:16, 4:16] = 1
    prob = np.zeros_like(lab)
    prob[1:3, 4:9, 4:16] = 0.9
    prob[1:3, 11:16, 4:16] = 0.8
    fr = froc_curve([prob], [lab], threshold=0.5, min_overlap=0.2)
    assert fr["n_lesions"] == 1
    assert fr["sensitivity"][-1] == 1.0
    # the second candidate is a false positive, not a second hit
    assert fr["fp_per_case"][-1] == 1.0
