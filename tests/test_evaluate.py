"""Evaluation driver tests (evaluate.py): checkpoint + labeled manifest ->
metrics JSON. The reference's validation callbacks were 'TBA' stubs with a
never-released internal FROC tool; this driver is that missing piece.
"""

import csv
import json
import os

import numpy as np

import pytest

from prostatemr_3d_cad_cspca_tpu import evaluate
from prostatemr_3d_cad_cspca_tpu.models import M1

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)
ARCH = dict(
    input_spatial_dims=SPATIAL,
    filters=(4, 8, 12, 16, 24),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
    dropout_rate=0.0, dropout_mode="standard", summary=False)


def _mk_data(tmp, n=4):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        img = rng.normal(size=(*SPATIAL, 3)).astype(np.float32)
        lab = np.zeros(SPATIAL, np.float32)
        if i % 2 == 0:  # half the cases positive (GGG>=2)
            lab[1:3, 4:10, 4:10] = 2.0
        ip = os.path.join(tmp, f"c{i}_img.npy")
        lp = os.path.join(tmp, f"c{i}_lab.npy")
        zp = os.path.join(tmp, f"c{i}_zon.npy")
        np.save(ip, img)
        np.save(lp, lab)
        np.save(zp, (lab > 0).astype(np.uint8))
        rows.append({"p-id": f"c{i}", "image_path": ip, "label_path": lp,
                     "zones_path": zp})
    man = os.path.join(tmp, "valid.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    return man


def test_evaluate_lesion_and_output_json(tmp_path):
    tmp = str(tmp_path)
    man = _mk_data(tmp)
    model = M1(input_channels=3, num_classes=2, **ARCH)
    ckpt = os.path.join(tmp, "m.npz")
    model.save(ckpt)

    out = os.path.join(tmp, "metrics.json")
    got = evaluate.main(["--MODEL", ckpt, "--MANIFEST", man,
                         "--TRAIN_OBJ", "lesion", "--OUTPUT", out])
    assert got["cases"] == 4
    for key in ("auroc", "froc_pauc", "lesion_ap", "dice"):
        assert 0.0 <= got[key] <= 1.0, (key, got[key])
    with open(out) as f:
        assert json.load(f) == got


def test_evaluate_zonal_and_ensemble(tmp_path):
    tmp = str(tmp_path)
    man = _mk_data(tmp)

    zon = M1(input_channels=1, num_classes=3, **ARCH)
    zckpt = os.path.join(tmp, "z.npz")
    zon.save(zckpt)
    got = evaluate.main(["--MODEL", zckpt, "--MANIFEST", man,
                         "--TRAIN_OBJ", "zonal"])
    assert set(got) >= {"dice_TZ", "dice_PZ", "dice_mean"}

    # fold ensemble (2 members) with MC + TTA exercises the full deployed
    # evaluation configuration
    m1 = M1(input_channels=3, num_classes=2, seed=1, **ARCH)
    m2 = M1(input_channels=3, num_classes=2, seed=2, **ARCH)
    p1, p2 = os.path.join(tmp, "f1.npz"), os.path.join(tmp, "f2.npz")
    m1.save(p1)
    m2.save(p2)
    got = evaluate.main(["--MODEL", f"{p1},{p2}", "--MANIFEST", man,
                         "--TRAIN_OBJ", "lesion", "--TTA", "1"])
    assert got["cases"] == 4 and 0.0 <= got["lesion_ap"] <= 1.0


def test_evaluate_cascaded_and_zonal_mc(tmp_path):
    """Cascaded checkpoints evaluate the FINAL-stage detection (single exam
    feeds both stages, serve parity); zonal --PROBA_ITER actually MC-averages
    (different iter counts give different Dice on a dropout model)."""
    tmp = str(tmp_path)
    man = _mk_data(tmp)

    casc = M1(input_channels=3, num_classes=2, cascaded="noisy-or", **ARCH)
    cckpt = os.path.join(tmp, "c.npz")
    casc.save(cckpt)
    got = evaluate.main(["--MODEL", cckpt, "--MANIFEST", man,
                         "--TRAIN_OBJ", "lesion"])
    assert got["cases"] == 4 and 0.0 <= got["lesion_ap"] <= 1.0

    mc_arch = dict(ARCH, dropout_rate=0.5, dropout_mode="monte-carlo")
    zon = M1(input_channels=1, num_classes=3, **mc_arch)
    zckpt = os.path.join(tmp, "zmc.npz")
    zon.save(zckpt)
    a = evaluate.main(["--MODEL", zckpt, "--MANIFEST", man,
                       "--TRAIN_OBJ", "zonal", "--PROBA_ITER", "1"])
    b = evaluate.main(["--MODEL", zckpt, "--MANIFEST", man,
                       "--TRAIN_OBJ", "zonal", "--PROBA_ITER", "4"])
    assert a["dice_mean"] != b["dice_mean"]  # MC averaging took effect


def test_evaluate_cascaded_second_exam_column(tmp_path):
    """A manifest image_path_2 column supplies the cascaded second exam
    (serve._load_case parity): metrics change vs the exam1-for-both-stages
    fallback."""
    tmp = str(tmp_path)
    man = _mk_data(tmp)
    rows = []
    import csv as _csv

    with open(man) as fh:
        rows = [dict(r) for r in _csv.DictReader(fh)]
    rng = np.random.default_rng(44)
    for i, r in enumerate(rows):
        ip2 = os.path.join(tmp, f"c{i}_img2.npy")
        np.save(ip2, rng.normal(size=(*SPATIAL, 3)).astype(np.float32))
        r["image_path_2"] = ip2
    man2 = os.path.join(tmp, "valid2.csv")
    with open(man2, "w", newline="") as fh:
        w = _csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]

    casc = M1(input_channels=3, num_classes=2, cascaded="bayes", **ARCH)
    ckpt = os.path.join(tmp, "c2.npz")
    casc.save(ckpt)
    a = evaluate.main(["--MODEL", ckpt, "--MANIFEST", man,
                       "--TRAIN_OBJ", "lesion"])
    b = evaluate.main(["--MODEL", ckpt, "--MANIFEST", man2,
                       "--TRAIN_OBJ", "lesion"])
    assert a["dice"] != b["dice"]  # the second exam was actually consumed
