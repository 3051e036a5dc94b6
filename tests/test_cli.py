"""End-to-end CLI drives (cli.main) — the reference's train_model.py surface.

The lesion objective is exercised end-to-end by the repo verification
recipe and tests/test_fit_surface.py; this file drives the OTHER training
objective the reference supports — zonal anatomy segmentation
(``--TRAIN_OBJ zonal``: 1-channel T2W input, 3 classes WG/TZ/PZ,
reference train_model.py:145-146, data_generators.py:53-64) — through the
full CLI: manifest -> zonal label prep -> fused augmentation -> training ->
AnatomySegmentationValidation -> WeightsSaver -> metrics JSONL + history.
"""

import csv
import json
import os

import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu import cli

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)


def _mk_zonal_dataset(tmp):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        img = rng.normal(size=(*SPATIAL, 1)).astype(np.float32)
        zones = np.zeros(SPATIAL, np.uint8)
        zones[1:3, 4:8, 4:8] = 1   # TZ
        zones[1:3, 9:13, 9:13] = 2  # PZ
        ip = os.path.join(tmp, f"case{i}_img.npy")
        zp = os.path.join(tmp, f"case{i}_zones.npy")
        np.save(ip, img)
        np.save(zp, zones)
        rows.append({"p-id": f"case{i}", "image_path": ip,
                     "label_path": zp, "zones_path": zp})
    for name in ("train-fold-1.csv", "valid-fold-1.csv"):
        with open(os.path.join(tmp, name), "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0]))
            w.writeheader()
            [w.writerow(r) for r in rows]


def test_cli_zonal_end_to_end(tmp_path):
    tmp = str(tmp_path)
    _mk_zonal_dataset(tmp)
    wdir = os.path.join(tmp, "weights")
    mdir = os.path.join(tmp, "metrics")
    cli.main([
        "--TRAIN_OBJ", "zonal", "--NUM_EPOCHS", "2", "--FOLDS", "0",
        "--TRAIN_XLSX_PREFIX", os.path.join(tmp, "train-fold-"),
        "--VALID_XLSX_PREFIX", os.path.join(tmp, "valid-fold-"),
        "--WEIGHTS_DIR", wdir + "/", "--NAME", "zrun",
        "--UNET_FEATURE_CHANNELS", "4", "8", "12", "16", "24",
        "--UNET_SE_REDUCTION", "2", "2", "2", "2", "2",
        "--BATCH_SIZE", "2",
        # the test env exposes 8 virtual CPU devices; batch 2 must divide
        # the data axis (reference batch-divisibility contract,
        # train_model.py:170)
        "--GPU_DEVICE_IDs", "0,1",
        "--WEIGHTS_MIN_EPOCH", "1", "--STORE_WEIGHTS_PER_N_EPOCHS", "1",
        "--VALIDATE_MIN_EPOCH", "1", "--VALIDATE_PER_N_EPOCHS", "1",
        "--METRICS_DIR", mdir,
        # anatomy recipe: 3-class focal alpha (train_model.py:148-149)
        "--FOCAL_LOSS_ALPHA", "1", "1", "1",
    ])

    # weights saved per epoch; checkpoint loads as a 3-class 1-channel model
    ckpt = os.path.join(wdir, "zrun", "F1", "model_weights_002.npz")
    assert os.path.exists(ckpt)
    from prostatemr_3d_cad_cspca_tpu.models import M1

    model = M1.load(ckpt)
    assert model.num_classes == 3
    assert model.input_channels == 1
    probs = np.asarray(model.predict(
        np.load(os.path.join(tmp, "case0_img.npy"))[None]))
    assert probs.shape == (1, *SPATIAL, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    # metrics JSONL has 2 train epochs + validation rows with zonal Dice
    mfile = os.path.join(mdir, "zrun", "F1", "metrics.jsonl")
    assert os.path.exists(mfile)
    recs = [json.loads(l) for l in open(mfile)]
    epochs = [r for r in recs if r.get("event") == "epoch"]
    vals = [r for r in recs if r.get("event") == "validation"]
    assert len(epochs) == 2
    assert len(vals) >= 1
    # history.json persisted (Keras History parity)
    hist = json.load(open(os.path.join(mdir, "zrun", "F1", "history.json")))
    assert len(hist["loss"]) == 2
