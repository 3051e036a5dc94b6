"""Full-workflow integration: raw volumes -> ingest -> train (CLI) ->
evaluate -> AOT export -> serve-from-artifact, each stage consuming the
previous stage's real outputs. Catches interface drift between the five
drivers that the per-module tests cannot.
"""

import csv
import json
import os

import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu import cli, evaluate, serve
from prostatemr_3d_cad_cspca_tpu import export as exp
from prostatemr_3d_cad_cspca_tpu.data import ingest
from prostatemr_3d_cad_cspca_tpu.data.manifest import read_manifest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)


def test_raw_to_serving_pipeline(tmp_path):
    tmp = str(tmp_path)
    raw = os.path.join(tmp, "raw")
    os.makedirs(raw)

    # --- stage 0: raw cases (anisotropic, need resampling + crop) ----------
    rng = np.random.default_rng(5)
    rows = []
    for i in range(4):
        img = (rng.normal(size=(4, 8, 8, 3)) * 30 + 100).astype(np.float32)
        lab = np.zeros((4, 8, 8), np.float32)
        lab[1:3, 2:6, 2:6] = 2.0
        ip, lp, zp = [os.path.join(raw, f"c{i}_{k}.npy")
                      for k in ("img", "lab", "zon")]
        np.save(ip, img)
        np.save(lp, lab)
        np.save(zp, (lab > 0).astype(np.uint8))
        rows.append({"p-id": f"c{i}", "image_path": ip, "label_path": lp,
                     "zones_path": zp, "spacing": "3.0x1.0x1.0"})
    man = os.path.join(raw, "raw.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]

    # --- stage 1: ingest -> feed + 2-fold manifests ------------------------
    feed = os.path.join(tmp, "feed")
    ingest.main(["--MANIFEST", man, "--OUTPUT_DIR", feed,
                 "--SPACING", "3.0", "0.5", "0.5",
                 "--SIZE", "4", "16", "16", "--FOLDS", "2"])
    tr = read_manifest(os.path.join(feed, "train-fold-1.csv"))
    assert np.load(tr[0]["image_path"]).shape == (*SPATIAL, 3)

    # --- stage 2: train via the reference-surface CLI ----------------------
    wdir = os.path.join(tmp, "weights")
    cli.main([
        "--TRAIN_OBJ", "lesion", "--NUM_EPOCHS", "2", "--FOLDS", "0",
        "--TRAIN_XLSX_PREFIX", os.path.join(feed, "train-fold-"),
        "--VALID_XLSX_PREFIX", os.path.join(feed, "valid-fold-"),
        "--WEIGHTS_DIR", wdir + os.sep, "--NAME", "e2e",
        "--UNET_FEATURE_CHANNELS", "4", "8", "12", "16", "24",
        "--UNET_SE_REDUCTION", "2", "2", "2", "2", "2",
        "--BATCH_SIZE", "2", "--GPU_DEVICE_IDs", "0,1",
        "--WEIGHTS_MIN_EPOCH", "0",
        "--STORE_WEIGHTS_PER_N_EPOCHS", "1"])
    ckpt = os.path.join(wdir, "e2e", "F1", "model_weights_002.npz")
    assert os.path.exists(ckpt)

    # --- stage 3: evaluate the trained checkpoint on the held-out fold -----
    metrics = evaluate.main([
        "--MODEL", ckpt,
        "--MANIFEST", os.path.join(feed, "valid-fold-1.csv"),
        "--TRAIN_OBJ", "lesion",
        "--OUTPUT", os.path.join(tmp, "metrics.json")])
    assert metrics["cases"] == 2 and 0.0 <= metrics["dice"] <= 1.0

    # --- stage 4: freeze into an AOT artifact ------------------------------
    art = exp.main(["--MODEL", ckpt, "--OUT", os.path.join(tmp, "m1.zip"),
                    "--PLATFORMS", "cpu"])

    # --- stage 5: serve the artifact on the validation cases ---------------
    out = os.path.join(tmp, "preds")
    results = serve.run(serve.build_parser().parse_args([
        "--MODEL", art,
        "--MANIFEST", os.path.join(feed, "valid-fold-1.csv"),
        "--OUTPUT_DIR", out, "--BATCH_SIZE", "2"]))
    assert len(results) == 2
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    det = np.load(results[0]["detection_path"])
    assert det.shape == (*SPATIAL, 2)
    np.testing.assert_allclose(det.sum(-1), 1.0, atol=1e-4)  # softmax
    assert {r["p-id"] for r in summary} == \
        {r["p-id"] for r in read_manifest(
            os.path.join(feed, "valid-fold-1.csv"))}
