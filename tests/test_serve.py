"""Serving driver tests (serve.py): checkpoint -> manifest -> predictions.

The reference deployed via grand-challenge containers with no shipped
serving code (README.md:6); serve.py is that engine. Covers: batched
window-sized cases, sliding-window for oversized volumes, MC uncertainty,
and the summary JSON contract.
"""

import csv
import json
import os

import jax
import numpy as np

from prostatemr_3d_cad_cspca_tpu import serve
from prostatemr_3d_cad_cspca_tpu.models import M1

SPATIAL = (4, 16, 16)


def _mk_model(tmp_path, **kw):
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("dropout_mode", "standard")
    model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        summary=False, **kw)
    path = os.path.join(tmp_path, "model.npz")
    model.save(path)
    return path


def _mk_manifest(tmp_path, shapes):
    rng = np.random.default_rng(0)
    rows = []
    for i, shape in enumerate(shapes):
        ip = os.path.join(tmp_path, f"case{i}.npy")
        np.save(ip, rng.normal(size=(*shape, 3)).astype(np.float32))
        rows.append({"p-id": f"case{i}", "image_path": ip,
                     "label_path": ip, "zones_path": ip})
    man = os.path.join(tmp_path, "test.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    return man


def test_serve_batched_and_sliding_window(tmp_path):
    tmp = str(tmp_path)
    model_path = _mk_model(tmp)
    man = _mk_manifest(tmp, [SPATIAL, SPATIAL, SPATIAL, (6, 24, 24)])
    out = os.path.join(tmp, "out")

    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    results = serve.run(args)
    assert len(results) == 4
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    assert [r["p-id"] for r in summary] == [f"case{i}" for i in range(4)]
    for i, r in enumerate(summary):
        probs = np.load(r["detection_path"])
        want = SPATIAL if i < 3 else (6, 24, 24)
        assert probs.shape == (*want, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
        assert 0.0 <= r["case_score"] <= 1.0


def test_serve_mc_uncertainty(tmp_path):
    tmp = str(tmp_path)
    model_path = _mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5)
    man = _mk_manifest(tmp, [SPATIAL])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--MC_ITER", "3"])
    results = serve.run(args)
    unc = np.load(results[0]["uncertainty_path"])
    assert unc.shape == (*SPATIAL, 2)
    assert float(unc.max()) > 0.0  # MC dropout must induce variance
