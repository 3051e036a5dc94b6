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

import pytest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

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


def test_serve_oversized_group_batches(tmp_path):
    """Same-shape oversized deterministic cases run as K-case one-program
    groups (cases=K sliding window, incl. the padded final group) and match
    the single-case path voxel-for-voxel."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp)
    big = (6, 24, 24)
    man = _mk_manifest(tmp, [big, big, big])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    results = serve.run(args)
    assert len(results) == 3
    sess = serve.InferenceSession(M1.load(model_path))
    for i, r in enumerate(sorted(results, key=lambda x: x["p-id"])):
        vol = np.load(os.path.join(tmp, f"case{i}.npy"))
        want, _ = sess.predict_case(vol, sw_overlap=args.SW_OVERLAP)
        np.testing.assert_allclose(np.load(r["detection_path"]), want,
                                   atol=1e-5, rtol=1e-5)


def test_serve_data_parallel_mesh(tmp_path):
    """mesh=Mesh(data=4): the batched detect program shards its batch axis
    across the mesh and matches the single-device session voxel-for-voxel,
    including a batch (5) that needs padding to the data-axis multiple and
    an MC model sharing the same seed."""
    from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh

    tmp = str(tmp_path)
    rng = np.random.default_rng(3)
    batch = rng.normal(size=(5, *SPATIAL, 3)).astype(np.float32)
    mesh = make_mesh(n_data=4)

    model = M1.load(_mk_model(tmp))
    ref, _ = serve.InferenceSession(model)(batch)
    got, _ = serve.InferenceSession(model, mesh=mesh)(batch)
    assert got.shape == (5, *SPATIAL, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    mc = M1.load(_mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5))
    ref_m, ref_s = serve.InferenceSession(mc, mc_iter=3, seed=7)(batch)
    got_m, got_s = serve.InferenceSession(mc, mc_iter=3, seed=7,
                                          mesh=mesh)(batch)
    np.testing.assert_allclose(got_m, ref_m, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got_s, ref_s, atol=1e-5, rtol=1e-5)


def test_serve_mesh_sharded_sliding_window(tmp_path):
    """predict_cases on a mesh session rounds K up to a data-axis multiple
    and shards the K-case sliding-window program; results match the
    single-device session."""
    from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh

    tmp = str(tmp_path)
    model = M1.load(_mk_model(tmp))
    big = (6, 24, 24)
    rng = np.random.default_rng(4)
    vols = [rng.normal(size=(*big, 3)).astype(np.float32) for _ in range(3)]

    ref = serve.InferenceSession(model).predict_cases(vols, group_size=3)
    got = serve.InferenceSession(model, mesh=make_mesh(n_data=2)) \
        .predict_cases(vols, group_size=3)
    assert len(got) == 3
    for (rp, _), (gp, _) in zip(ref, got):
        np.testing.assert_allclose(gp, rp, atol=1e-5, rtol=1e-5)


def test_serve_transfer_fp16(tmp_path):
    """transfer_dtype='float16' casts outputs on device before the host
    pull (the tunnel's D2H link is ~60x slower than H2D); results match
    the fp32 session to fp16 quantization, on both the batched and the
    sliding-window paths."""
    tmp = str(tmp_path)
    model = M1.load(_mk_model(tmp))
    rng = np.random.default_rng(6)
    batch = rng.normal(size=(2, *SPATIAL, 3)).astype(np.float32)
    ref, _ = serve.InferenceSession(model)(batch)
    got, _ = serve.InferenceSession(model, transfer_dtype="float16")(batch)
    assert got.dtype == np.float32  # converted back host-side
    np.testing.assert_allclose(got, ref, atol=2e-3)

    big = rng.normal(size=(6, 24, 24, 3)).astype(np.float32)
    ref_sw, _ = serve.InferenceSession(model).predict_case(big)
    got_sw, _ = serve.InferenceSession(
        model, transfer_dtype="float16").predict_case(big)
    np.testing.assert_allclose(got_sw, ref_sw, atol=2e-3)


def test_serve_cli_data_parallel(tmp_path):
    """--DATA_PARALLEL N drives the whole manifest through the sharded
    batched program."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp)
    man = _mk_manifest(tmp, [SPATIAL] * 5)
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "8", "--DATA_PARALLEL", "4"])
    results = serve.run(args)
    assert len(results) == 5
    for r in results:
        probs = np.load(r["detection_path"])
        assert probs.shape == (*SPATIAL, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_serve_batch_size_one_oversized(tmp_path):
    """BATCH_SIZE=1 with multiple oversized cases must route through the
    single-case sliding window (group_size<2 cannot use the K-case program,
    whose cases=1 variant expects an UNBATCHED volume) — regression for the
    round-3 review finding."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp)
    big = (6, 24, 24)
    man = _mk_manifest(tmp, [big, big])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "1"])
    results = serve.run(args)
    assert len(results) == 2
    for r in results:
        probs = np.load(r["detection_path"])
        assert probs.shape == (*big, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_serve_manifest_order_preserved(tmp_path):
    """predictions.json follows manifest order even when window-sized and
    oversized cases interleave (positional consumers must not be
    misassociated)."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp)
    big = (6, 24, 24)
    man = _mk_manifest(tmp, [big, SPATIAL, big, SPATIAL, big])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    results = serve.run(args)
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    assert [r["p-id"] for r in summary] == [f"case{i}" for i in range(5)]


def test_serve_cascaded(tmp_path):
    """Cascaded checkpoints serve end-to-end (ADVICE r2 / VERDICT r2 item 7):
    window-sized batching feeds (image_1, image_2) tuples; oversized volumes
    tile both exams with identical coordinates."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp, cascaded="noisy-or")
    man = _mk_manifest(tmp, [SPATIAL, SPATIAL, (6, 24, 24)])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    results = serve.run(args)
    assert len(results) == 3
    for i, r in enumerate(results):
        probs = np.load(r["detection_path"])
        want = SPATIAL if i < 2 else (6, 24, 24)
        assert probs.shape == (*want, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


def test_serve_cascaded_second_exam_column(tmp_path):
    """image_path_2 manifest column supplies the follow-up exam
    (reference networks.py:111-112 two-input contract)."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp, cascaded="bayes")
    rng = np.random.default_rng(1)
    ip1 = os.path.join(tmp, "exam1.npy")
    ip2 = os.path.join(tmp, "exam2.npy")
    np.save(ip1, rng.normal(size=(*SPATIAL, 3)).astype(np.float32))
    np.save(ip2, rng.normal(size=(*SPATIAL, 3)).astype(np.float32))
    man = os.path.join(tmp, "test.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["p-id", "image_path", "image_path_2",
                                           "label_path", "zones_path"])
        w.writeheader()
        w.writerow({"p-id": "caseA", "image_path": ip1, "image_path_2": ip2,
                    "label_path": ip1, "zones_path": ip1})
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out])
    results = serve.run(args)
    probs = np.load(results[0]["detection_path"])
    assert probs.shape == (*SPATIAL, 2)
    # feeding a DIFFERENT second exam must change the joint prediction
    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.serve import InferenceSession

    sess = InferenceSession(M1.load(model_path))
    v1 = np.load(ip1)
    same, _ = sess.predict_case((v1, v1))
    assert not np.allclose(probs, same, atol=1e-6)


def test_serve_transfer_foreground_only(tmp_path):
    """transfer_channels='foreground' drops the softmax background channel
    on device and reconstructs it host-side (1 - sum(foreground); std
    duplicated for 2 classes) — exact on the batched, MC, sliding-window
    and cascaded paths."""
    tmp = str(tmp_path)
    rng = np.random.default_rng(8)
    batch = rng.normal(size=(2, *SPATIAL, 3)).astype(np.float32)
    big = rng.normal(size=(6, 24, 24, 3)).astype(np.float32)

    det = M1.load(_mk_model(tmp))
    ref, _ = serve.InferenceSession(det)(batch)
    got, _ = serve.InferenceSession(det, transfer_channels="foreground")(batch)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    ref_sw, _ = serve.InferenceSession(det).predict_case(big)
    got_sw, _ = serve.InferenceSession(
        det, transfer_channels="foreground").predict_case(big)
    np.testing.assert_allclose(got_sw, ref_sw, atol=1e-5, rtol=1e-5)

    mc = M1.load(_mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5))
    rm, rs = serve.InferenceSession(mc, mc_iter=3, seed=7)(batch)
    gm, gs = serve.InferenceSession(
        mc, mc_iter=3, seed=7, transfer_channels="foreground")(batch)
    np.testing.assert_allclose(gm, rm, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gs, rs, atol=1e-5, rtol=1e-5)

    # MC K-case sliding-window group
    sess_f = serve.InferenceSession(mc, mc_iter=3, seed=7,
                                    transfer_channels="foreground")
    sess_r = serve.InferenceSession(mc, mc_iter=3, seed=7)
    refs = sess_r.predict_cases([big, big], group_size=2)
    gots = sess_f.predict_cases([big, big], group_size=2)
    for (rp, ru), (gp, gu) in zip(refs, gots):
        np.testing.assert_allclose(gp, rp, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(gu, ru, atol=1e-5, rtol=1e-5)

    casc = M1.load(_mk_model(tmp, cascaded="noisy-or"))
    rc, _ = serve.InferenceSession(casc)(batch)
    gc, _ = serve.InferenceSession(
        casc, transfer_channels="foreground")(batch)
    np.testing.assert_allclose(gc, rc, atol=1e-5, rtol=1e-5)


def test_serve_transfer_foreground_multiclass(tmp_path):
    """3-class (zonal-style) models: foreground-only mean reconstruction is
    exact; MC sessions must silently fall back to full channels (the
    background std is not derivable for >2 classes)."""
    tmp = str(tmp_path)
    rng = np.random.default_rng(11)
    batch = rng.normal(size=(2, *SPATIAL, 1)).astype(np.float32)

    model = M1(
        input_spatial_dims=SPATIAL, input_channels=1, num_classes=3,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, dropout_mode="standard", summary=False)
    ref, _ = serve.InferenceSession(model)(batch)
    got, _ = serve.InferenceSession(
        model, transfer_channels="foreground")(batch)
    assert got.shape == (2, *SPATIAL, 3)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    mc3 = M1(
        input_spatial_dims=SPATIAL, input_channels=1, num_classes=3,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.5, dropout_mode="monte-carlo", summary=False)
    sess = serve.InferenceSession(mc3, mc_iter=2,
                                  transfer_channels="foreground")
    assert not sess._fg_only  # fell back: 3-class std not reconstructible
    m, s = sess(batch)
    assert m.shape == (2, *SPATIAL, 3) and s.shape == (2, *SPATIAL, 3)


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


def test_serve_mc_sliding_window_uncertainty(tmp_path):
    """Oversized MC cases run through the one-program sliding window with
    per-chunk RNG and fused mean/std — uncertainty now survives the SW path
    (the old eager fallback dropped it)."""
    tmp = str(tmp_path)
    model_path = _mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5)
    big = (6, 24, 24)
    man = _mk_manifest(tmp, [big, big])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", model_path, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--MC_ITER", "3", "--BATCH_SIZE", "2"])
    results = serve.run(args)
    assert len(results) == 2
    for r in results:
        probs = np.load(r["detection_path"])
        assert probs.shape == (*big, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
        unc = np.load(r["uncertainty_path"])
        assert unc.shape == (*big, 2)
        assert float(unc.max()) > 0.0


def test_serve_scan_chunked_matches_direct(tmp_path):
    """scan_chunk: one scan-chunked program gives the same probabilities as
    the direct batched program (deterministic path), and the MC path stays
    a valid distribution with per-chunk rng."""
    path = _mk_model(tmp_path)
    model = M1.load(path)
    batch = np.random.default_rng(3).normal(
        size=(10, *SPATIAL, 3)).astype(np.float32)

    direct, _ = serve.InferenceSession(model)(batch)
    chunked, _ = serve.InferenceSession(model, scan_chunk=4)(batch)
    np.testing.assert_allclose(chunked, direct, atol=1e-5)

    # B <= chunk: falls back to the direct program
    small, _ = serve.InferenceSession(model, scan_chunk=16)(batch)
    np.testing.assert_allclose(small, direct, atol=1e-5)

    # MC path: mean/std finite, normalized, per-chunk keys distinct
    mc_path = _mk_model(tmp_path, dropout_mode="monte-carlo",
                        dropout_rate=0.5)
    mc_model = M1.load(mc_path)
    probs, unc = serve.InferenceSession(mc_model, mc_iter=3,
                                        scan_chunk=4)(batch)
    assert probs.shape == (10, *SPATIAL, 2) and unc.shape == probs.shape
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    assert np.all(np.isfinite(unc)) and float(unc.max()) > 0


def test_serve_scan_chunked_cascaded(tmp_path):
    """scan_chunk composes with the cascaded two-exam tuple input."""
    path = _mk_model(tmp_path, cascaded="noisy-or")
    model = M1.load(path)
    batch = np.random.default_rng(4).normal(
        size=(6, *SPATIAL, 3)).astype(np.float32)
    direct, _ = serve.InferenceSession(model)(batch)
    chunked, _ = serve.InferenceSession(model, scan_chunk=2)(batch)
    np.testing.assert_allclose(chunked, direct, atol=1e-5)
