"""AOT export tests (export.py): checkpoint -> serialized StableHLO artifact
-> model-code-free inference.

The reference ships trained models inside a grand-challenge container
(reference README.md:6); export.py freezes the same contract into one
portable jax.export artifact. Covers: every model class (deterministic,
MC-dropout, probabilistic, cascaded, fold ensemble), symbolic vs fixed
batch, rng determinism, output parity vs the live model, and the CLI.
"""

import os

import jax
import numpy as np

import pytest

from prostatemr_3d_cad_cspca_tpu import export as exp
from prostatemr_3d_cad_cspca_tpu.models import M1

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)


def _mk_model(tmp_path, **kw):
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("dropout_mode", "standard")
    kw.setdefault("input_channels", 3)
    model = M1(
        input_spatial_dims=SPATIAL, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        summary=False, **kw)
    path = os.path.join(tmp_path, "model.npz")
    model.save(path)
    return model, path


def test_export_deterministic_symbolic_batch(tmp_path):
    tmp = str(tmp_path)
    model, _ = _mk_model(tmp)
    art = os.path.join(tmp, "m1.zip")
    exp.export_model(model, art, platforms=("cpu",))

    loaded = exp.ExportedModel.load(art)
    assert not loaded.needs_rng and loaded.num_classes == 2

    rng = np.random.default_rng(0)
    for b in (1, 3):  # symbolic batch: one artifact, any batch
        x = rng.normal(size=(b, *SPATIAL, 3)).astype(np.float32)
        got = loaded.predict(x)
        ref = np.asarray(model.predict(x), np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_export_fixed_batch_and_transfer_dtype(tmp_path):
    tmp = str(tmp_path)
    model, _ = _mk_model(tmp)
    art = os.path.join(tmp, "m1_b2.zip")
    exp.export_model(model, art, platforms=("cpu",), batch=2,
                     transfer_dtype="float16")
    loaded = exp.ExportedModel.load(art)

    x = np.random.default_rng(1).normal(size=(2, *SPATIAL, 3)) \
        .astype(np.float32)
    got = loaded.predict(x)
    ref = np.asarray(model.predict(x), np.float32)
    assert got.dtype == np.float32  # host-side fp32, fp16 on the wire
    np.testing.assert_allclose(got, ref, atol=2e-3)
    with pytest.raises(ValueError, match="fixed batch 2"):
        loaded.predict(x[:1])


def test_export_mc_dropout_mean_std(tmp_path):
    tmp = str(tmp_path)
    model, _ = _mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5)
    art = os.path.join(tmp, "mc.zip")
    exp.export_model(model, art, platforms=("cpu",), mc_iter=3)
    loaded = exp.ExportedModel.load(art)
    assert loaded.meta["output"] == "mean_std"

    x = np.random.default_rng(2).normal(size=(2, *SPATIAL, 3)) \
        .astype(np.float32)
    key = jax.random.PRNGKey(7)
    mean, std = loaded.predict(x, rng=key)
    assert mean.shape == (2, *SPATIAL, 2) and std.shape == mean.shape
    # same key -> identical draw; mirrors serve's mc_predict composition
    from prostatemr_3d_cad_cspca_tpu.infer import mc_predict

    rm, rs = mc_predict(model.get_detect_model(), model.params, x, key,
                        num_samples=3, reduce="mean_std")
    np.testing.assert_allclose(mean, np.asarray(rm, np.float32), atol=1e-5)
    np.testing.assert_allclose(std, np.asarray(rs, np.float32), atol=1e-5)
    # self-advancing internal key: two rng-free calls differ
    a, _ = loaded.predict(x)
    b, _ = loaded.predict(x)
    assert not np.allclose(a, b, atol=1e-6)


def test_export_probabilistic_and_cascaded(tmp_path):
    tmp = str(tmp_path)
    # probabilistic input = image + num_classes-1 label channels
    # (reference data_generators.py:77-84)
    prob, _ = _mk_model(tmp, probabilistic=True, input_channels=4,
                        prob_latent_dims=(2, 1, 0, 0))
    art = os.path.join(tmp, "prob.zip")
    exp.export_model(prob, art, platforms=("cpu",))
    loaded = exp.ExportedModel.load(art)
    x = np.random.default_rng(3).normal(
        size=(2, *SPATIAL, 4)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    got = loaded.predict(x, rng=key)
    ref = np.asarray(prob.predict(x, rng=key), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    casc, _ = _mk_model(tmp, cascaded="noisy-or")
    cart = os.path.join(tmp, "casc.zip")
    exp.export_model(casc, cart, platforms=("cpu",))
    cl = exp.ExportedModel.load(cart)
    xc = np.random.default_rng(4).normal(size=(2, *SPATIAL, 6)) \
        .astype(np.float32)
    got = cl.predict(xc)  # stacked two-exam channels, final-stage output
    ref = casc.get_detect_model()(
        casc.params, (xc[..., :3], xc[..., 3:]))[-1]
    np.testing.assert_allclose(got, np.asarray(ref, np.float32), atol=1e-5)


def test_export_cli_ensemble_with_tta(tmp_path):
    tmp = str(tmp_path)
    d1, d2 = os.path.join(tmp, "f1"), os.path.join(tmp, "f2")
    os.mkdir(d1)
    os.mkdir(d2)
    _, p1 = _mk_model(d1)
    _, p2 = _mk_model(d2)
    art = os.path.join(tmp, "ens.zip")
    out = exp.main(["--MODEL", f"{p1},{p2}", "--OUT", art,
                    "--PLATFORMS", "cpu", "--TTA", "1"])
    loaded = exp.ExportedModel.load(out)
    assert loaded.meta["num_members"] == 2 and loaded.meta["tta"]

    from prostatemr_3d_cad_cspca_tpu.ensemble import M1Ensemble, tta_detect

    ens = M1Ensemble.load([p1, p2])
    x = np.random.default_rng(6).normal(size=(2, *SPATIAL, 3)) \
        .astype(np.float32)
    got = loaded.predict(x)
    ref = tta_detect(ens.get_detect_model())(ens.params, x)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32), atol=1e-5)


def test_serve_from_artifact(tmp_path):
    """serve.run with --MODEL artifact.zip: window-sized cases served from
    the frozen program (same outputs as checkpoint serving), oversized
    volumes rejected with a clear error, inert flags noted."""
    import csv
    import json

    from prostatemr_3d_cad_cspca_tpu import serve

    tmp = str(tmp_path)
    model, ckpt = _mk_model(tmp, dropout_mode="monte-carlo",
                            dropout_rate=0.5)
    art = os.path.join(tmp, "m1.zip")
    exp.export_model(model, art, platforms=("cpu",), mc_iter=2)

    rng = np.random.default_rng(9)
    rows = []
    for i, shape in enumerate([SPATIAL, SPATIAL, SPATIAL]):
        ip = os.path.join(tmp, f"case{i}.npy")
        np.save(ip, rng.normal(size=(*shape, 3)).astype(np.float32))
        rows.append({"p-id": f"case{i}", "image_path": ip,
                     "label_path": ip, "zones_path": ip})
    man = os.path.join(tmp, "test.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]

    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", art, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2", "--SEED", "3"])
    results = serve.run(args)
    assert len(results) == 3
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    assert [r["p-id"] for r in summary] == [f"case{i}" for i in range(3)]
    det = np.load(results[0]["detection_path"])
    assert det.shape == (*SPATIAL, 2)
    assert "uncertainty_path" in results[0]  # mc_iter=2 baked in

    # checkpoint serving with the same seed/mc_iter gives the same voxels
    out2 = os.path.join(tmp, "out2")
    args2 = serve.build_parser().parse_args([
        "--MODEL", ckpt, "--MANIFEST", man, "--OUTPUT_DIR", out2,
        "--BATCH_SIZE", "2", "--MC_ITER", "2", "--SEED", "3"])
    ref = serve.run(args2)
    np.testing.assert_allclose(det, np.load(ref[0]["detection_path"]),
                               atol=1e-5, rtol=1e-5)

    # oversized volume -> clear error (no silent sliding-window fallback)
    big = os.path.join(tmp, "big.npy")
    np.save(big, rng.normal(size=(6, 24, 24, 3)).astype(np.float32))
    rows.append({"p-id": "big", "image_path": big, "label_path": big,
                 "zones_path": big})
    man2 = os.path.join(tmp, "test2.csv")
    with open(man2, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    args3 = serve.build_parser().parse_args([
        "--MODEL", art, "--MANIFEST", man2, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    with pytest.raises(ValueError, match="live checkpoint"):
        serve.run(args3)


def test_exported_session_fixed_batch_padding(tmp_path):
    """ExportedSession pads short batches up to a fixed-batch artifact's
    size and strips the padding; over-full batches raise."""
    from prostatemr_3d_cad_cspca_tpu.serve import ExportedSession

    tmp = str(tmp_path)
    model, _ = _mk_model(tmp)
    art = os.path.join(tmp, "m1_b4.zip")
    exp.export_model(model, art, platforms=("cpu",), batch=4)
    sess = ExportedSession(exp.ExportedModel.load(art))

    x = np.random.default_rng(12).normal(size=(2, *SPATIAL, 3)) \
        .astype(np.float32)
    probs, unc = sess(x)
    assert probs.shape == (2, *SPATIAL, 2) and unc is None
    ref = np.asarray(model.predict(x), np.float32)
    np.testing.assert_allclose(probs, ref, atol=1e-5, rtol=1e-5)

    big = np.random.default_rng(13).normal(size=(5, *SPATIAL, 3)) \
        .astype(np.float32)
    with pytest.raises(ValueError, match="fixed batch 4"):
        sess(big)


def test_export_sliding_window_programs(tmp_path):
    """sw_shapes bakes one-program sliding-window pipelines into the
    artifact: whole-case outputs match the live InferenceSession voxel-
    for-voxel (same seed), the case axis is symbolic, and unknown
    geometries raise with the available list."""
    from prostatemr_3d_cad_cspca_tpu import serve

    tmp = str(tmp_path)
    model, ckpt = _mk_model(tmp)
    art = os.path.join(tmp, "m1sw.zip")
    exp.export_model(model, art, platforms=("cpu",),
                     sw_shapes=[(6, 24, 24)])
    loaded = exp.ExportedModel.load(art)
    assert loaded.sw_geometries == [(6, 24, 24)]

    rng = np.random.default_rng(20)
    vols = [rng.normal(size=(6, 24, 24, 3)).astype(np.float32)
            for _ in range(3)]
    got = loaded.predict_cases(vols)  # symbolic case axis: 3 cases at once
    ref_sess = serve.InferenceSession(M1.load(ckpt))
    refs = ref_sess.predict_cases(vols, group_size=3)
    for (gp, gu), (rp, ru) in zip(got, refs):
        assert gu is None and ru is None
        np.testing.assert_allclose(gp, rp, atol=1e-4, rtol=1e-4)

    with pytest.raises(ValueError, match="no sliding-window program"):
        loaded.predict_cases([rng.normal(size=(8, 24, 24, 3))
                              .astype(np.float32)])


def test_serve_artifact_sliding_window_mc(tmp_path):
    """serve.run with an artifact that carries SW programs: oversized MC
    cases route through the exported pipeline end-to-end."""
    import csv
    import json

    from prostatemr_3d_cad_cspca_tpu import serve

    tmp = str(tmp_path)
    model, _ = _mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5)
    art = os.path.join(tmp, "mcsw.zip")
    exp.export_model(model, art, platforms=("cpu",), mc_iter=2,
                     sw_shapes=[(6, 24, 24)])

    rng = np.random.default_rng(21)
    rows = []
    for i, shape in enumerate([SPATIAL, (6, 24, 24), (6, 24, 24)]):
        ip = os.path.join(tmp, f"case{i}.npy")
        np.save(ip, rng.normal(size=(*shape, 3)).astype(np.float32))
        rows.append({"p-id": f"case{i}", "image_path": ip,
                     "label_path": ip, "zones_path": ip})
    man = os.path.join(tmp, "test.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]

    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", art, "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2"])
    results = serve.run(args)
    assert len(results) == 3
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    assert [r["p-id"] for r in summary] == [f"case{i}" for i in range(3)]
    for r in results:
        pid = r["p-id"]
        det = np.load(r["detection_path"])
        want = SPATIAL if pid == "case0" else (6, 24, 24)
        assert det.shape == (*want, 2)
        assert "uncertainty_path" in r  # mc_iter=2 baked in (both paths)
        assert np.all(np.isfinite(det))


def test_exported_session_mixed_geometries(tmp_path):
    """ExportedSession.predict_cases groups mixed-geometry cases by shape
    (results aligned with input order) and pads partial groups."""
    from prostatemr_3d_cad_cspca_tpu.serve import ExportedSession

    tmp = str(tmp_path)
    model, _ = _mk_model(tmp)
    art = os.path.join(tmp, "multi.zip")
    exp.export_model(model, art, platforms=("cpu",),
                     sw_shapes=[(6, 24, 24), (8, 20, 20)])
    loaded = exp.ExportedModel.load(art)
    sess = ExportedSession(loaded)

    rng = np.random.default_rng(30)
    vols = [rng.normal(size=(6, 24, 24, 3)).astype(np.float32),
            rng.normal(size=(8, 20, 20, 3)).astype(np.float32),
            rng.normal(size=(6, 24, 24, 3)).astype(np.float32)]
    got = sess.predict_cases(vols, group_size=2)
    assert len(got) == 3
    # per-shape reference calls, order-aligned
    ref0 = loaded.predict_cases([vols[0], vols[2]])
    ref1 = loaded.predict_cases([vols[1]])
    np.testing.assert_allclose(got[0][0], ref0[0][0], atol=1e-6)
    np.testing.assert_allclose(got[2][0], ref0[1][0], atol=1e-6)
    np.testing.assert_allclose(got[1][0], ref1[0][0], atol=1e-6)
    assert got[0][0].shape == (6, 24, 24, 2)
    assert got[1][0].shape == (8, 20, 20, 2)


def test_export_cli_validate_gate(tmp_path, capsys):
    """--VALIDATE (default on) reloads the artifact and checks a random
    forward against the live model; MC artifacts validate under a shared
    key; transfer_dtype widens the tolerance."""
    tmp = str(tmp_path)
    _, ckpt = _mk_model(tmp, dropout_mode="monte-carlo", dropout_rate=0.5)
    art = os.path.join(tmp, "v.zip")
    exp.main(["--MODEL", ckpt, "--OUT", art, "--PLATFORMS", "cpu",
              "--MC_ITER", "2", "--TRANSFER_DTYPE", "float16"])
    assert "Validated: artifact == live model" in capsys.readouterr().out
