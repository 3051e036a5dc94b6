"""Fold-ensemble + test-time-augmentation tests (ensemble.py).

The reference trains one M1 per fold (train_model.py:101) and deploys the
fold ensemble via its grand-challenge container (README.md:6) — but ships no
ensembling code. ensemble.M1Ensemble runs all K members as ONE vmapped
program; ensemble.tta_detect fuses the axial LR-flip TTA into the same
program. Both are verified voxel-for-voxel against the hand-rolled math.
"""

import csv
import json
import os

import jax
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu import serve
from prostatemr_3d_cad_cspca_tpu.ensemble import (
    M1Ensemble, stack_params, tta_detect)
from prostatemr_3d_cad_cspca_tpu.models import M1

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)


def _mk_model(seed=0, **kw):
    kw.setdefault("dropout_rate", 0.0)
    kw.setdefault("dropout_mode", "standard")
    return M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        summary=False, seed=seed, **kw)


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, *SPATIAL, 3)).astype(np.float32)


def test_ensemble_mean_equals_member_mean():
    """Vmapped ensemble detect == the arithmetic mean of member predicts."""
    members = [_mk_model(seed=s) for s in (0, 1, 2)]
    ens = M1Ensemble(members)
    x = _batch()
    got = np.asarray(ens.predict(x))
    want = np.mean([np.asarray(m.predict(x)) for m in members], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)


def test_ensemble_reduce_modes():
    members = [_mk_model(seed=s) for s in (0, 1)]
    x = _batch()
    stacked = np.asarray(M1Ensemble(members, reduce=None).predict(x))
    assert stacked.shape == (2, *x.shape[:-1], 2)
    mean, std = M1Ensemble(members, reduce="mean_std").predict(x)
    np.testing.assert_allclose(np.asarray(mean), stacked.mean(0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(std), stacked.std(0), atol=1e-6)
    assert float(np.asarray(std).max()) > 0  # different seeds must disagree


def test_ensemble_scan_equals_vmap_all_reduce_modes():
    """The production scan path (O(1)-size program — the vmapped K=5
    program crashes the real chip's compile helper, class docstring) must be
    numerically identical to the vmapped path for every reduce mode."""
    members = [_mk_model(seed=s) for s in (0, 1, 2)]
    x = _batch()
    for reduce in (None, "mean", "mean_std"):
        scan = M1Ensemble(members, reduce=reduce, method="scan").predict(x)
        vmap = M1Ensemble(members, reduce=reduce, method="vmap").predict(x)
        for a, b in zip(jax.tree.leaves(scan), jax.tree.leaves(vmap)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)


def test_ensemble_scan_equals_vmap_with_rng():
    """Member rng fold_in draws must not depend on the execution method."""
    members = [_mk_model(seed=s, dropout_mode="monte-carlo",
                         dropout_rate=0.5) for s in (0, 1)]
    x = _batch(b=1, seed=3)
    key = jax.random.PRNGKey(7)
    outs = []
    for method in ("scan", "vmap"):
        ens = M1Ensemble(members, method=method)
        outs.append(np.asarray(ens.get_detect_model()(ens.params, x,
                                                      rng=key)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6, rtol=1e-6)


def test_ensemble_rejects_config_mismatch():
    a = _mk_model(seed=0)
    b = _mk_model(seed=1, dense_skip=not a.config.get("dense_skip", True))
    with pytest.raises(AssertionError, match="architecture config"):
        M1Ensemble([a, b])


def test_stack_params_roundtrip():
    members = [_mk_model(seed=s) for s in (0, 1)]
    stacked = stack_params([m.params for m in members])
    leaf = jax.tree.leaves(stacked)[0]
    single = jax.tree.leaves(members[0].params)[0]
    assert leaf.shape == (2, *single.shape)


def test_tta_detect_matches_manual_flip_average():
    """tta(detect) == (detect(x) + unflip(detect(flip_W(x)))) / 2."""
    model = _mk_model(seed=3)
    detect = model.get_detect_model()
    x = _batch(seed=5)
    got = np.asarray(tta_detect(detect)(model.params, x))
    plain = np.asarray(detect(model.params, x))
    flipped = np.asarray(detect(model.params, np.flip(x, axis=-2)))
    want = (plain + np.flip(flipped, axis=-2)) / 2
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # flips must matter: TTA differs from the plain prediction
    assert not np.allclose(got, plain, atol=1e-6)


def test_tta_is_flip_equivariant():
    """TTA output of a flipped input is the flipped TTA output — the defining
    symmetry the averaging buys."""
    model = _mk_model(seed=4)
    tta = tta_detect(model.get_detect_model())
    x = _batch(b=1, seed=6)
    a = np.asarray(tta(model.params, x))
    b = np.asarray(tta(model.params, np.flip(x, axis=-2)))
    np.testing.assert_allclose(np.flip(b, axis=-2), a, atol=1e-5, rtol=1e-5)


def test_tta_cascaded_tuple_io():
    """Cascaded models flip both exams and unflip both stage outputs."""
    model = _mk_model(seed=2, cascaded="noisy-or")
    detect = model.get_detect_model()
    x = (_batch(b=1, seed=7), _batch(b=1, seed=8))
    got = tta_detect(detect)(model.params, x)
    assert isinstance(got, tuple) and len(got) == 2
    plain = detect(model.params, x)
    fx = tuple(np.flip(v, axis=-2) for v in x)
    flipped = detect(model.params, fx)
    for g, p, f in zip(got, plain, flipped):
        want = (np.asarray(p) + np.flip(np.asarray(f), axis=-2)) / 2
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-5, rtol=1e-5)


def test_tta_rejects_channel_axis():
    with pytest.raises(AssertionError, match="flip_axes"):
        tta_detect(lambda p, x: x, flip_axes=(-1,))


def test_ensemble_mc_members_draw_independent_keys():
    """Probabilistic/MC members get fold_in-separated randomness; the
    member-mean is reproducible for a fixed key."""
    members = [_mk_model(seed=s, dropout_mode="monte-carlo",
                         dropout_rate=0.5) for s in (0, 1)]
    ens = M1Ensemble(members)
    detect = ens.get_detect_model()
    x = _batch(b=1, seed=9)
    key = jax.random.PRNGKey(11)
    a = np.asarray(detect(ens.params, x, rng=key))
    b = np.asarray(detect(ens.params, x, rng=key))
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = np.asarray(detect(ens.params, x, rng=jax.random.PRNGKey(12)))
    assert not np.allclose(a, c, atol=1e-6)  # dropout masks must differ


def _save(model, tmp, name):
    path = os.path.join(tmp, name)
    model.save(path)
    return path


def _mk_manifest(tmp, shapes):
    rng = np.random.default_rng(0)
    rows = []
    for i, shape in enumerate(shapes):
        ip = os.path.join(tmp, f"case{i}.npy")
        np.save(ip, rng.normal(size=(*shape, 3)).astype(np.float32))
        rows.append({"p-id": f"case{i}", "image_path": ip,
                     "label_path": ip, "zones_path": ip})
    man = os.path.join(tmp, "test.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    return man


def test_ensemble_on_data_parallel_mesh():
    """Fold ensemble + data-parallel serving compose: the vmapped-member
    program shards its batch axis over a Mesh(data=4) and matches the
    single-device ensemble voxel-for-voxel (incl. a padded batch of 5)."""
    from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh

    members = [_mk_model(seed=s) for s in (0, 1)]
    ens = M1Ensemble(members)
    batch = _batch(b=5, seed=10)
    ref, _ = serve.InferenceSession(ens)(batch)
    got, _ = serve.InferenceSession(ens, mesh=make_mesh(n_data=4))(batch)
    assert got.shape == (5, *SPATIAL, 2)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_serve_fold_ensemble_and_tta(tmp_path):
    """End-to-end: comma-separated --MODEL fold checkpoints + --TTA 1 serve
    through the batched AND sliding-window paths; batched outputs equal the
    hand-rolled mean-of-members-with-flip-TTA."""
    tmp = str(tmp_path)
    members = [_mk_model(seed=s) for s in (0, 1)]
    paths = [_save(m, tmp, f"fold{i}.npz") for i, m in enumerate(members)]
    man = _mk_manifest(tmp, [SPATIAL, SPATIAL, (6, 24, 24)])
    out = os.path.join(tmp, "out")
    args = serve.build_parser().parse_args([
        "--MODEL", ",".join(paths), "--MANIFEST", man, "--OUTPUT_DIR", out,
        "--BATCH_SIZE", "2", "--TTA", "1"])
    results = serve.run(args)
    assert len(results) == 3
    with open(os.path.join(out, "predictions.json")) as f:
        summary = json.load(f)
    assert [r["p-id"] for r in summary] == [f"case{i}" for i in range(3)]
    for i, r in enumerate(summary):
        probs = np.load(r["detection_path"])
        want_shape = SPATIAL if i < 2 else (6, 24, 24)
        assert probs.shape == (*want_shape, 2)
        np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)

    # voxel parity on a window-sized case: serve output == manual math
    x = np.load(os.path.join(tmp, "case0.npy"))[None]
    views = [x, np.flip(x, axis=-2)]
    acc = []
    for m in members:
        det = m.get_detect_model()
        acc.append(np.asarray(det(m.params, views[0])))
        acc.append(np.flip(np.asarray(det(m.params, views[1])), axis=-2))
    want = np.mean(acc, axis=0)[0]
    got = np.load(summary[0]["detection_path"])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
