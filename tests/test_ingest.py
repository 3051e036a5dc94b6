"""Ingest driver tests (data/ingest.py): raw volumes -> preprocessed feed
-> fold manifests consumable by the training CLI.

The reference ships preprocessing functions but no driver (its feed xlsx
files point at already-processed volumes); ingest.py is that missing
driver. Fast tier: numpy only, no model compiles.
"""

import csv
import os

import numpy as np

from prostatemr_3d_cad_cspca_tpu.data import ingest
from prostatemr_3d_cad_cspca_tpu.data.manifest import read_manifest
from prostatemr_3d_cad_cspca_tpu.data.preprocess import resample_volume


def _mk_raw(tmp, n=6, shape=(10, 40, 40), spacing=None, npz=False):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        ip = os.path.join(tmp, f"raw{i}_img" + (".npz" if npz else ".npy"))
        lp = os.path.join(tmp, f"raw{i}_lab.npy")
        zp = os.path.join(tmp, f"raw{i}_zon.npy")
        img = rng.normal(size=(*shape, 3)).astype(np.float32) * 50 + 200
        lab = np.zeros(shape, np.uint8)
        lab[4:6, 10:22, 10:22] = 2
        zon = (lab > 0).astype(np.uint8)
        if npz:
            np.savez(ip, image=img, spacing=np.asarray(spacing, np.float32))
        else:
            np.save(ip, img)
        np.save(lp, lab)
        np.save(zp, zon)
        row = {"p-id": f"raw{i}", "image_path": ip, "label_path": lp,
               "zones_path": zp}
        if spacing is not None and not npz:
            row["spacing"] = "x".join(str(s) for s in spacing)
        rows.append(row)
    man = os.path.join(tmp, "raw.csv")
    with open(man, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    return man


def test_resample_volume_semantics():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(8, 20, 20)).astype(np.float32)
    out = resample_volume(vol, (3.0, 1.0, 1.0), (3.0, 0.5, 0.5))
    # reference size formula: round(extent * in/out) per axis
    assert out.shape == (8, 40, 40)
    # constant fields are resampling-invariant
    const = resample_volume(np.full((6, 10, 10), 7.0, np.float32),
                            (3.0, 1.0, 1.0), (2.0, 0.5, 0.5))
    np.testing.assert_allclose(const, 7.0, atol=1e-4)
    # labels: nearest-neighbor keeps the class-id set intact
    lab = np.zeros((6, 10, 10), np.uint8)
    lab[2:4, 3:7, 3:7] = 2
    rl = resample_volume(lab, (3.0, 1.0, 1.0), (1.5, 0.5, 0.5),
                         is_label=True)
    assert rl.shape == (12, 20, 20) and rl.dtype == np.uint8
    assert set(np.unique(rl)) == {0, 2}
    # multi-channel: channel axis untouched
    mc = resample_volume(rng.normal(size=(4, 8, 8, 3)).astype(np.float32),
                         (1.0, 1.0, 1.0), (1.0, 0.5, 0.5))
    assert mc.shape == (4, 16, 16, 3)


def test_ingest_end_to_end_fold_manifests(tmp_path):
    tmp = str(tmp_path)
    man = _mk_raw(tmp, n=6)
    out = os.path.join(tmp, "feed")
    written = ingest.main(["--MANIFEST", man, "--OUTPUT_DIR", out,
                           "--SIZE", "8", "32", "32", "--FOLDS", "3"])
    assert len(written) == 6  # 3 folds x train+valid
    pids_seen = set()
    for f in (1, 2, 3):
        tr = read_manifest(os.path.join(out, f"train-fold-{f}.csv"))
        va = read_manifest(os.path.join(out, f"valid-fold-{f}.csv"))
        assert len(tr) == 4 and len(va) == 2
        assert not {r["p-id"] for r in tr} & {r["p-id"] for r in va}
        pids_seen |= {r["p-id"] for r in va}
    assert len(pids_seen) == 6  # every case held out exactly once

    row = read_manifest(os.path.join(out, "train-fold-1.csv"))[0]
    img = np.load(row["image_path"])
    lab = np.load(row["label_path"])
    zon = np.load(row["zones_path"])
    assert img.shape == (8, 32, 32, 3) and img.dtype == np.float32
    assert lab.shape == (8, 32, 32) and set(np.unique(lab)) <= {0, 2}
    assert zon.shape == (8, 32, 32)
    # per-channel whitening: each sequence ~zero-mean (crop kept all voxels
    # of the padded region too, so just sanity-bound the scale)
    assert abs(float(img.mean())) < 1.0 and 0.1 < float(img.std()) < 2.0


def test_ingest_with_resampling_spacing_column(tmp_path):
    tmp = str(tmp_path)
    man = _mk_raw(tmp, n=2, shape=(10, 20, 20), spacing=(3.0, 1.0, 1.0))
    out = os.path.join(tmp, "feed")
    ingest.main(["--MANIFEST", man, "--OUTPUT_DIR", out,
                 "--SIZE", "10", "40", "40",
                 "--SPACING", "3.0", "0.5", "0.5", "--FOLDS", "0"])
    rows = read_manifest(os.path.join(out, "cases.csv"))
    assert len(rows) == 2
    img = np.load(rows[0]["image_path"])
    lab = np.load(rows[0]["label_path"])
    # (10,20,20)@(3,1,1)mm -> (10,40,40)@(3,.5,.5)mm: no crop/pad needed
    assert img.shape == (10, 40, 40, 3)
    assert lab.shape == (10, 40, 40) and set(np.unique(lab)) == {0, 2}


def test_ingest_npz_embedded_spacing(tmp_path):
    tmp = str(tmp_path)
    man = _mk_raw(tmp, n=2, shape=(6, 16, 16), spacing=(3.0, 1.0, 1.0),
                  npz=True)
    out = os.path.join(tmp, "feed")
    ingest.main(["--MANIFEST", man, "--OUTPUT_DIR", out,
                 "--SIZE", "6", "32", "32",
                 "--SPACING", "3.0", "0.5", "0.5", "--FOLDS", "0"])
    rows = read_manifest(os.path.join(out, "cases.csv"))
    img = np.load(rows[0]["image_path"])
    assert img.shape == (6, 32, 32, 3)  # npz spacing drove the resample
    # the case's plain-.npy label/zones MUST resample with the image's
    # embedded spacing (co-registered volumes) — not just get zero-padded
    lab = np.load(rows[0]["label_path"])
    assert lab.shape == (6, 32, 32) and set(np.unique(lab)) == {0, 2}
    # label blob area scales ~4x with the in-plane upsample, which the
    # pad-only bug could not produce (pad keeps the voxel count)
    raw_lab_voxels = int((np.load(os.path.join(tmp, "raw0_lab.npy")) > 0).sum())
    assert int((lab > 0).sum()) > 2.5 * raw_lab_voxels


def test_ingest_error_paths(tmp_path):
    import pytest

    tmp = str(tmp_path)
    # contradictory manifest-vs-npz spacing
    man = _mk_raw(tmp, n=2, shape=(6, 16, 16), spacing=(3.0, 1.0, 1.0),
                  npz=True)
    import csv

    rows = read_manifest(man)
    for r in rows:
        r["spacing"] = "3.0x2.0x2.0"  # disagrees with embedded (3,1,1)
    man2 = os.path.join(tmp, "raw2.csv")
    with open(man2, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0]))
        w.writeheader()
        [w.writerow(r) for r in rows]
    with pytest.raises(ValueError, match="contradicts"):
        ingest.main(["--MANIFEST", man2, "--OUTPUT_DIR",
                     os.path.join(tmp, "f1"), "--SIZE", "6", "16", "16",
                     "--SPACING", "3.0", "0.5", "0.5", "--FOLDS", "0"])

    # more folds than cases -> empty validation shards must be refused
    few = os.path.join(tmp, "few")
    os.makedirs(few)
    man3 = _mk_raw(few, n=3)
    with pytest.raises(ValueError, match="at least 5 cases"):
        ingest.main(["--MANIFEST", man3, "--OUTPUT_DIR",
                     os.path.join(tmp, "f2"), "--SIZE", "8", "32", "32",
                     "--FOLDS", "5"])

    # ambiguous npz (no 'image' key, two candidate arrays)
    amb = os.path.join(tmp, "amb.npz")
    np.savez(amb, a=np.zeros((4, 8, 8), np.float32),
             b=np.zeros((4, 8, 8), np.float32))
    with pytest.raises(ValueError, match="ambiguous npz"):
        ingest.ingest_case({"p-id": "x", "image_path": amb,
                            "label_path": "", "zones_path": ""},
                           tmp, size=(4, 8, 8))


def test_resample_analytic_field_bound():
    """Quantified resample parity (VERDICT r3 item 6): on a band-limited
    analytic field sampled at the reference's bpMRI spacings, the resampled
    volume matches the TRUE field values at the reference's exact sample
    locations (output voxel i at physical i*out_spacing, origin unchanged —
    reference preprocess.py:52-71) to <0.3% of the field amplitude
    (measured: rel_max 2.0e-3, rel_mean 2.9e-4 — docs/PARITY.md).

    This bounds the total voxel delta vs a perfect resampler under the
    sitk convention: interpolation error of our cubic B-spline (which
    sitkBSpline shares — same interpolating-spline family; it dominates
    this bound at ~7 samples/wavelength on the coarse axis) PLUS any
    coordinate-convention mismatch. The old zoom(grid_mode=True) convention
    carried a (out-in)/2 grid-alignment offset on spacing-changing axes and
    fails this bound 6x over (measured rel_max 1.27e-2).
    """
    # smooth field: wavelengths >= ~6 voxels on the coarsest axis
    def field(z, y, x):  # physical mm coordinates
        return (np.sin(2 * np.pi * z / 25.0)
                + np.cos(2 * np.pi * y / 7.0)
                + np.sin(2 * np.pi * (x + 0.3 * y) / 9.0))

    in_sp = (3.6, 0.5, 0.5)    # typical raw bpMRI spacing (D, H, W)
    out_sp = (3.0, 0.5, 0.5)   # reference resample target
    n_in = (20, 96, 96)
    zz, yy, xx = np.meshgrid(*[np.arange(n) * s for n, s in zip(n_in, in_sp)],
                             indexing="ij")
    vol = field(zz, yy, xx).astype(np.float32)

    out = resample_volume(vol, in_sp, out_sp)
    n_out = out.shape
    zo, yo, xo = np.meshgrid(
        *[np.arange(n) * s for n, s in zip(n_out, out_sp)], indexing="ij")
    truth = field(zo, yo, xo)

    # interior only: the outermost voxel ring is governed by boundary
    # handling, where our edge-replicate deliberately deviates from the
    # reference's fill-with-pixel-type-enum quirk (see resample_volume doc)
    sl = (slice(2, -2),) * 3
    err = np.abs(out[sl] - truth[sl])
    amp = truth.max() - truth.min()
    assert err.max() / amp < 3e-3, (err.max(), amp)
    assert err.mean() / amp < 5e-4, (err.mean(), amp)

    # label path: NN at the same locations — every output voxel must carry
    # the value of its nearest input voxel under the sitk coordinate map
    lab = (vol > 0.5).astype(np.uint8) * 3
    rl = resample_volume(lab, in_sp, out_sp, is_label=True)
    # half-integer coordinates round HALF-UP (floor(x+0.5)) — scipy order=0
    # and ITK's RoundHalfIntegerUp agree; np.round (half-to-even) does not
    ji = [np.clip(np.floor(np.arange(n) * t / s + 0.5), 0, m - 1).astype(int)
          for n, s, t, m in zip(n_out, in_sp, out_sp, n_in)]
    np.testing.assert_array_equal(
        rl, lab[np.ix_(ji[0], ji[1], ji[2])])
