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
    # isolate the last-good caches so tests never touch the real artifacts
    mod.LAST_GOOD = str(tmp_path / "last_bench.json")
    mod.CONFIG_STORE = str(tmp_path / "last_good_configs.json")
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


def test_family_keys_and_fresh_point_predicate(bench):
    detail = {
        "cfg1_bf16_b128_fgout": 646.0,
        "cfg1_model_gflops_per_volume": 93.2,
        "cfg1_fp32_b8": 52.0,
        "cfg1_stale": True,
        "cfg1_stale_reason": "x",
        "prob_mc4_b8_samples_per_sec": 58.2,
        "prob_mc4_b12_error": "JaxRuntimeError",
        "sliding_window_fullres_sec_per_case": 0.044,
    }
    core = bench._family_keys(detail, "core")
    assert "cfg1_bf16_b128_fgout" in core
    # fp32 / stale labels / other families are NOT core keys
    assert "cfg1_fp32_b8" not in core and "cfg1_stale" not in core
    assert "cfg1_stale_reason" not in core
    assert set(bench._family_keys(detail, "fp32")) == {"cfg1_fp32_b8"}
    # errors never count as measurements
    assert set(bench._family_keys(detail, "config3")) == {
        "prob_mc4_b8_samples_per_sec"}
    # core requires a throughput (_b<N>) point; FLOPs-only JSON is a failure
    assert not bench._has_fresh_point(
        {"cfg1_model_gflops_per_volume": 93.2}, "core")
    assert bench._has_fresh_point({"cfg1_bf16_b128_fgout": 646.0}, "core")
    assert bench._has_fresh_point(detail, "config5")
    assert not bench._has_fresh_point(
        {"prob_mc4_b12_error": "JaxRuntimeError"}, "config3")


def test_whole_plan_stale_merge(bench, capsys):
    # run A measured cfg1 + config5 fresh — store them
    run_a = {"cfg1_bf16_b128_fgout": 646.0, "cfg1_bf16_b124_fgout": 620.0,
             "sliding_window_fullres_sec_per_case": 0.044}
    bench._store_fresh_configs(run_a, {"core", "config5"})
    # run B measured only config4; every other planned config stale-merges
    detail = {"train_step_vols_per_sec": 4.3}
    plan = ["core", "config4", "config5", "config3"]
    merged = bench._merge_stale_configs(detail, plan, {"config4"})
    assert set(merged) == {"core", "config5"}  # config3 has no stored value
    assert detail["cfg1_bf16_b128_fgout"] == pytest.approx(646.0)
    assert detail["cfg1_stale"] is True
    assert "last good" in detail["cfg1_stale_reason"]
    assert detail["sliding_window_fullres_sec_per_case"] == pytest.approx(0.044)
    assert detail["cfg5_stale"] is True
    # fresh keys untouched, no stale label for the fresh config
    assert detail["train_step_vols_per_sec"] == pytest.approx(4.3)
    assert "cfg4_stale" not in detail
    # the merged record emits a real headline with the fresh list attached
    headline = bench._emit(detail, skipped=[], failed=[], fresh={"config4"})
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert headline == pytest.approx(646.0)
    assert out["detail"]["fresh"] == ["config4"]
    # ... but a stale-merged headline is never cached as last-good
    assert not os.path.exists(bench.LAST_GOOD)


def test_stale_merge_never_overwrites_fresh_keys(bench):
    bench._store_fresh_configs(
        {"cfg1_bf16_b128_fgout": 646.0, "cfg1_bf16_b124_fgout": 620.0},
        {"core"})
    detail = {"cfg1_bf16_b128_fgout": 700.0}
    # core NOT fresh per the caller: only missing keys are filled
    bench._merge_stale_configs(detail, ["core"], set())
    assert detail["cfg1_bf16_b128_fgout"] == pytest.approx(700.0)
    assert detail["cfg1_bf16_b124_fgout"] == pytest.approx(620.0)


def test_stale_merge_without_store_is_noop(bench):
    detail = {"train_step_vols_per_sec": 4.3}
    assert bench._merge_stale_configs(detail, ["core", "config4"],
                                      {"config4"}) == []
    assert "cfg1_stale" not in detail


def test_store_updates_only_fresh_families(bench):
    bench._store_fresh_configs(
        {"cfg1_bf16_b128_fgout": 646.0, "train_step_vols_per_sec": 4.3},
        {"core"})
    store = bench._load_config_store()
    assert "core" in store and "config4" not in store
    assert store["core"]["detail"] == {"cfg1_bf16_b128_fgout": 646.0}
    assert "recorded_at" in store["core"]
    # a second run refreshes without destroying other configs
    bench._store_fresh_configs({"train_step_vols_per_sec": 5.0}, {"config4"})
    store = bench._load_config_store()
    assert store["core"]["detail"]["cfg1_bf16_b128_fgout"] == 646.0
    assert store["config4"]["detail"] == {"train_step_vols_per_sec": 5.0}


def test_store_partial_capture_merges_per_key(bench):
    """A worker killed mid-ladder lands only its first points; the store
    must MERGE them per key, not replace the entry (observed 2026-08-20:
    a base-point-only config3 capture destroying the stored b8 headline).
    Surviving keys keep their own timestamps and the entry timestamp is
    the oldest contributing one."""
    bench._store_fresh_configs(
        {"prob_mc4_samples_per_sec": 33.2,
         "prob_mc4_b8_samples_per_sec": 58.2}, {"config3"})
    store = bench._load_config_store()
    first_ts = store["config3"]["recorded_at"]
    # second run: partial capture (base point only, new value)
    bench._store_fresh_configs(
        {"prob_mc4_samples_per_sec": 32.9}, {"config3"})
    store = bench._load_config_store()
    det = store["config3"]["detail"]
    assert det["prob_mc4_samples_per_sec"] == pytest.approx(32.9)
    assert det["prob_mc4_b8_samples_per_sec"] == pytest.approx(58.2)
    by_key = store["config3"]["recorded_at_by_key"]
    assert by_key["prob_mc4_b8_samples_per_sec"] == first_ts
    # entry timestamp stays the OLDEST contributing key's timestamp
    assert store["config3"]["recorded_at"] == min(by_key.values())


def test_plan_names_all_have_families(bench):
    # every plan entry must be stale-mergeable: its name needs a key family
    import re
    src = open(os.path.join(REPO, "bench.py")).read()
    i = src.index("plan = [")
    plan_block = src[i:src.index("\n    ]", i)]
    names = re.findall(r'\(\s*"(\w+)"', plan_block)
    assert len(names) >= 8
    for n in names:
        assert n in bench.FAMILIES, n
