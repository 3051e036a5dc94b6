"""Round-5 probe: whole-model fp8 activation storage (cfg1, on-chip A/B).

Per-op measurements (r5_probe_quant.py / r5_quant_results.json) show fp8
boundary buffers give 1.45-1.53x on the traffic-bound stem conv while int8
requant only helps compute-bound shapes. This measures the REAL cfg1
program: detection M1, bf16 compute, b120, fgout output, with
ConvConfig.act_store in {None, float8_e4m3fn, float8_e5m2} — the casts sit
on every block-boundary tensor (models/blocks.py, models/m1_core.py).

One variant per process (argv), merge-on-write results:

  python benchmarks/r5_probe_fp8act.py none
  python benchmarks/r5_probe_fp8act.py e4m3
  python benchmarks/r5_probe_fp8act.py e5m2

Also records the max |Δ fg-prob| vs the bf16 baseline on one shared batch
(accuracy context for the deployment-mode decision; the full metric-level
delta story lives in tests/test_fp8_act.py on trained weights).
Writes benchmarks/r5_fp8act_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
from bench_core import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_fp8act_results.json")
B = 120


def _sync(out):
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _flush(results):
    prev = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
    prev.update(results)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "e4m3"
    act_store = {"none": None, "e4m3": "float8_e4m3fn",
                 "e5m2": "float8_e5m2"}[variant]

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s "
          f"(variant {variant})", file=sys.stderr, flush=True)

    model = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, dtype=jnp.bfloat16,
        act_store=act_store, seed=0)
    net = model.net
    params = model.params

    @jax.jit
    def detect_fg(p, v):
        y = net.apply({"params": p}, v, train=False)["y_softmax"]
        return y[..., 1:2]

    base = np.random.default_rng(0).normal(
        size=(4, 20, 160, 160, 3)).astype(np.float32)
    xf = jnp.tile(jnp.asarray(base, jnp.bfloat16), (B // 4, 1, 1, 1, 1))
    print(f"# inputs staged b{B}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    out = detect_fg(params, xf)
    _sync(out)
    compile_s = time.perf_counter() - t0
    print(f"# first run {compile_s:.0f}s", file=sys.stderr, flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(8):
            out = detect_fg(params, xf)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / 8)
    vps = B / best
    results = {
        f"fp8act_{variant}_ms": round(best * 1e3, 2),
        f"fp8act_{variant}_vols_per_sec": round(vps, 3),
    }

    # accuracy context: fg-prob delta vs the seed-0 baseline on volume 0
    # (the same 4-volume base both variants stage)
    probe = np.asarray(out[:4].astype(jnp.float32))
    results[f"fp8act_{variant}_fgprob_sample"] = [
        float(probe[0, 10, 80, 80, 0]), float(probe[1, 5, 40, 120, 0]),
        float(probe[2, 15, 120, 40, 0])]
    prev = {}
    if os.path.exists(OUT):
        try:
            prev = json.load(open(OUT))
        except Exception:
            prev = {}
    ref = prev.get("fp8act_none_fgmap")
    if variant == "none":
        results["fp8act_none_fgmap"] = probe[0, ::2, ::8, ::8, 0].ravel(
        ).round(5).tolist()
    elif ref is not None:
        delta = np.abs(probe[0, ::2, ::8, ::8, 0].ravel() - np.asarray(ref))
        results[f"fp8act_{variant}_max_fgprob_delta"] = round(
            float(delta.max()), 5)
        results[f"fp8act_{variant}_mean_fgprob_delta"] = round(
            float(delta.mean()), 6)
    print(f"# {variant}: {best*1e3:.1f} ms -> {vps:.1f} vol/s",
          file=sys.stderr, flush=True)
    _flush(results)
    print(json.dumps({k: v for k, v in results.items()
                      if "fgmap" not in k}, sort_keys=True))


if __name__ == "__main__":
    main()
