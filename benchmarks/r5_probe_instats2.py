"""Round-5 probe: cfg1 whole-model A/B of lane-packed IN statistics.

Pairs with r5_probe_instats.py (micro). Builds the cfg1 attention U-Net,
measures bf16 b120 foreground-only inference with
ops.normalization.set_packed_stats(False) vs (True) in one process (two
jit programs, same params/input), and reports vol/s for both.

Run on the chip:  python benchmarks/r5_probe_instats2.py [--batch 120]
Writes benchmarks/r5_instats2_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_core import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prostatemr_3d_cad_cspca_tpu.models.m1 import M1  # noqa: E402
from prostatemr_3d_cad_cspca_tpu.ops import normalization  # noqa: E402


def _sync(out):
    # block_until_ready alone does not force execution through the axon
    # tunnel; fetch a scalar (same pattern as bench.py's _sync)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _best_of(f, *args, n=3, iters=5):
    out = f(*args)
    _sync(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=120)
    args = ap.parse_args()

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    model = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, dtype=jnp.bfloat16)
    net, params = model.net, model.params
    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 20, 160, 160, 3)), jnp.bfloat16)

    results = {"batch": B}
    outs = {}
    for tag in ("naive", "staged", "packed"):
        normalization.set_stats_mode(tag)

        # fresh jit per variant: the mode is read at TRACE time
        @jax.jit
        def fwd(p, xx):
            return net.apply({"params": p}, xx, train=False)[
                "y_softmax"][..., 1:2]

        try:
            dt, out = _best_of(fwd, params, x)
        except Exception as e:  # noqa: BLE001
            results[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
            print(f"# {tag} FAILED: {e}", file=sys.stderr, flush=True)
            continue
        outs[tag] = np.asarray(out[:2], np.float32)
        vps = B / dt
        results[f"{tag}_ms"] = round(dt * 1e3, 2)
        results[f"{tag}_vols_per_sec"] = round(vps, 3)
        print(f"# cfg1 b{B} fgout {tag:6s} {dt*1e3:7.2f} ms -> {vps:.1f} vol/s",
              file=sys.stderr, flush=True)
    normalization.set_stats_mode("naive")
    for tag in ("staged", "packed"):
        if tag in outs and "naive" in outs:
            results[f"max_output_diff_{tag}"] = float(
                np.max(np.abs(outs[tag] - outs["naive"])))

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "r5_instats2_results.json")
    with open(out_path + ".tmp", "w") as f:
        json.dump(results, f, indent=2)
    os.replace(out_path + ".tmp", out_path)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
