"""Headline benchmark: bpMRI volumes/sec/chip — M1 20x160x160x3 inference.

Runs on the real TPU chip (do NOT set JAX_PLATFORMS=cpu). Prints ONE JSON
line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline is measured against the TF-CPU reference throughput recorded in
benchmarks/baseline_tf_cpu.json (see benchmarks/tf_cpu_baseline.py — the
BASELINE.md measurement plan; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _measure(fn, args, iters: int, warmup: int = 2) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):  # best-of-3: the device tunnel has high variance
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        # Belt-and-braces on experimental platforms: a tiny host transfer
        # forces real completion even if block_until_ready under-waits.
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    results = {}
    best = (0.0, None)  # (volumes/sec, tag)

    def build(dtype):
        return M1(
            input_spatial_dims=(20, 160, 160),
            input_channels=3,
            num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8),
            att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
            dropout_rate=0.0,
            summary=False,
            dtype=dtype,
            init_params=False,  # init once below, reuse across variants
        )

    t0 = time.perf_counter()
    fp32_model = build(None)
    params = fp32_model.init(0)
    print(f"# init: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    for tag, dtype, batch in (
        ("fp32_b8", None, 8),
        ("bf16_b32", jnp.bfloat16, 32),
        ("bf16_b64", jnp.bfloat16, 64),  # b128 exceeds the remote compiler
    ):
        net = (fp32_model if dtype is None else build(dtype)).net

        @jax.jit
        def detect(params, x):
            out = net.apply({"params": params}, x, train=False)
            return out["y_softmax"][..., :2]

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(batch, 20, 160, 160, 3)),
            jnp.float32 if dtype is None else dtype,
        )
        t0 = time.perf_counter()
        iters = 10
        dt = _measure(detect, (params, x), iters)
        vps = batch * iters / dt
        print(f"# {tag}: compile+run {time.perf_counter() - t0:.1f}s "
              f"-> {vps:.2f} vol/s", file=sys.stderr, flush=True)
        results[tag] = round(vps, 3)
        if vps > best[0]:
            best = (vps, tag)

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_tf_cpu.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("volumes_per_sec"):
            vs_baseline = best[0] / float(base["volumes_per_sec"])

    print(json.dumps({
        "metric": "bpMRI volumes/sec/chip (M1 20x160x160x3 inference)",
        "value": round(best[0], 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "detail": results,
        "best_config": best[1],
    }))


if __name__ == "__main__":
    main()
