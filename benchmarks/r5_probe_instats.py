"""Round-5 probe: lane-packed instance-norm statistics (VERDICT r4 item 6).

The round-4 per-op roofline table (docs/ATTRIBUTION.md, r4_roofline_infer.json)
shows the cfg1 program's worst outliers are IN-stats reductions and
elementwise chains on low-channel tensors:

  fusion.31   IN stats, C=4  (SE bottleneck, stage 0)   4.02x own roofline
  fusion.294  40^2x64 elementwise chain                 3.76x
  fusion.29   IN stats, 40^2x64 (C=64)                  2.55x

Cause: with C < 128 the channel (lane) dim is mostly empty — T(4,128)/
T(8,128) tiling halves or worse the effective HBM bandwidth of any op whose
minor dims are (W, C).

Surgical counter measured here: express the (D,H,W)-reduction per (B,C) as a
PURE RESHAPE (B, M, C) -> (B, M/q, q*C) with q*C = 128 (row-major bitcast:
lane l of row r holds (m = r*q + l//C, c = l%C)), reduce over rows at full
lane occupancy, then fold the q sub-sums per channel (tiny (B,128)->(B,C)
second pass). Variants:

  naive   jnp.mean over (1,2,3)            — current bf16 fast path
  packed  reshape-to-128-lanes then reduce
  matmul  dot_general with a ones vector over M (MXU rides the read stream)

Run on the chip:  python benchmarks/r5_probe_instats.py
Writes benchmarks/r5_instats_results.json.
"""

from __future__ import annotations

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


def _sync(out):
    # block_until_ready alone does NOT force execution through the axon
    # tunnel (async enqueue resolves early for small outputs — round-3
    # finding, same pattern as bench.py's _sync): fetch a scalar.
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _best_of(f, *args, n=3, iters=10):
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


def stats_naive(x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
    ex2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2, 3),
                   keepdims=True)
    return mean, ex2


def stats_packed(x):
    b, d, h, w, c = x.shape
    q = 128 // c
    m = d * h * w
    xp = x.reshape(b, m // q, q * c)
    s = jnp.sum(xp, axis=1, dtype=jnp.float32)       # (B, 128) full lanes
    ss = jnp.sum(jnp.square(xp.astype(jnp.float32)), axis=1)
    s = jnp.sum(s.reshape(b, q, c), axis=1)          # fold q sub-sums
    ss = jnp.sum(ss.reshape(b, q, c), axis=1)
    n = float(m)
    return (s / n).reshape(b, 1, 1, 1, c), (ss / n).reshape(b, 1, 1, 1, c)


def stats_matmul(x):
    b, d, h, w, c = x.shape
    m = d * h * w
    xf = x.reshape(b, m, c)
    ones = jnp.ones((m,), jnp.float32)
    s = jax.lax.dot_general(ones, xf.astype(jnp.bfloat16),
                            ((((0,), (1,))), (((), (0,)))),
                            preferred_element_type=jnp.float32)
    ss = jax.lax.dot_general(ones, jnp.square(xf.astype(jnp.float32)),
                             ((((0,), (1,))), (((), (0,)))),
                             preferred_element_type=jnp.float32)
    n = float(m)
    return (s / n).reshape(b, 1, 1, 1, c), (ss / n).reshape(b, 1, 1, 1, c)


def full_in_naive(x, scale, bias):
    mean, ex2 = stats_naive(x)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-3)
    a = (inv * scale).astype(x.dtype)
    bb = (bias - mean * inv * scale).astype(x.dtype)
    return x * a + bb


def full_in_packed(x, scale, bias):
    mean, ex2 = stats_packed(x)
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-3)
    a = (inv * scale).astype(x.dtype)
    bb = (bias - mean * inv * scale).astype(x.dtype)
    return x * a + bb


def main():
    results = {}
    rng = np.random.default_rng(0)
    # (shape, tag): the two outlier contexts + a healthy C=16 control
    cases = [
        ((120, 20, 160, 160, 4), "c4_stage0_se"),
        ((120, 20, 40, 40, 64), "c64_stage2"),
        ((120, 10, 20, 20, 128), "c128_stage3"),
        ((120, 20, 160, 160, 16), "c16_stage0_control"),
    ]
    for shape, tag in cases:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        nbytes = int(np.prod(shape)) * 2
        fns = {
            "naive": jax.jit(stats_naive),
            "packed": jax.jit(stats_packed),
            "matmul": jax.jit(stats_matmul),
        }
        ref = None
        for name, fn in fns.items():
            try:
                dt, out = _best_of(fn, x)
            except Exception as e:  # noqa: BLE001
                results[f"{tag}_{name}_error"] = f"{type(e).__name__}: {e}"[:160]
                continue
            gbps = nbytes / dt / 1e9
            results[f"{tag}_{name}_ms"] = round(dt * 1e3, 3)
            results[f"{tag}_{name}_gbps"] = round(gbps, 1)
            m = np.asarray(out[0], np.float32).ravel()
            if ref is None:
                ref = m
            else:
                results[f"{tag}_{name}_maxdiff"] = float(
                    np.max(np.abs(m - ref)))
            print(f"# {tag:24s} {name:7s} {dt*1e3:7.3f} ms  {gbps:7.1f} GB/s",
                  file=sys.stderr, flush=True)
        # full IN (stats + apply) — what the program actually runs
        scale = jnp.ones((shape[-1],), jnp.float32)
        bias = jnp.zeros((shape[-1],), jnp.float32)
        for name, fn in (("in_naive", jax.jit(full_in_naive)),
                         ("in_packed", jax.jit(full_in_packed))):
            try:
                dt, out = _best_of(fn, x, scale, bias)
            except Exception as e:  # noqa: BLE001
                results[f"{tag}_{name}_error"] = f"{type(e).__name__}: {e}"[:160]
                continue
            gbps = 2 * nbytes / dt / 1e9  # read + write
            results[f"{tag}_{name}_ms"] = round(dt * 1e3, 3)
            results[f"{tag}_{name}_gbps"] = round(gbps, 1)
            print(f"# {tag:24s} {name:10s} {dt*1e3:7.3f} ms  {gbps:7.1f} GB/s "
                  "(r+w)", file=sys.stderr, flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "r5_instats_results.json")
    with open(out_path + ".tmp", "w") as f:
        json.dump(results, f, indent=2)
    os.replace(out_path + ".tmp", out_path)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
