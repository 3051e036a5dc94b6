"""Round-4 probe: the per-op execution cost model of this platform.

Facts so far (r4_probe_params*.py, r4_probe_chunk.py): the cfg1 program
runs ~196 ms/iter with 734 ops on the main stream (0.27 ms/op avg);
removing ALL external buffers (weights generated on device) changes
nothing; lax.scan over chunks multiplies the cost by K; fori_loop
micro-benches (r2_probe_ceilings) show tiny per-iteration overhead on a
1-op body. Competing models:

  A. per-STATIC-op-execution overhead (~0.25 ms each): executing a
     program with N distinct ops costs ~N * 0.25 ms regardless of op size.
  B. something specific to the M1 op mix (copies, reduces, layouts).

Measurements:
  chain_N  — N sequential DISTINCT small matmuls (256x256, non-fusable,
             data-dependent chain). Slope over N = per-static-op cost.
  loop_K   — fori_loop with K executions of ONE matmul op.
             Slope over K = per-dynamic-iteration cost.
  scanbody_K — lax.scan, body = 8 chained matmuls, K iterations.
             Slope = per-iteration cost of an 8-op body.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    sys.path.insert(0, HERE)
    from bench_core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    results = {}

    def sync(o):
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def best_of(f, *a, n=3, iters=10):
        sync(f(*a))
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(*a)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 256), jnp.bfloat16)

    # --- chain of N distinct matmul ops ------------------------------------
    ws = jax.random.normal(key, (128, 256, 256), jnp.bfloat16) * 0.06

    def make_chain(n):
        def f(v, w):
            for i in range(n):
                v = v @ w[i]  # distinct static op per i (w[i] is a slice)
            return v
        return jax.jit(f)

    for n in (16, 64, 128):
        dt = best_of(make_chain(n), x, ws)
        results[f"chain_{n}_ms"] = round(dt * 1e3, 3)
        print(f"# chain_{n}: {dt*1e3:.3f} ms", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)
    per_op = ((results["chain_128_ms"] - results["chain_16_ms"]) / (128 - 16))
    results["per_static_op_ms"] = round(per_op, 4)
    print(f"# per-static-op slope: {per_op:.4f} ms", file=sys.stderr,
          flush=True)

    # --- fori_loop over ONE op ---------------------------------------------
    w0 = ws[0]

    def make_loop(k):
        return jax.jit(lambda v: jax.lax.fori_loop(
            0, k, lambda i, a: a @ w0, v))

    for k in (16, 128):
        dt = best_of(make_loop(k), x)
        results[f"loop_{k}_ms"] = round(dt * 1e3, 3)
        print(f"# loop_{k}: {dt*1e3:.3f} ms", file=sys.stderr, flush=True)
    results["per_loop_iter_ms"] = round(
        (results["loop_128_ms"] - results["loop_16_ms"]) / (128 - 16), 4)

    # --- scan with an 8-op body ---------------------------------------------
    def body8(v, _):
        for i in range(8):
            v = v @ ws[i]
        return v, None

    def make_scan(k):
        return jax.jit(lambda v: jax.lax.scan(body8, v, None, length=k)[0])

    for k in (4, 16):
        dt = best_of(make_scan(k), x)
        results[f"scan8_{k}_ms"] = round(dt * 1e3, 3)
        print(f"# scan8_{k}: {dt*1e3:.3f} ms", file=sys.stderr, flush=True)
    results["per_scan_iter_ms"] = round(
        (results["scan8_16_ms"] - results["scan8_4_ms"]) / (16 - 4), 4)

    with open(os.path.join(HERE, "r4_opcost_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
