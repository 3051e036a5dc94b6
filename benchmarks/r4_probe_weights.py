"""Round-4 probe #6: per-DISTINCT-WEIGHT-TENSOR cost.

All prior probes used chains that reuse ONE weight buffer and show zero
overhead beyond the HBM roofline; the real cfg1 program consumes 214
distinct weight tensors and pays ~150 ms/iter of main-stream copies
(~0.7 ms per leaf). Hypothesis: this platform stages every distinct
conv-weight operand through S(1) at a fixed per-buffer latency, per
execution — regardless of whether the weight arrived as an argument, a
constant, a slice of a flat buffer, or was generated on device (all
rejected A/Bs are consistent with this).

Chains of N 1x1x1 convs at (120,20,40,40,64):
  shared   — one weight reused by every block (control, roofline)
  distinct — N separate weight arguments
  stacked  — N weights shipped as ONE (N,1,1,64,64) array, lax.scan over
             it (same op sequence each iter; weights differ per iter)
  stacked_slice — one stacked array, N static slices feeding N unrolled
             convs (distinct HLO operands, single source buffer)
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    B, D, S, C = 120, 20, 40, 64
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, D, S, S, C)), jnp.bfloat16)

    def conv(x, w):
        return jnp.maximum(jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), 0.0)

    def measure(tag, fn, *args):
        t = time.perf_counter()
        jax.block_until_ready(fn(*args))
        print(f"# {tag}: first {time.perf_counter()-t:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(3):
                out = fn(*args)
            jax.block_until_ready(out)
            # fetch one value: on this platform block_until_ready
            # can return before back-to-back dispatches complete
            # (docs/ROUND4_NOTES.md, ceiling2); the fetch is the
            # only reliable completion barrier
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t) / 3)
        results[tag] = round(best * 1e3, 2)
        print(f"# {tag}: {best*1e3:.2f} ms", file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)
        return best

    def w_of(i):
        return jnp.asarray(
            np.random.default_rng(i).normal(size=(1, 1, 1, C, C)) * 0.05,
            jnp.bfloat16)

    for N in (8, 32):
        w1 = w_of(0)

        def shared(x):
            for _ in range(N):
                x = conv(x, w1)
            return x

        ws = [w_of(i) for i in range(N)]

        def distinct(x, *ws_):
            for w in ws_:
                x = conv(x, w)
            return x

        stack = jnp.stack(ws)  # (N,1,1,1,C,C)

        def stacked_scan(x, st):
            def body(h, w):
                return conv(h, w), None
            h, _ = jax.lax.scan(body, x, st)
            return h

        def stacked_slice(x, st):
            for i in range(N):
                x = conv(x, st[i])
            return x

        measure(f"shared_n{N}", jax.jit(shared), x0)
        measure(f"distinct_n{N}", jax.jit(distinct), x0, *ws)
        measure(f"stacked_scan_n{N}", jax.jit(stacked_scan), x0, stack)
        measure(f"stacked_slice_n{N}", jax.jit(stacked_slice), x0, stack)

    for tag in ("shared", "distinct", "stacked_scan", "stacked_slice"):
        slope = (results[f"{tag}_n32"] - results[f"{tag}_n8"]) / 24
        results[f"{tag}_per_op_ms"] = round(slope, 3)
        print(f"# {tag}: {slope:.3f} ms/op", file=sys.stderr, flush=True)
    print(json.dumps(results), flush=True)

    with open(os.path.join(HERE, "r4_weights_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
