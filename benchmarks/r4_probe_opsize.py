"""Round-4 probe #4: does per-op overhead scale with op SIZE?

Facts so far (cfg1 bf16 b120, ~196.6 ms/iter):
  * 5 staging hypotheses rejected (args vs constants, bf16 leaves,
    donation aliasing, weights generated on device, ONE flat-packed
    param buffer) — the floor never moves.
  * per-static-op slope on TINY ops (256x256 matmuls): 2.5 us/op.
  * main stream runs ~64 real compute ops in 196.6 ms with 150 ms
    attributed to copies — i.e. ~2.3 ms of overhead per HEAVY op.

Hypothesis: the tunnel runtime stages each op's OUTPUT buffer through
S(1), so per-op overhead grows with the op's output size. Test: chains
of N identical convs at two very different tensor sizes; the slope
d(time)/dN minus the op's own HBM roofline time is the per-op overhead
at that size. If overhead(large) >> overhead(small), the floor is
per-buffer traffic, and the only lever is fewer/larger ops — which is
exactly what batching/vmap does (and why it's the only lever that has
ever worked here).
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
    from functools import partial

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    results = {}

    def measure(tag, fn, *args):
        jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(4):
                out = fn(*args)
            jax.block_until_ready(out)
            # fetch one value: on this platform block_until_ready
            # can return before back-to-back dispatches complete
            # (docs/ROUND4_NOTES.md, ceiling2); the fetch is the
            # only reliable completion barrier
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.perf_counter() - t) / 4)
        results[tag] = round(best * 1e3, 2)
        print(f"# {tag}: {best*1e3:.2f} ms", file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)
        return best

    # Chain of N 3x3x3 convs, channels C, spatial S — each op's output is
    # the next op's input, so XLA cannot fuse them away, and every one is a
    # distinct HLO op with a distinct output buffer.
    def make_chain(n, c, s, b):
        w = jnp.asarray(
            np.random.default_rng(0).normal(size=(3, 3, 3, c, c)) * 0.05,
            jnp.bfloat16)

        @jax.jit
        def chain(x):
            for _ in range(n):
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                x = jnp.maximum(x, 0.0)  # keep ops distinct, fusible pairs
            return x

        x0 = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, s, s, s, c)),
            jnp.bfloat16)
        return chain, x0

    # LARGE ops: b8 32^3 x 64ch -> output 16 MB bf16, conv ~21 GFLOP
    # SMALL ops: b1 8^3 x 32ch -> output 32 KB bf16
    for label, (c, s, b) in (("large", (64, 32, 8)), ("small", (32, 8, 1))):
        times = {}
        for n in (4, 16, 32):
            fn, x0 = make_chain(n, c, s, b)
            times[n] = measure(f"{label}_chain_n{n}", fn, x0)
        slope = (times[32] - times[4]) / (32 - 4)
        results[f"{label}_per_op_ms"] = round(slope * 1e3, 3)
        print(f"# {label}: {slope*1e3:.3f} ms/op slope",
              file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)

    with open(os.path.join(HERE, "r4_opsize_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
