"""Round-4 re-measurement of the bf16 matmul ceiling.

The round-2 slope method (separate programs of K in-loop matmuls,
d(time)/dK) produced 980 TFLOP/s — 5x the v5e spec (~197 TFLOP/s bf16),
because it subtracted the per-program wall as "fixed cost" while that
wall is itself op-time (docs/ROUND4_NOTES.md). Two pitfalls this probe
corrects:

  * on this tunnel platform, `jax.block_until_ready` on a LARGE device
    output can return long before the computation finished (measured:
    32 dependent dispatches "ready" in 6 ms, true values arriving 62 s
    later) — every timing here reduces the chain to a SCALAR in-program
    and fetches the value, which provably synchronizes;
  * per-program overhead (operand staging ~25 ms for two 32 MB
    operands) must not be attributed to the matmuls — the slope
    d(time)/dN across chain lengths inside the same program family
    cancels it.

Measured on this chip: 0.713 ms per 4096^3 bf16 matmul -> 193 TFLOP/s,
i.e. the v5e spec sheet, as it should be. bench_core's MFU denominator
is pinned to this number.

Emits benchmarks/r4_ceiling2_results.json.
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
    M = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, M)) / 64.0, jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, M)) / 64.0, jnp.bfloat16)

    def make_chain(n):
        def chain(x, y):
            for _ in range(n):
                x = jnp.dot(x, y, preferred_element_type=jnp.bfloat16)
            # scalar output: forces a real value fetch (sync) and makes
            # the transfer cost negligible
            return jnp.float32(x.sum())
        return jax.jit(chain)

    times = {}
    for n in (4, 16, 64):
        fn = make_chain(n)
        float(fn(a, b))  # warm (compile + first load)
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            v = float(fn(a, b))  # value fetch == completion barrier
            best = min(best, time.perf_counter() - t)
        assert np.isfinite(v)
        times[n] = best
        results[f"chain_n{n}_ms"] = round(best * 1e3, 2)
        print(f"# chain n={n}: {best*1e3:.2f} ms", file=sys.stderr,
              flush=True)
        print(json.dumps(results), flush=True)

    per_mm_s = (times[64] - times[4]) / (64 - 4)
    flops = 2 * M * M * M
    ceiling = flops / per_mm_s
    results["per_matmul_ms"] = round(per_mm_s * 1e3, 3)
    results["matmul_ceiling_tflops"] = round(ceiling / 1e12, 1)
    results["program_intercept_ms"] = round(
        (times[4] - 4 * per_mm_s) * 1e3, 1)
    print(f"# bf16 4096^3 in-program slope: {per_mm_s*1e3:.3f} ms/matmul "
          f"-> {ceiling/1e12:.1f} TFLOP/s", file=sys.stderr, flush=True)

    with open(os.path.join(HERE, "r4_ceiling2_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
