"""Round-4 probe #5: is InstanceNorm what drags the cfg1 program into the
S(1) copy chain?

The cfg1 trace (docs/ATTRIBUTION.md) shows every IN stat tensor placed in
memory space S(1) (f32[120,16]{...S(1)}), and 150 ms/iter of main-stream
copies that no parameter-staging hypothesis explains (6 A/Bs rejected).
Test: chains of conv vs conv+IN at the REAL cfg1 stage-0 shape
(b120, 20x160x160, c16, kernel (1,3,3)) — the per-block slope difference
is the true per-IN surcharge, including any copy-chain it induces.

Variants:
  conv        — conv + leaky-relu only
  conv_in     — conv + instance_norm (the package's bf16 fast path)
  conv_in_mm  — conv + IN with stats via MXU matmul reduction
                (reshape (B,N,C) @ ones — avoids convert_reduce fusions)
  conv_in_bf  — conv + IN with bf16 stats (accuracy-unsafe; bound only)
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
    sys.path.insert(0, os.path.dirname(HERE))
    from bench_core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.ops.normalization import instance_norm

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    results = {}
    B, D, S, C = 120, 20, 160, 16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(1, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(B, D, S, S, C)), jnp.bfloat16)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def in_mm(x):
        # stats via one MXU matmul: (B, N, C) x (N,) sums
        xf = x.reshape(B, -1, C)
        n = xf.shape[1]
        ones = jnp.ones((n,), jnp.bfloat16)
        s = jnp.einsum("bnc,n->bc", xf, ones,
                       preferred_element_type=jnp.float32)
        ss = jnp.einsum("bnc,bnc->bc", xf, xf,
                        preferred_element_type=jnp.float32)
        mean = (s / n).reshape(B, 1, 1, 1, C)
        var = jnp.maximum((ss / n).reshape(B, 1, 1, 1, C) - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + 1e-3)
        return (x * inv.astype(x.dtype)
                - (mean * inv).astype(x.dtype))

    def in_bf(x):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(
            jnp.mean(x * x, axis=(1, 2, 3), keepdims=True) - mean * mean, 0)
        return (x - mean) * jax.lax.rsqrt(var + jnp.asarray(1e-3, x.dtype))

    BLOCKS = {
        "conv": lambda x: jnp.where(conv(x) > 0, conv(x), 0.1 * conv(x)),
        "conv_in": lambda x: instance_norm(conv(x), scale, bias),
        "conv_in_mm": lambda x: in_mm(conv(x)),
        "conv_in_bf": lambda x: in_bf(conv(x)),
    }
    # NOTE: "conv" calls conv(x) three times syntactically but XLA CSEs them
    # to one; keep the leaky-relu so the epilogue matches the real block.

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

    for name, block in BLOCKS.items():
        times = {}
        for n_blocks in (2, 6):
            def chain(x, _n=n_blocks, _b=block):
                for _ in range(_n):
                    x = _b(x)
                return x

            times[n_blocks] = measure(f"{name}_n{n_blocks}",
                                      jax.jit(chain), x0)
        slope = (times[6] - times[2]) / 4
        results[f"{name}_per_block_ms"] = round(slope * 1e3, 2)
        print(f"# {name}: {slope*1e3:.2f} ms/block", file=sys.stderr,
              flush=True)
        print(json.dumps(results), flush=True)

    with open(os.path.join(HERE, "r4_in_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
