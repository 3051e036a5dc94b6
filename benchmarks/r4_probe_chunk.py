"""Round-4 probe: scan-chunked batched inference (cfg1 bf16, fgout).

Hypothesis: the b128 HBM knee caps the batch of ONE device step, but peak
activations live only for one scan iteration — so a lax.scan over batch
chunks inside one program holds peak HBM at chunk size while amortizing
the measured ~172 ms fixed program cost over chunk*K volumes. Measured
marginal rate (~0.23-0.35 ms/vol) projects b64xK16 to ~2000 vol/s vs the
b128 single-step 635.

Ladder: control b128 single, then (chunk, K) points ascending risk.
Each point individually guarded; cumulative JSON after each.
"""

from __future__ import annotations

import gc
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

    from prostatemr_3d_cad_cspca_tpu.infer import make_chunked_batch_fn
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    m1 = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, dtype=jnp.bfloat16)
    net, params = m1.net, m1.params

    def fg(xb):  # foreground-only output (serving's exact slim transfer)
        return net.apply({"params": params}, xb, train=False)[
            "y_softmax"][..., 1:2]

    results = {}

    def sync(o):
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def best_of(f, n=3, iters=4):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    base = np.random.default_rng(0).normal(
        size=(4, 20, 160, 160, 3)).astype(np.float32)

    def measure(tag, fn, x, total):
        t0 = time.perf_counter()
        sync(fn(x))
        print(f"# {tag}: first run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        dt = best_of(lambda: fn(x))
        vps = total / dt
        results[tag] = round(vps, 1)
        print(f"# {tag}: {dt*1e3:.1f} ms -> {vps:.1f} vol/s",
              file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)

    # control: single-step b128 fgout (round-3 headline config)
    fgj = jax.jit(fg)
    x = jnp.tile(jnp.asarray(base, jnp.bfloat16), (32, 1, 1, 1, 1))
    try:
        measure("ctl_b128_fgout", fgj, x, 128)
    except Exception as e:
        print(f"# control FAILED: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)
    del x
    gc.collect()

    # chunked ladder: ascending total batch
    for chunk, K in ((64, 4), (64, 8), (96, 6), (64, 16), (128, 4)):
        total = chunk * K
        tag = f"chunk{chunk}_k{K}_fgout"
        xf = None
        try:
            xf = jnp.tile(jnp.asarray(base, jnp.bfloat16),
                          (total // 4, 1, 1, 1, 1))
            fn = make_chunked_batch_fn(fg, chunk=chunk, n_chunks=K)
            measure(tag, fn, xf, total)
        except Exception as e:
            print(f"# {tag} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
            results[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(json.dumps(results), flush=True)
        del xf
        gc.collect()

    with open(os.path.join(HERE, "r4_chunk_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
