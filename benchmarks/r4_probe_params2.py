"""Round-4 probe #2 on parameter staging (see r4_probe_params.py).

Per-queue trace decomposition: the cfg1 b120 main op stream spends
150.3/196.6 ms PER ITERATION blocked on S(1) copies of the parameter
leaves; compute is 38.5 ms. Closure-constants did NOT remove the staging
(the executable's constant pool is staged the same way).

Variants:
  alias    — donate params AND return them unchanged: XLA input-output
             aliasing should pin them in device HBM across calls
             (the caller rebinds the returned tree each call).
  alias16  — same with bf16 leaves.
  gen      — weights GENERATED on device inside the program (random
             normals keyed by a constant): no external buffer to stage.
             If this runs at ~compute time, staging is confirmed as the
             entire gap; if it still measures ~190 ms, the floor is
             elsewhere.
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

    B = 120
    base = np.random.default_rng(0).normal(
        size=(8, 20, 160, 160, 3)).astype(np.float32)
    x = jnp.tile(jnp.asarray(base, jnp.bfloat16), (B // 8, 1, 1, 1, 1))

    results = {}

    def sync(o):
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    fwd = lambda p, v: net.apply(  # noqa: E731
        {"params": p}, v, train=False)["y_softmax"][..., 1:2]

    def record(tag, best):
        results[tag] = round(best * 1e3, 1)
        print(f"# {tag}: {best*1e3:.1f} ms/iter -> {B/best:.1f} vol/s",
              file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)

    # --- alias: donate params, return them; rebind every call -------------
    for tag, p0 in (("alias_fp32", params),
                    ("alias_bf16", jax.tree.map(
                        lambda a: a.astype(jnp.bfloat16), params))):
        try:
            f = jax.jit(lambda p, v: (fwd(p, v), p), donate_argnums=(0,))
            p = jax.tree.map(jnp.copy, p0)  # fresh donatable buffers
            t0 = time.perf_counter()
            y, p = f(p, x)
            sync(y)
            print(f"# {tag}: first run {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    y, p = f(p, x)
                sync(y)
                best = min(best, (time.perf_counter() - t0) / 5)
            record(tag, best)
            del p, f, y
        except Exception as e:
            results[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"# {tag} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
        gc.collect()

    # --- gen: weights generated on device inside the program --------------
    try:
        treedef = jax.tree_util.tree_structure(params)
        leaves = jax.tree_util.tree_leaves(params)
        shapes = [(l.shape, jnp.bfloat16) for l in leaves]

        def gen_fwd(v):
            key = jax.random.PRNGKey(0)
            ps = []
            for i, (shp, dt) in enumerate(shapes):
                ps.append(0.05 * jax.random.normal(
                    jax.random.fold_in(key, i), shp, dt))
            p = jax.tree_util.tree_unflatten(treedef, ps)
            return fwd(p, v)

        f = jax.jit(gen_fwd)
        t0 = time.perf_counter()
        sync(f(x))
        print(f"# gen: first run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                y = f(x)
            sync(y)
            best = min(best, (time.perf_counter() - t0) / 5)
        record("gen_bf16", best)
    except Exception as e:
        results["gen_bf16_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(f"# gen FAILED: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr, flush=True)

    with open(os.path.join(HERE, "r4_params2_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
