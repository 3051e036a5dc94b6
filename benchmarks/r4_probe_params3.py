"""Round-4 probe #3: FLAT-PACKED parameters.

If the ~150 ms/iter staging cost is per-leaf copy LATENCY (~10 ms each,
~300 leaves, limited pipelining), then shipping ONE flat buffer and
slicing/reshaping every weight out of it ON DEVICE should collapse
staging to a single copy. The slices/reshapes are HBM-cheap (params are
~50-100 MB total vs the 24 GB of activation traffic).

Variants (cfg1 bf16 b120):
  flat_bf16 — params flattened into one bf16 vector, passed as ONE jit
              arg; program reconstructs the tree via dynamic-free
              static slices + reshapes.
  flat_const— same flat vector inlined as a single closure constant.
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

    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    offs = np.cumsum([0] + sizes).tolist()
    n_leaves = len(leaves)
    print(f"# {n_leaves} leaves, {sum(sizes)*2/1e6:.1f} MB bf16 flat",
          file=sys.stderr, flush=True)

    @jax.jit
    def pack(ls):
        return jnp.concatenate([l.astype(jnp.bfloat16).reshape(-1)
                                for l in ls])

    flat = pack(leaves)
    jax.block_until_ready(flat)

    def unpack(vec):
        ls = [vec[offs[i]:offs[i + 1]].reshape(shapes[i])
              for i in range(n_leaves)]
        return jax.tree_util.tree_unflatten(treedef, ls)

    def fwd(p, v):
        return net.apply(
            {"params": p}, v, train=False)["y_softmax"][..., 1:2]

    B = 120
    base = np.random.default_rng(0).normal(
        size=(8, 20, 160, 160, 3)).astype(np.float32)
    x = jnp.tile(jnp.asarray(base, jnp.bfloat16), (B // 8, 1, 1, 1, 1))

    results = {}

    def sync(o):
        jax.block_until_ready(o)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    def measure(tag, fn, *args):
        try:
            t0 = time.perf_counter()
            sync(fn(*args))
            print(f"# {tag}: first run {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    out = fn(*args)
                sync(out)
                best = min(best, (time.perf_counter() - t0) / 5)
            results[tag] = round(best * 1e3, 1)
            print(f"# {tag}: {best*1e3:.1f} ms/iter -> {B/best:.1f} vol/s",
                  file=sys.stderr, flush=True)
        except Exception as e:
            results[tag + "_error"] = f"{type(e).__name__}: {str(e)[:160]}"
            print(f"# {tag} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)
        gc.collect()

    measure("flat_bf16", jax.jit(lambda fv, v: fwd(unpack(fv), v)), flat, x)
    measure("flat_const", jax.jit(lambda v: fwd(unpack(flat), v)), x)

    with open(os.path.join(HERE, "r4_params3_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
