"""Round-4 probe: is the ~190 ms batch-independent program cost parameter
STREAMING?

The per-op trace (r4_probe_trace.py, docs/ROUND4_NOTES.md) shows the cfg1
program's wall time dominated by async copy-start ops on the PARAMETER
leaves (fp32 conv kernels/biases) to/from memory space S(1), each with
~10 ms latency regardless of size (a 64-byte bias copy takes 11.7 ms) —
i.e. per-transfer tunnel latency, dozens deep. Hypothesis: passing params
as jit ARGUMENTS makes the runtime stage them per execution; inlining them
as closure CONSTANTS (exactly what export.py's AOT path does) should
remove the copies entirely.

Variants at cfg1 bf16 b120 (control reproduces the recorded 196-213 ms):
  ctl    — params as jit args (fp32 leaves, the 3-round-old recipe)
  arg16  — params as jit args, leaves pre-cast to bf16 (half the bytes)
  const  — params inlined as constants (fp32 leaves)
  const16— params inlined as constants (bf16 leaves)
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
    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

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
            print(f"# {tag} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)
        gc.collect()

    fwd = lambda p, v: net.apply(  # noqa: E731
        {"params": p}, v, train=False)["y_softmax"][..., 1:2]

    measure("ctl_args_fp32", jax.jit(fwd), params, x)
    measure("args_bf16", jax.jit(fwd), params16, x)
    measure("const_fp32", jax.jit(lambda v: fwd(params, v)), x)
    measure("const_bf16", jax.jit(lambda v: fwd(params16, v)), x)

    with open(os.path.join(HERE, "r4_params_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
