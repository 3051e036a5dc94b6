"""Round-3 probe: amortize the ~170 ms fixed per-program cost by running K
batch-chunks inside ONE program via lax.scan.

Round-2 closed two variants (docs/ROUND2_NOTES.md): straight-line K-chunk
multi-apply (XLA keeps all chunks' activations live -> plans past 16 GB) and
lax.map chunking (remote compile helper crash). lax.scan is the untried
shape: the loop body's activations are freed per iteration by construction,
and the carry is tiny. Inputs: (K, B_chunk, 20,160,160,3) stacked bf16 —
device-resident but only ~3 MB/vol.

Usage: r3_probe_scan.py <K> <B_chunk>   (e.g. 4 32, 2 64, 4 48)
"""
import json
import sys
import time

import numpy as np


def main(k, bc):
    from bench_core import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1

    m = M1(input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
           filters=(16, 32, 64, 128, 256),
           strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
           kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
           se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
           dropout_rate=0.0, summary=False, dtype=jnp.bfloat16,
           init_params=False)
    import dataclasses

    m.net = m.net.clone(conv_cfg=dataclasses.replace(m.net.conv_cfg,
                                                     fold2d=False))
    t0 = time.perf_counter()
    params = m.init(0)
    net = m.net

    @jax.jit
    def det_scan(p, chunks):  # chunks: (K, Bc, 20,160,160,3)
        def body(carry, x):
            y = net.apply({"params": p}, x, train=False)["y_softmax"][..., :2]
            return carry, y

        _, ys = jax.lax.scan(body, 0, chunks)
        return ys

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(k, bc, 20, 160, 160, 3)), jnp.bfloat16)
    for _ in range(2):
        jax.block_until_ready(det_scan(params, x))
    print(f"# compile+init {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        for _ in range(8):
            out = det_scan(params, x)
        jax.block_until_ready(out)
        np.asarray(out.ravel()[0])
        best = min(best, (time.perf_counter() - t1) / 8)
    vols = k * bc
    print(json.dumps({f"scan{k}x{bc}": {
        "ms": round(best * 1e3, 1), "vps": round(vols / best, 1)}}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
