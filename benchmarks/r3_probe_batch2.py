"""Round-3 probe: push cfg2 (dense-skip + deep supervision) and config3
(batched MC sampling) to larger batches.

Rationale: the tunnel charges a fixed ~178 ms per program execution
(docs/ROUND2_NOTES.md), so throughput = B / (fixed + B*marginal). cfg2's
b32 point (253 ms) implies ~2.3 ms/vol marginal -> b64 should land near
195 vol/s if it fits HBM (cfg1 topped out at b120; dense skips are
heavier). Same logic for MC sampling at B=8-16 volumes x MC(4).

Usage: python benchmarks/r3_probe_batch2.py [cfg2|cfg3]   (real chip)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_core import _measure, enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from prostatemr_3d_cad_cspca_tpu.infer import mc_predict  # noqa: E402
from prostatemr_3d_cad_cspca_tpu.models.m1 import M1  # noqa: E402

SPATIAL = (20, 160, 160)
COMMON = dict(
    input_spatial_dims=SPATIAL, num_classes=2,
    filters=(16, 32, 64, 128, 256),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
    summary=False)


def cfg2():
    m = M1(input_channels=3, dense_skip=True, deep_supervision=True,
           dtype=jnp.bfloat16, init_params=False, **COMMON)
    params = m.init(0)
    net = m.net

    @jax.jit
    def detect(p, v):
        return net.apply({"params": p}, v, train=False)["y_softmax"][..., :2]

    base = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, *SPATIAL, 3)), jnp.bfloat16)
    for batch in (32, 48, 64, 80):
        x = jnp.tile(base, (batch // 4, 1, 1, 1, 1))
        try:
            t0 = time.time()
            dt = _measure(detect, (params, x), iters=8)
            print(f"cfg2 b{batch}: {dt*1e3:.1f} ms -> {batch/dt:.1f} vol/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # RESOURCE_EXHAUSTED etc.
            print(f"cfg2 b{batch}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            break


def cfg3():
    prob = M1(input_channels=4, probabilistic=True,
              prob_latent_dims=(3, 2, 1, 0),
              dropout_mode="monte-carlo", dropout_rate=0.5, **COMMON)
    detect = prob.get_detect_model()
    n_mc = 4
    mc = jax.jit(
        lambda p, x, k: mc_predict(detect, p, x, k, num_samples=n_mc))
    x1 = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, *SPATIAL, 4)), jnp.float32)
    key = jax.random.PRNGKey(7)
    for bv in (8, 12, 16):
        x = jnp.tile(x1, (bv, 1, 1, 1, 1))
        try:
            t0 = time.time()
            dt = _measure(mc, (prob.params, x, key), iters=6)
            print(f"cfg3 MC({n_mc}) b{bv}: {dt*1e3:.1f} ms -> "
                  f"{n_mc*bv/dt:.1f} samples/s (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"cfg3 b{bv}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            break


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cfg2"
    {"cfg2": cfg2, "cfg3": cfg3}[which]()
