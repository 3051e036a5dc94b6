"""Round-3 probe: K-fold ensemble serving as ONE vmapped program.

The reference deploys a cross-validation fold ensemble (grand-challenge
container, reference README.md:6). Serving K members naively costs K
program executions; on this tunnel each execution pays a fixed ~178 ms
(docs/ROUND2_NOTES.md), so the naive ensemble pays K*fixed. ensemble.
M1Ensemble vmaps the detect head over stacked member params — ONE program,
one fixed cost, K*B volumes of marginal work.

Prediction from the cfg1 ladder (fixed 178 ms, marginal ~0.27 ms/vol):
  K=5, B=16: naive 5*(178+16*.27) ~ 912 ms vs vmapped 178+80*.27 ~ 200 ms.
HBM bound: the member vmap multiplies activation footprint like batch does
(K*B vol-equivalents; cfg1 topped out at b120), so sweep B at K=5 up to ~24.

Usage: python benchmarks/r3_probe_ensemble.py   (real chip, exclusive)
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

from prostatemr_3d_cad_cspca_tpu.ensemble import M1Ensemble, tta_detect  # noqa: E402
from prostatemr_3d_cad_cspca_tpu.models.m1 import M1  # noqa: E402

SPATIAL = (20, 160, 160)
K = 5


def main():
    members = [
        M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
           filters=(16, 32, 64, 128, 256),
           strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
           kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3),
                         (3, 3, 3)),
           se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
           dropout_rate=0.0, dropout_mode="standard", dtype=jnp.bfloat16,
           summary=False, seed=s, init_params=False)
        for s in range(K)]
    for s, m in enumerate(members):
        m.params = m.init(s)
    ens = M1Ensemble(members)

    single = jax.jit(members[0].get_detect_model())
    vmapped = jax.jit(ens.get_detect_model())
    tta_single = jax.jit(tta_detect(members[0].get_detect_model()))
    tta_ens = jax.jit(tta_detect(ens.get_detect_model()))

    base = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, *SPATIAL, 3)), jnp.bfloat16)

    def x_at(b):
        return jnp.tile(base, (b // 4, 1, 1, 1, 1))

    # one measured naive control (the rest of the single-member ladder is
    # the recorded cfg1 fit: 178 ms + 0.27 ms/vol)
    t0 = time.time()
    dt1_16 = _measure(single, (members[0].params, x_at(16)), iters=8)
    print(f"control single b16: {dt1_16*1e3:.1f} ms (cfg1 fit predicts "
          f"~182 ms; wall {time.time()-t0:.0f}s)", flush=True)

    # member vmap scales activations like batch: K*B vol-equivalents,
    # cfg1's ceiling was b120 -> stop at B=24 (=120 equiv)
    for b in (8, 16, 24):
        try:
            t0 = time.time()
            dtk = _measure(vmapped, (ens.params, x_at(b)), iters=8)
            # naive = K sequential single-member programs; scale the b16
            # control to other batches via the recorded cfg1 fit
            naive = K * dt1_16 * (0.178 + b * 0.00027) / (0.178 + 16 * 0.00027)
            print(f"K={K} b{b}: vmapped {dtk*1e3:.1f} ms vs naive "
                  f"{naive*1e3:.1f} ms ({naive/dtk:.2f}x) -> "
                  f"{b/dtk:.1f} ensembled-cases/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # RESOURCE_EXHAUSTED / compile-helper 500
            print(f"K={K} b{b}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            break

    # TTA doubles the views inside the same program: K*2*B vol-equivalents
    for b in (8, 12):
        try:
            t0 = time.time()
            dt1 = _measure(tta_single, (members[0].params, x_at(b)), iters=8)
            dtk = _measure(tta_ens, (ens.params, x_at(b)), iters=6)
            naive = K * dt1
            print(f"TTA K={K} b{b}: single+TTA {dt1*1e3:.1f} ms | "
                  f"ens+TTA {dtk*1e3:.1f} ms vs naive {naive*1e3:.1f} ms "
                  f"({naive/dtk:.2f}x) -> {b/dtk:.1f} ensembled-TTA-cases/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"TTA K={K} b{b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break


if __name__ == "__main__":
    main()
