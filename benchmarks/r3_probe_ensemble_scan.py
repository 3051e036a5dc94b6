"""Round-3 probe: scan-based K-fold ensemble on the real chip.

The vmapped K=5 ensemble CRASHED the remote compile helper (HTTP 500 —
known 16 GB compile limit; r3_probe_ensemble.py output, engineering log):
the unrolled graph is K times the network. ensemble.M1Ensemble therefore
defaults to ``method="scan"`` — the compiled graph is ONE member's network
regardless of K, and the mean accumulates in the scan carry. This probe
validates that the scan program (a) compiles on-chip, (b) pays the fixed
~170 ms program cost ONCE vs K times for naive sequential member programs.

Expected from the cfg1 fit (fixed ~178 ms, marginal ~0.27 ms/vol):
  K=5 b8 : naive 5*(178+8*.27)  ~ 901 ms vs scan ~ 178+40*.27 ~ 189 ms (4.8x)
  K=5 b16: naive 5*(178+16*.27) ~ 912 ms vs scan ~ 178+80*.27 ~ 200 ms (4.6x)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
           python benchmarks/r3_probe_ensemble_scan.py   (real chip)
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
    ens = M1Ensemble(members, method="scan")

    single = jax.jit(members[0].get_detect_model())
    scan_ens = jax.jit(ens.get_detect_model())
    tta_ens = jax.jit(tta_detect(ens.get_detect_model()))

    base = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, *SPATIAL, 3)), jnp.bfloat16)

    def x_at(b):
        return jnp.tile(base, (b // 4, 1, 1, 1, 1))

    t0 = time.time()
    dt1_16 = _measure(single, (members[0].params, x_at(16)), iters=8)
    print(f"control single b16: {dt1_16*1e3:.1f} ms "
          f"(wall {time.time()-t0:.0f}s)", flush=True)

    for b in (8, 16, 32):
        try:
            t0 = time.time()
            dtk = _measure(scan_ens, (ens.params, x_at(b)), iters=8)
            naive = K * dt1_16 * (0.178 + b * 0.00027) / (0.178 + 16 * 0.00027)
            print(f"scan K={K} b{b}: {dtk*1e3:.1f} ms vs naive "
                  f"{naive*1e3:.1f} ms ({naive/dtk:.2f}x) -> "
                  f"{b/dtk:.1f} ensembled-cases/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"scan K={K} b{b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            break

    for b in (8,):
        try:
            t0 = time.time()
            dtk = _measure(tta_ens, (ens.params, x_at(b)), iters=6)
            print(f"TTA-scan K={K} b{b}: {dtk*1e3:.1f} ms -> "
                  f"{b/dtk:.1f} ensembled-TTA-cases/s "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"TTA-scan K={K} b{b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
