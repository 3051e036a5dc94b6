"""Round-3 probe: push cfg1 past the b120 HBM ceiling by slimming the
output buffer device-side.

cfg1's standard program materializes y_softmax[..., :2] in fp32:
b120 x 20x160x160 x 2ch x 4B = 983 MB of HBM held by the output alone,
and b124+ is RESOURCE_EXHAUSTED (docs/ROUND2_NOTES.md). Serving already
supports exact foreground-only transfer (1 - sum reconstruction) and fp16
output cast (serve.py --TRANSFER_CHANNELS/--TRANSFER_DTYPE), so the same
slimming inside the bench program — fg channel only, fp16 — cuts the
output to 123 MB at b120. If activations (not the output buffer) were not
the binding constraint, b128-144 should now compile; the recorded cfg1
fit (178 ms + 0.27 ms/vol) projects 144/(0.178+144*0.00027) ~ 664 vol/s
at b144 — past the round-2 VERDICT's 650 target.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/r3_probe_slim.py
(real chip; each point individually guarded)
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

from prostatemr_3d_cad_cspca_tpu.models.m1 import M1  # noqa: E402

SPATIAL = (20, 160, 160)


def main():
    model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, dtype=jnp.bfloat16,
        init_params=False)
    net = model.net
    params = model.init(0)

    @jax.jit
    def detect(p, v):  # the recorded cfg1 program (control)
        return net.apply({"params": p}, v, train=False)["y_softmax"][..., :2]

    @jax.jit
    def detect_fg32(p, v):  # foreground-only, fp32 (exact: bg = 1 - fg)
        y = net.apply({"params": p}, v, train=False)["y_softmax"]
        return y[..., 1:2]

    @jax.jit
    def detect_slim(p, v):  # foreground-only + fp16, cast ON DEVICE
        y = net.apply({"params": p}, v, train=False)["y_softmax"]
        return y[..., 1:2].astype(jnp.float16)

    base = np.random.default_rng(0).normal(
        size=(8, *SPATIAL, 3)).astype(np.float32)

    def x_at(b):
        reps = (b + 7) // 8
        return jnp.tile(jnp.asarray(base, jnp.bfloat16),
                        (reps, 1, 1, 1, 1))[:b]

    # control: reproduce the recorded cfg1 b120 figure in THIS session
    t0 = time.time()
    dt = _measure(detect, (params, x_at(120)), iters=8)
    print(f"control b120 full-fp32-out: {dt*1e3:.1f} ms -> "
          f"{120/dt:.1f} vol/s (wall {time.time()-t0:.0f}s)", flush=True)

    pts = []
    for tag, fn, batches in (
            ("fg32", detect_fg32, (120, 128, 136)),
            ("slim", detect_slim, (120, 128, 136, 144, 152))):
        for b in batches:
            try:
                t0 = time.time()
                dt = _measure(fn, (params, x_at(b)), iters=8)
                if tag == "slim":
                    pts.append((b, dt))
                print(f"{tag} b{b}: {dt*1e3:.1f} ms -> {b/dt:.1f} vol/s "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:  # RESOURCE_EXHAUSTED / compile-helper 500
                print(f"{tag} b{b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                break
    if len(pts) >= 2:
        bs = np.array([p[0] for p in pts], float)
        ts = np.array([p[1] for p in pts], float)
        slope, icept = np.polyfit(bs, ts, 1)
        print(f"slim fit: fixed {icept*1e3:.1f} ms, marginal "
              f"{1/slope:.0f} vol/s", flush=True)


if __name__ == "__main__":
    main()
