"""Round-5 probe: does SE-block remat SPEED UP the b2 train step?

The round-4 train roofline (`r4_roofline_train.json`) puts the bf16 b2
train step at 0.86 of HBM speed-of-light with ~88 GB/volume, and the
round-5 grad-accum A/B falsified the weight-traffic hypothesis — the
bytes are ACTIVATION traffic (saved forward tensors re-read by the
backward). On an HBM-bound step, `jax.checkpoint` cuts exactly that
class of bytes: rematerializing each SE block drops its saved
internals (conv1/conv2 outputs, IN stats, SE gates) from the
fwd-to-bwd residual set at the cost of recomputing them (~+33% FLOPs,
irrelevant at AI~109 << ridge ~271). The hook has existed since round 2
(`models/m1_core.py:77`, default False) but was only ever justified as
a MEMORY trade; this measures it as a THROUGHPUT lever.

One train program per process (a second large train compile wedges the
axon tunnel — extended_bench note), so each variant is a separate
invocation:

  python benchmarks/r5_probe_remat.py off     # control (= config4b)
  python benchmarks/r5_probe_remat.py on      # SE-block remat
  python benchmarks/r5_probe_remat.py scan8   # remat + K=8 scan program

Writes benchmarks/r5_remat_results.json (merge-on-write).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))
from bench_core import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_remat_results.json")


def _sync(out):
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _best_of(f, n=2, iters=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _flush(results):
    prev = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
    prev.update(results)
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    os.replace(tmp, OUT)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "on"
    remat = variant != "off"
    K = 8 if variant == "scan8" else None

    from prostatemr_3d_cad_cspca_tpu.augment import AugmentParams
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    from prostatemr_3d_cad_cspca_tpu.train.trainer import (
        build_schedule, init_train_state, make_loss, make_optimizer,
        make_train_step)

    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s "
          f"(variant {variant})", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    B = 2
    prob16 = M1(
        input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
        dropout_mode="monte-carlo", dropout_rate=0.5, summary=False,
        dtype=jnp.bfloat16, remat=remat)
    schedule = build_schedule("CALR", 1e-3, steps_per_epoch=80, num_epochs=250)
    opt = make_optimizer("adam", schedule)
    step = make_train_step(prob16, make_loss("distribution_focal"), opt,
                           elbo_beta=10.0, augment_params=AugmentParams(),
                           train_obj="lesion", scan_steps=K)
    st = {"s": init_train_state(prob16, opt)}
    lab = rng.integers(0, 2, size=(B, 20, 160, 160))
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 20, 160, 160, 4)),
                             jnp.float32),
        "detection": jnp.asarray(np.eye(2, dtype=np.float32)[lab]),
    }
    if K:
        batch = jax.tree_util.tree_map(lambda b: jnp.stack([b] * K), batch)
    k = jax.random.PRNGKey(1)

    def it():
        st["s"], m = step(st["s"], batch, k)
        return m["loss"]

    t0 = time.perf_counter()
    _sync(it())
    compile_s = time.perf_counter() - t0
    dt = _best_of(it)
    vols = B * (K or 1)
    vps = vols / dt
    results = {
        f"remat_{variant}_ms": round(dt * 1e3, 2),
        f"remat_{variant}_vols_per_sec": round(vps, 3),
        f"remat_{variant}_compile_s": round(compile_s, 1),
    }
    print(f"# remat={variant} {dt*1e3:.1f} ms/program -> {vps:.3f} vol/s "
          f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    _flush(results)
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
