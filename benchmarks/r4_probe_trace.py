"""Round-4 MFU attribution probe (VERDICT r3 item 3): capture an on-chip
``jax.profiler`` trace of the cfg1 bf16 b120 inference step and print a
per-op table (op, ms, % of step) aggregated from the device XPlane.

The per-op timings answer the standing question: where do the remaining
~72% of the marginal step go once the MXU matmul time is accounted for —
stem convs at 16-32 channels, transposed convs, IN reductions, or layout
copies? Run on the real chip (no JAX_PLATFORMS=cpu).

Output: stderr table + benchmarks/r4_trace_ops.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def parse_xplanes(logdir):
    """Aggregate op self-times from every .xplane.pb under ``logdir``.

    Returns {plane_name: {event_name: total_duration_ps}} keeping only
    device planes (TPU/device — the host python/TSL planes are noise here).
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    out = {}
    for path in glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                          recursive=True):
        raw = open(path, "rb").read()
        try:
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
        except OSError:
            pass
        space = xplane_pb2.XSpace()
        space.ParseFromString(raw)
        for plane in space.planes:
            events = defaultdict(int)
            occur = defaultdict(int)
            meta = {m.id: m.name for m in plane.event_metadata.values()} \
                if hasattr(plane.event_metadata, "values") else {}
            if not meta:
                meta = {mid: m.name for mid, m in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    events[name] += ev.duration_ps
                    occur[name] += 1
            if events:
                out[plane.name] = (dict(events), dict(occur))
    return out


def main():
    mode = "train" if "--train" in sys.argv else "infer"
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

    rng0 = np.random.default_rng(0)
    if mode == "infer":
        m1 = M1(
            input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            dropout_rate=0.0, summary=False, dtype=jnp.bfloat16)
        net, params = m1.net, m1.params

        @jax.jit
        def detect(p, v):
            return net.apply(
                {"params": p}, v, train=False)["y_softmax"][..., 1:2]

        B = 120
        base = rng0.normal(size=(8, 20, 160, 160, 3)).astype(np.float32)
        x = jnp.tile(jnp.asarray(base, jnp.bfloat16), (B // 8, 1, 1, 1, 1))
        step = lambda: detect(params, x)  # noqa: E731
    else:
        # the config4 recipe: bf16 prob model, fused augmentation, focal+KL
        from prostatemr_3d_cad_cspca_tpu.augment import AugmentParams
        from prostatemr_3d_cad_cspca_tpu.train.trainer import (
            build_schedule, init_train_state, make_loss, make_optimizer,
            make_train_step)

        prob16 = M1(
            input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
            dropout_mode="monte-carlo", dropout_rate=0.5, summary=False,
            dtype=jnp.bfloat16)
        schedule = build_schedule("CALR", 1e-3, steps_per_epoch=80,
                                  num_epochs=250)
        opt = make_optimizer("adam", schedule)
        tstep = make_train_step(prob16, make_loss("distribution_focal"), opt,
                                elbo_beta=10.0,
                                augment_params=AugmentParams(),
                                train_obj="lesion")
        B = 2
        lab = rng0.integers(0, 2, size=(B, 20, 160, 160))
        batch = {
            "image": jnp.asarray(
                rng0.normal(size=(B, 20, 160, 160, 4)), jnp.float32),
            "detection": jnp.asarray(np.eye(2, dtype=np.float32)[lab]),
        }
        k = jax.random.PRNGKey(1)
        st = {"s": init_train_state(prob16, opt)}

        def step():
            st["s"], m = tstep(st["s"], batch, k)
            return m["loss"]

    # warm (first big program load is 150-550 s on this tunnel)
    t0 = time.perf_counter()
    jax.block_until_ready(step())
    print(f"# first run {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        out = step()
    jax.block_until_ready(out)
    iter_ms = (time.perf_counter() - t0) / 4 * 1e3
    print(f"# warm iter {iter_ms:.1f} ms", file=sys.stderr, flush=True)

    logdir = os.path.join(HERE, f".trace_r4_{mode}")
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    N_TRACE = 6
    with jax.profiler.trace(logdir):
        for _ in range(N_TRACE):
            out = step()
        jax.block_until_ready(out)

    planes = parse_xplanes(logdir)
    print(f"# planes: {list(planes)}", file=sys.stderr, flush=True)
    record = {"mode": mode, "iter_ms": round(iter_ms, 2), "batch": B,
              "n_trace": N_TRACE, "planes": {}}
    for pname, (events, occur) in planes.items():
        total_ms = sum(events.values()) / 1e9
        top = sorted(events.items(), key=lambda kv: -kv[1])[:40]
        rows = [
            {"op": k, "ms_total": round(v / 1e9, 3),
             "ms_per_iter": round(v / 1e9 / N_TRACE, 3),
             "count": occur[k],
             "pct": round(100 * v / max(sum(events.values()), 1), 2)}
            for k, v in top]
        record["planes"][pname] = {"sum_ms": round(total_ms, 2), "top": rows}
        if "TPU" in pname or "device" in pname.lower():
            print(f"\n== {pname} (sum {total_ms:.1f} ms over {N_TRACE} iters)",
                  file=sys.stderr)
            for r in rows[:30]:
                print(f"  {r['pct']:6.2f}%  {r['ms_per_iter']:9.3f} ms/it "
                      f"x{r['count']:<5d} {r['op'][:90]}", file=sys.stderr)
    with open(os.path.join(HERE, f"r4_trace_ops_{mode}.json"), "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"iter_ms": record["iter_ms"],
                      "planes": list(record["planes"])}), flush=True)


if __name__ == "__main__":
    main()
