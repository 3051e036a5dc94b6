"""Round-4 per-op ROOFLINE attribution (VERDICT r3 items 2+3).

Captures a jax.profiler trace of the cfg1 bf16 b120 inference program
(default) or the config4 b2 bf16 train step (--train), aggregates the
device XPlane PER LINE (the sequential main stream is the 'XLA Ops'
line; async DMA lines overlap it and are reported separately), and for
every main-stream op computes:

  * ms/iter self time,
  * bytes touched (every `dtype[dims]` shape literal in the HLO
    instruction text = output(s) written + operands read; tuple entries
    of copy-start count once each, which if anything OVERcounts),
  * achieved GB/s and the ratio of the op's own HBM-stream roofline
    (bytes / 711 GB/s measured ceiling, benchmarks/r2_probe_ceilings.py)
    to its measured time: ratio 1.0 = the op moves its bytes at the
    measured stream speed-of-light; <1 = slower than roofline.

Emits benchmarks/r4_roofline_{mode}.json with the full table plus a
program-level summary (total bytes, roofline time, measured wall,
program roofline fraction) — the evidence base for docs/ATTRIBUTION.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
MEASURED_HBM_STREAM = 711e9  # bytes/s, measured flat r+w stream (round 2)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "token": 0,
}
_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def op_bytes(op_text: str) -> int:
    """Sum bytes over every shape literal in an HLO instruction string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(op_text):
        sz = _DTYPE_BYTES.get(dtype)
        if sz is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sz
    return total


def parse_xplanes_by_line(logdir):
    """{plane_name: {line_name: {event_name: (dur_ps, count)}}}."""
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
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            meta = {mid: m.name for mid, m in plane.event_metadata.items()}
            lines = {}
            for line in plane.lines:
                events = defaultdict(lambda: [0, 0])
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    events[name][0] += ev.duration_ps
                    events[name][1] += 1
                if events:
                    lines[line.name or f"line{line.id}"] = {
                        k: tuple(v) for k, v in events.items()}
            if lines:
                out[plane.name] = lines
    return out


def main():
    mode = "train" if "--train" in sys.argv else "infer"
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

    logdir = os.path.join(HERE, f".trace_r4rf_{mode}")
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    N_TRACE = 6
    with jax.profiler.trace(logdir):
        for _ in range(N_TRACE):
            out = step()
        jax.block_until_ready(out)

    planes = parse_xplanes_by_line(logdir)
    record = {"mode": mode, "iter_ms": round(iter_ms, 2), "batch": B,
              "n_trace": N_TRACE,
              "hbm_stream_gbps": MEASURED_HBM_STREAM / 1e9, "lines": {}}
    for pname, lines in planes.items():
        for lname, events in lines.items():
            rows = []
            busy_ms = 0.0
            total_bytes = 0
            for op, (ps, count) in events.items():
                ms_it = ps / 1e9 / N_TRACE
                # module-level events (jit_detect wrappers) span the whole
                # program; exclude them from busy time, the op table and
                # byte sums — counting them would double the line's busy_ms
                if op.startswith(("jit_", "pjit_")) or "[" not in op:
                    continue
                busy_ms += ms_it
                nbytes = op_bytes(op) * count // N_TRACE
                total_bytes += nbytes
                roofline_ms = nbytes / MEASURED_HBM_STREAM * 1e3
                rows.append({
                    "op": op[:160], "ms_per_iter": round(ms_it, 3),
                    "count": count // N_TRACE,
                    "mbytes": round(nbytes / 1e6, 2),
                    "gbps": round(nbytes / (ms_it / 1e3) / 1e9, 1)
                    if ms_it > 0 else None,
                    "x_roofline": round(ms_it / roofline_ms, 2)
                    if roofline_ms > 0 else None,
                })
            rows.sort(key=lambda r: -r["ms_per_iter"])
            key = f"{pname}::{lname}"
            record["lines"][key] = {
                "busy_ms_per_iter": round(busy_ms, 2),
                "total_gbytes_per_iter": round(total_bytes / 1e9, 3),
                "roofline_ms_per_iter": round(
                    total_bytes / MEASURED_HBM_STREAM * 1e3, 2),
                "ops": rows[:120],
            }
            print(f"\n== {key}: busy {busy_ms:.1f} ms/iter, "
                  f"{total_bytes/1e9:.2f} GB/iter, roofline "
                  f"{total_bytes/MEASURED_HBM_STREAM*1e3:.1f} ms",
                  file=sys.stderr, flush=True)
            for r in rows[:25]:
                print(f"  {r['ms_per_iter']:8.3f} ms {str(r['mbytes']):>9} MB "
                      f"{str(r['gbps']):>7} GB/s x{r['x_roofline']} "
                      f"{r['op'][:80]}", file=sys.stderr)
    out_path = os.path.join(HERE, f"r4_roofline_{mode}.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"iter_ms": record["iter_ms"],
                      "lines": {k: {kk: v[kk] for kk in
                                    ("busy_ms_per_iter",
                                     "total_gbytes_per_iter",
                                     "roofline_ms_per_iter")}
                                for k, v in record["lines"].items()}}),
          flush=True)


if __name__ == "__main__":
    main()
