"""Headline benchmark worker: BASELINE.json configs 1-2 (deterministic M1
inference), run on the real TPU chip in its own process (the device tunnel
wedges when multiple large programs share a process — see extended_bench).

Prints one JSON line:
  cfg1 (plain attention U-Net): bf16 b64/96/120 sweep, then the
       foreground-output b124/128 points (the headline — the halved output
       buffer clears the b120 HBM ceiling), then fp32_b8; MFU vs the
       measured on-chip matmul ceiling + HBM roofline fraction
  cfg2 (dense-skip + deep supervision): bf16_b4 (BASELINE wording) /
       bf16_b32 / bf16_b112

``--sections cfg1,fgout,cfg2`` (default all) restricts the run — bench.py
uses it to re-attempt sections a timed-out first pass missed.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# measured on THIS chip via benchmarks/r4_probe_ceiling2.py (in-program
# slope over 4096^3 bf16 matmul chains with a fetch-forced scalar output):
# 0.714 ms/matmul -> 192.6 TFLOP/s = the v5e spec sheet. The round-2 value
# (980e12, r2_probe_ceilings.py) measured through dispatch pipelining on a
# platform where block_until_ready does not synchronize large outputs, and
# is retired (docs/ROUND4_NOTES.md).
MEASURED_MATMUL_CEILING = 192.6e12  # bf16 FLOP/s, in-program chain slope
MEASURED_HBM_STREAM = 711e9        # bytes/s, flat r+w stream

DEADLINE = float(os.environ.get("BENCH_DEADLINE", "0")) or None


def _time_left():
    return float("inf") if DEADLINE is None else DEADLINE - time.time()


def enable_compile_cache():
    """Persistent XLA compile cache (VERDICT r2 item 1): the 100 s+ M1
    compiles pay once across bench invocations. Harmless no-op if the
    backend doesn't support executable serialization."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # pragma: no cover - config names vary by version
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


def _measure(fn, args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    sections = {"cfg1", "fgout", "cfg2", "fp32"}
    if "--sections" in sys.argv:
        sections = set(
            sys.argv[sys.argv.index("--sections") + 1].split(","))

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    from prostatemr_3d_cad_cspca_tpu.utils.flops import count_matmul_flops

    results = {}

    def build(dtype, dense=False, ds=False):
        return M1(
            input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8),
            att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
            dense_skip=dense, deep_supervision=ds,
            dropout_rate=0.0, summary=False, dtype=dtype, init_params=False)

    flops_per_vol = None
    # the fp32 build + FLOP count also run for fgout-only invocations:
    # the fgout knee is the headline and its MFU needs flops_per_vol
    # (round 4: the driver plan runs core with --sections fgout alone —
    # the plain-b120 point's 244 s first-load was crowding config3 out)
    if sections & {"cfg1", "fgout"}:
        t0 = time.perf_counter()
        fp32 = build(None)
        params = fp32.init(0)
        print(f"# init: {time.perf_counter() - t0:.1f}s", file=sys.stderr,
              flush=True)

        # FLOPs per volume (shape-only trace; counted once, cfg1 arch)
        flops_per_vol = count_matmul_flops(
            lambda p, v: fp32.net.apply(
                {"params": p}, v, train=False)["y_softmax"],
            params, jnp.zeros((1, 20, 160, 160, 3)))
        results["cfg1_model_gflops_per_volume"] = round(flops_per_vol / 1e9, 1)

    best = (0.0, None)
    bf16_points = []  # (batch, sec/iter) — recorded for the round ledger

    # Round-4 attribution (VERDICT r3 items 2+3, docs/ROUND4_NOTES.md +
    # docs/ATTRIBUTION.md): the cfg1 wall is the SUM of per-op HBM-roofline
    # costs (every staging hypothesis was A/B-rejected; the hottest block
    # class runs at ~1.24x its own roofline). At 16-64 channels the model's
    # arithmetic intensity (~36-72 FLOP/byte) sits far below the v5e ridge
    # (~270 FLOP/byte at 192.6 TFLOP/s over 711 GB/s), so the honest
    # ceiling is the HBM roofline, and MFU-vs-matmul-peak is reported as a
    # secondary number against the CORRECTED 192.6 TFLOP/s ceiling
    # (r4_probe_ceiling2.py; the retired 980 figure was a measurement
    # artifact — block_until_ready does not sync large outputs here).

    def _update_mfu():
        if flops_per_vol is None or best[1] is None:
            return  # fgout-only re-attempt: no FLOP count in this process
        results["cfg1_mfu_vs_measured_ceiling"] = round(
            best[0] * flops_per_vol / MEASURED_MATMUL_CEILING, 4)
        results["cfg1_hbm_roofline_note"] = (
            "measured stream ceiling 711 GB/s; see docs/ROUND2_NOTES.md")
        results["best_config"] = best[1]
        results["cfg1_attribution_note"] = (
            "model is HBM-bound by design (AI ~36-72 FLOP/byte < ~270 "
            "ridge); per-op roofline table in docs/ATTRIBUTION.md; matmul "
            "ceiling re-measured at 192.6 TFLOP/s (r4_probe_ceiling2)")

    # ---- config 1: plain attention U-Net ----------------------------------
    # Session warm-up probe. NOTE: this only settles per-session setup
    # (~1 s); it does NOT absorb the variable 150-550 s cost of loading the
    # first BIG executable (measured: warmup 0.8 s, first b64 program still
    # 201 s — docs/ROUND3_NOTES.md). That cost lands in _measure's warmup
    # iterations and is excluded from the timed loop; this probe exists to
    # separate the two in the stderr log.
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# warmup program: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # bf16 sweep FIRST (the headline), fp32_b8 LAST and deadline-gated: its
    # 500 s compile ate the round-2 bench budget (VERDICT r2 item 1).
    # Batch sweep caps at 120: b124+ is HBM RESOURCE_EXHAUSTED on this chip
    # (the fgout section below clears that ceiling with a halved output
    # buffer) and the per-program cost dominates below b96
    # (docs/ROUND2_NOTES.md).
    # b64 and b96 moved behind the optional "cfg1full" token (round 4):
    # their numbers have been stable for three rounds and each point's
    # ~60-475 s first-load cost was crowding the BASELINE config3/4/5
    # workers out of the 960 s budget (this round's validation run: a
    # single 480 s first-load burn on the sweep left room for nothing
    # past config4).
    cfg1_plan = ()
    if "cfg1" in sections:
        cfg1_plan = (("bf16_b120", jnp.bfloat16, 120),)
        if "cfg1full" in sections:
            cfg1_plan = (("bf16_b64", jnp.bfloat16, 64),
                         ("bf16_b96", jnp.bfloat16, 96)) + cfg1_plan
    for tag, dtype, batch in cfg1_plan:
        net = (fp32 if dtype is None else build(dtype)).net

        @jax.jit
        def detect(p, v):
            return net.apply({"params": p}, v, train=False)["y_softmax"][..., :2]

        # generate a small block on host, tile ON DEVICE: host-side
        # rng.normal for b120 volumes costs ~30 s/config on this 1-core box
        base = np.random.default_rng(0).normal(
            size=(8, 20, 160, 160, 3)).astype(np.float32)
        x = jnp.tile(jnp.asarray(base, jnp.float32 if dtype is None else dtype),
                     (batch // 8, 1, 1, 1, 1))
        t0 = time.perf_counter()
        dt = _measure(detect, (params, x))
        vps = batch / dt
        print(f"# cfg1 {tag}: {dt*1e3:.1f} ms/iter -> {vps:.1f} vol/s "
              f"(compile+run {time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        results[f"cfg1_{tag}"] = round(vps, 3)
        if dtype is not None:
            bf16_points.append((batch, dt))
        if vps > best[0]:
            best = (vps, f"cfg1_{tag}")
        # partial record after EVERY point: a later hard-hang (observed on
        # this tunnel) must not void completed measurements
        print(json.dumps(results), flush=True)

    if "cfg1" in sections:
        _update_mfu()
        print(json.dumps(results), flush=True)

    import gc

    # Free cfg1's device buffers before the near-ceiling fgout batches:
    # the still-resident b120 input (3.7 GB bf16) plus a b128 input would
    # not fit (same in-process OOM as the cfg2 b112 point, see below).
    try:
        del x, detect
    except NameError:
        pass
    gc.collect()

    # ---- cfg1 foreground-only output: past the b120 HBM ceiling -----------
    # The standard cfg1 program materializes a 983 MB fp32 2-channel output
    # at b120 and b124+ is RESOURCE_EXHAUSTED. Serving's EXACT
    # foreground-only transfer (softmax bg reconstructed host-side as
    # 1 - fg, serve.py --TRANSFER_CHANNELS foreground) halves that buffer
    # inside the same program, so larger batches fit. Served product is
    # identical fp32 probabilities. This section produces the HEADLINE
    # (b128 measured 628.8 vol/s, r3_probe_slim.py), so it runs directly
    # after the bf16 sweep — before fp32_b8 and cfg2.
    if "fgout" in sections and _time_left() > 150:
        m1fg = build(jnp.bfloat16)
        net_fg = m1fg.net

        @jax.jit
        def detect_fg(p, v):
            y = net_fg.apply({"params": p}, v, train=False)["y_softmax"]
            return y[..., 1:2]

        params_fg = m1fg.init(0)
        # 4-volume base: 124/128 divide by 4, so the tile is exact
        # (a tile-then-slice would transiently hold TWO near-ceiling input
        # buffers and could OOM during setup, not in the program under test)
        # Sweep measured on-chip (benchmarks/r3_probe_slim.py): fgout
        # b120/124/128 ~203-204 ms, b136 falls off a cliff (411 ms — HBM
        # spill), b144 RESOURCE_EXHAUSTED; an fp16 output cast on top adds
        # nothing (activations bind past b128, not the output buffer).
        # So the sweep stops at the measured knee.
        base_fg = np.random.default_rng(0).normal(
            size=(4, 20, 160, 160, 3)).astype(np.float32)
        # Round 4: the concat-free decoder stitch removed the largest live
        # intermediates, so the sweep re-probes past the old b128 knee; the
        # exception guard stops it at the first OOM/cliff point.
        prev_vps = 0.0
        for batch in (124, 128, 136, 144, 152):
            if _time_left() < 90:
                break
            xf = None
            try:
                xf = jnp.tile(jnp.asarray(base_fg, jnp.bfloat16),
                              (batch // 4, 1, 1, 1, 1))
                try:
                    dt = _measure(detect_fg, (params_fg, xf), iters=8)
                except Exception as e:  # noqa: BLE001
                    # ABORTED/INTERNAL are transient tunnel faults (observed
                    # round 4: a b124 ABORT with b124 loading fine minutes
                    # later) — retry the point once; only a true
                    # RESOURCE_EXHAUSTED ends the sweep immediately
                    if "RESOURCE_EXHAUSTED" in str(e) or _time_left() < 120:
                        raise
                    print(f"# cfg1 fgout b{batch} transient "
                          f"{type(e).__name__}; retrying point once",
                          file=sys.stderr, flush=True)
                    time.sleep(5)
                    dt = _measure(detect_fg, (params_fg, xf), iters=8)
            except Exception as e:  # RESOURCE_EXHAUSTED / helper 500
                print(f"# cfg1 fgout b{batch} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", file=sys.stderr, flush=True)
                del xf
                gc.collect()
                break
            vps = batch / dt
            print(f"# cfg1 fgout b{batch}: {dt*1e3:.1f} ms/iter -> "
                  f"{vps:.1f} vol/s", file=sys.stderr, flush=True)
            results[f"cfg1_bf16_b{batch}_fgout"] = round(vps, 3)
            if vps > best[0]:  # the fgout knee IS the headline: keep best/MFU
                best = (vps, f"cfg1_bf16_b{batch}_fgout")  # consistent with it
            del xf
            gc.collect()
            print(json.dumps(results), flush=True)
            if vps < prev_vps * 0.9:  # fell off the HBM-spill cliff
                print(f"# cfg1 fgout b{batch} is past the knee "
                      f"({vps:.1f} < 0.9*{prev_vps:.1f}); stopping sweep",
                      file=sys.stderr, flush=True)
                break
            prev_vps = vps
        _update_mfu()
        try:
            del m1fg, net_fg, detect_fg, params_fg, base_fg
        except NameError:
            pass
        gc.collect()

    print(json.dumps(results), flush=True)

    # ---- config 2: dense-skip + deep supervision ---------------------------
    # Free cfg1's device buffers first: the b112 sweep point needs the HBM
    # that cfg1's b120 input still holds (probe-verified to fit standalone;
    # OOM'd in-process without this release).
    # (params/fp32 stay alive for the deadline-gated fp32_b8 point below —
    # they are small next to the activation/input buffers freed above)
    gc.collect()
    if "cfg2" in sections and _time_left() > 120:
        m2 = build(jnp.bfloat16, dense=True, ds=True)
        net2 = m2.net
        params2 = m2.init(0)

        @jax.jit
        def detect2(p, v):
            return net2.apply({"params": p}, v, train=False)["y_softmax"][..., :2]

        base2 = np.random.default_rng(0).normal(
            size=(4, 20, 160, 160, 3)).astype(np.float32)
        # b112 is the measured sweet spot (benchmarks/r3_probe_batch2.py):
        # the dense+DS program is ~85% fixed cost, so batch amortization
        # keeps paying long past cfg1's knee (379 vol/s vs 126 at b32).
        # Each point is individually guarded: a RESOURCE_EXHAUSTED at the
        # largest batch must not void the smaller points (or the worker).
        for tag, batch in (("b4", 4), ("b32", 32), ("b112", 112)):
            x2 = None
            try:
                # the tile itself can RESOURCE_EXHAUST at b112 — keep the
                # allocation inside the guard too
                x2 = jnp.tile(jnp.asarray(base2, jnp.bfloat16),
                              (batch // 4, 1, 1, 1, 1))
                dt = _measure(detect2, (params2, x2),
                              iters=10 if batch > 4 else 20)
            except Exception as e:
                print(f"# cfg2 bf16_{tag} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", file=sys.stderr, flush=True)
                del x2
                gc.collect()
                break
            print(f"# cfg2 bf16_{tag}: {dt*1e3:.1f} ms/iter -> {batch/dt:.1f} vol/s",
                  file=sys.stderr, flush=True)
            results[f"cfg2_dense_ds_bf16_{tag}"] = round(batch / dt, 3)
            del x2
            gc.collect()
    elif "cfg2" in sections:
        print("# skipping cfg2 (deadline)", file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)

    # ---- cfg1 fp32_b8 (reference-recipe precision point) ------------------
    # Its OWN section ("fp32"), run LAST by bench.py and deadline-gated: its
    # ~500 s fresh compile ate the round-2 bench budget once (VERDICT r2
    # item 1); every figure above outranks it.
    if "fp32" in sections and _time_left() > 240:
        try:
            del m2, net2, params2, detect2, base2
        except NameError:
            pass
        gc.collect()
        if "cfg1" not in sections:  # standalone re-attempt: build fresh
            fp32 = build(None)
            params = fp32.init(0)
            print("# init: fp32 model ready", file=sys.stderr, flush=True)

        net_fp32 = fp32.net

        @jax.jit
        def detect_fp32(p, v):
            return net_fp32.apply(
                {"params": p}, v, train=False)["y_softmax"][..., :2]

        base8 = np.random.default_rng(0).normal(
            size=(8, 20, 160, 160, 3)).astype(np.float32)
        try:
            t0 = time.perf_counter()
            dt = _measure(detect_fp32, (params, jnp.asarray(base8)))
            vps = 8 / dt
            print(f"# cfg1 fp32_b8: {dt*1e3:.1f} ms/iter -> {vps:.1f} vol/s "
                  f"(compile+run {time.perf_counter()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
            results["cfg1_fp32_b8"] = round(vps, 3)
        except Exception as e:
            print(f"# cfg1 fp32_b8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr, flush=True)
    elif "fp32" in sections:
        print("# skipping fp32_b8 (deadline)", file=sys.stderr, flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
