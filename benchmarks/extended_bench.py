"""Extended benchmarks covering the BASELINE.json configuration list.

Headline (config 1/2) lives in /root/repo/bench.py. This script measures:
  3. hierarchical probabilistic M1, multi-sample MC posterior inference
  4. full training step (focal + KL, on-device augmentation, CALR schedule)
  5. sliding-window whole-gland inference at full resolution

Writes benchmarks/results_extended.json and prints one JSON line.
Run on the TPU chip (no JAX_PLATFORMS=cpu).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sync(out):
    import jax

    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def _deadline_left():
    """Seconds until the orchestrator's global budget expires (inf if the
    worker runs standalone)."""
    dl = float(os.environ.get("BENCH_DEADLINE", "0"))
    return (dl - time.time()) if dl else float("inf")


def _best_of(f, n=3, iters=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main(only=None):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench_core import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.augment import AugmentParams, augment_batch
    from prostatemr_3d_cad_cspca_tpu.infer import (
        make_sliding_window_fn, mc_predict, sliding_window_predict)
    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    from prostatemr_3d_cad_cspca_tpu.train.trainer import (
        build_schedule, init_train_state, make_loss, make_optimizer,
        make_train_step)

    # Early liveness probe: bench.py's wedge watchdog kills any worker that
    # prints NOTHING within FIRST_OUTPUT_S, and this worker's first real
    # output used to come only after its first (200-475 s) program load —
    # healthy config3/4/5 workers were killed as "wedged" in round 3
    # (ADVICE r3). A trivial device op proves the tunnel is alive in ~1 s;
    # a real init-wedge still hangs BEFORE this line and trips the watchdog.
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(lambda a: a * 2.0)(jnp.ones((8, 128))))
    print(f"# init: device ready in {time.perf_counter()-t0:.1f}s "
          f"(worker --only {only})", file=sys.stderr, flush=True)

    results = {}
    rng = np.random.default_rng(0)

    def _persist():
        # MERGE-on-write (VERDICT r4 weak 6): each worker runs one --only
        # section, so a plain overwrite destroyed every other section's
        # numbers in the side artifact. Fresh keys win; other sections'
        # last-good values survive.
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "results_extended.json")
        merged = {}
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass
        merged.update(results)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged, f, indent=2)
        os.replace(tmp, out_path)

    def guarded(name, fn):
        try:
            fn()
        except Exception as e:  # record and continue — tunnel errors happen
            import traceback
            results[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
            print(f"# {name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            traceback.print_exc(limit=5)
        # persist + PRINT cumulative results after every section (success or
        # failure): bench.py parses the last stdout JSON, so a later wedge /
        # kill must not void completed sections of this worker.
        _persist()
        print(json.dumps(results), flush=True)

    # ---- config 3: probabilistic MC inference ------------------------------
    prob = M1(
        input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
        dropout_mode="monte-carlo", dropout_rate=0.5, summary=False)
    # config3 runs as TWO guarded sections so the single-volume point's
    # JSON lands the moment it is measured — round-4 run 6 lost a finished
    # measurement because the worker was budget-killed between the stderr
    # line and the single section-end JSON flush.
    _c3 = {}

    def config3_single():
        detect = prob.get_detect_model()
        x4 = jnp.asarray(rng.normal(size=(1, 20, 160, 160, 4)), jnp.float32)
        n_mc = 4
        mc = jax.jit(lambda p, x, k: mc_predict(detect, p, x, k, num_samples=n_mc))
        key = jax.random.PRNGKey(0)
        _c3.update(mc=mc, detect=detect, x4=x4, key=key, n_mc=n_mc)
        _sync(mc(prob.params, x4, key))
        dt = _best_of(lambda: mc(prob.params, x4, key))
        results["prob_mc4_samples_per_sec"] = round(n_mc / dt, 3)
        print(f"# config3 MC({n_mc}) {dt*1e3:.1f}ms -> "
              f"{results['prob_mc4_samples_per_sec']} samples/s", file=sys.stderr)

    def config3_batched():
        if not _c3:  # single section failed: rebuild the base pieces
            detect = prob.get_detect_model()
            x4 = jnp.asarray(rng.normal(size=(1, 20, 160, 160, 4)),
                             jnp.float32)
            _c3.update(detect=detect, x4=x4, key=jax.random.PRNGKey(0),
                       n_mc=4)
        detect = _c3.get("detect") or prob.get_detect_model()
        x4, key, n_mc = _c3["x4"], _c3["key"], _c3["n_mc"]
        # batched uncertainty sampling: B volumes x MC draws in ONE program.
        # Round-5 ladder: measure EVERY plan that fits the deadline (not
        # break-on-first-success — the round-4 break recorded b16-scan's 41
        # samples/s while b8-vmap's 58 went untried) and flush after each.
        # Plan values on this platform (2026-08-20): b8-vmap 58, b16-scan
        # 41 (the scan serializes draws the vmap plan overlaps), b12-vmap
        # is the round-3 78 lottery — it has been REJECTED by the compile
        # helper in rounds 4 and 5 (JaxRuntimeError after minutes of
        # compile), so it runs LAST, as a cheap retry only when budget
        # remains. Headline = best measured: prob_mc4_best_samples_per_sec.
        plans = [(8, False), (16, True), (12, False)]
        best = 0.0
        for Bv, use_scan in plans:
            if _deadline_left() < 150:
                print(f"# config3 b{Bv} skipped (deadline)", file=sys.stderr,
                      flush=True)
                continue
            tag = "scan" if use_scan else "vmap"
            try:
                mcb = jax.jit(lambda p, x, k, s=use_scan: mc_predict(
                    detect, p, x, k, num_samples=n_mc, scan_samples=s))
                xb = jnp.tile(x4, (Bv, 1, 1, 1, 1))
                _sync(mcb(prob.params, xb, key))
                dtb = _best_of(lambda: mcb(prob.params, xb, key))
            except Exception as e:  # noqa: BLE001 — helper 500 / OOM: next plan
                results[f"prob_mc4_b{Bv}_{tag}_error"] = f"{type(e).__name__}"[:80]
                print(f"# config3 b{Bv} {tag} failed ({type(e).__name__}) — "
                      "trying next plan", file=sys.stderr, flush=True)
                continue
            sps = round(n_mc * Bv / dtb, 3)
            key_tag = "_scan" if use_scan else ""
            results[f"prob_mc4_b{Bv}{key_tag}_samples_per_sec"] = sps
            best = max(best, sps)
            results["prob_mc4_best_samples_per_sec"] = best
            print(f"# config3 MC({n_mc}) b{Bv}{key_tag} {dtb*1e3:.1f}ms -> "
                  f"{sps} samples/s", file=sys.stderr)
            _persist()
            print(json.dumps(results), flush=True)

    if only in (None, "config3"):
        guarded("config3_single", config3_single)
        guarded("config3_batched", config3_batched)

    # ---- config 4: full training step (augment + focal + KL) ---------------
    schedule = build_schedule("CALR", 1e-3, steps_per_epoch=80, num_epochs=250)
    opt = make_optimizer("adam", schedule)
    aug = AugmentParams()
    # augmentation fused INTO the step: one program per training step
    step = make_train_step(prob, make_loss("distribution_focal"), opt,
                           elbo_beta=10.0, augment_params=aug,
                           train_obj="lesion")
    state = init_train_state(prob, opt)
    B = 2  # reference default batch (train_model.py:83)
    lab = rng.integers(0, 2, size=(B, 20, 160, 160))
    det_t = jnp.asarray(np.eye(2, dtype=np.float32)[lab])
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 20, 160, 160, 4)), jnp.float32),
        "detection": det_t,
    }
    k = jax.random.PRNGKey(1)

    def config4():
        st = {"s": state}  # the step donates its state arg: thread it

        def train_iter():
            new_state, m = step(st["s"], batch, k)
            st["s"] = new_state
            return m["loss"]

        _sync(train_iter())
        dt = _best_of(train_iter, iters=3)
        results["train_step_vols_per_sec"] = round(B / dt, 3)
        print(f"# config4 train step b{B} {dt*1e3:.1f}ms -> "
              f"{results['train_step_vols_per_sec']} vol/s", file=sys.stderr)

        # NOTE: larger train batches were probed (b8/b16) but the fp32
        # probabilistic train graph exceeds what this chip's compile helper
        # accepts (b16 is an explicit HBM OOM: f/4 tensors pay up to 8x
        # physical lane padding — docs/ROUND2_NOTES.md); b2 is both the
        # reference recipe (train_model.py:83) and the recorded figure.

    if only in (None, "config4"):
        guarded("config4", config4)

    # ---- config 4b: bf16 mixed-precision training step ---------------------
    # TPU-native recipe (bf16 compute, fp32 params/optimizer): +45% over the
    # fp32 reference step. Runs as its own worker — compiling a second large
    # train program in one process wedges the device tunnel. Batch is capped
    # at the reference's b2: b4 bf16 train compiles but FAULTS at execution
    # (INVALID_ARGUMENT; round-3 probe — the fault surfaces only on a true
    # sync, async enqueue masks it), b6+ crashes the compile helper, and
    # b8/b16 fp32 were already OOM in round 2 (docs/ROUND2_NOTES.md).
    def config4b():
        prob16 = M1(
            input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
            dropout_mode="monte-carlo", dropout_rate=0.5, summary=False,
            dtype=jnp.bfloat16)
        opt16 = make_optimizer("adam", schedule)
        step16 = make_train_step(prob16, make_loss("distribution_focal"),
                                 opt16, elbo_beta=10.0,
                                 augment_params=aug, train_obj="lesion")
        st = {"s": init_train_state(prob16, opt16)}

        def it():
            st["s"], m = step16(st["s"], batch, k)
            return m["loss"]

        _sync(it())
        dt = _best_of(it, iters=3)
        results["train_step_bf16_vols_per_sec"] = round(B / dt, 3)
        print(f"# config4b bf16 train step b{B} {dt*1e3:.1f}ms -> "
              f"{results['train_step_bf16_vols_per_sec']} vol/s",
              file=sys.stderr)

    if only == "config4b":
        guarded("config4b", config4b)

    # ---- config 4s: K-step lax.scan training program (bf16) ----------------
    # The training-side fixed-cost amortization (VERDICT r3 item 2): at b2 a
    # single step pays the ~172 ms per-program device tax on ~90 ms of
    # compute. make_train_step(scan_steps=K) runs K full optimizer steps
    # (fused augmentation + focal/KL + amsgrad update, donated state) in ONE
    # compiled program; batches are staged device-resident as a (K, B, ...)
    # stack. Own worker: compiling a second large train program in a process
    # with another config's state resident wedges the tunnel.
    def _config4s(K):
        prob16 = M1(
            input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
            dropout_mode="monte-carlo", dropout_rate=0.5, summary=False,
            dtype=jnp.bfloat16)
        opt16 = make_optimizer("adam", schedule)
        multi = make_train_step(prob16, make_loss("distribution_focal"),
                                opt16, elbo_beta=10.0, augment_params=aug,
                                train_obj="lesion", scan_steps=K)
        st = {"s": init_train_state(prob16, opt16)}
        batches = jax.tree_util.tree_map(
            lambda b: jnp.stack([b] * K), batch)
        k2 = jax.random.PRNGKey(2)

        def it():
            st["s"], m = multi(st["s"], batches, k2)
            return m["loss"]

        _sync(it())
        dt = _best_of(it, n=2, iters=2)
        vps = B * K / dt
        results[f"train_scan_k{K}_bf16_vols_per_sec"] = round(vps, 3)
        print(f"# config4s bf16 scan K={K} b{B} {dt*1e3:.1f}ms/program "
              f"({dt/K*1e3:.1f}ms/step) -> {vps:.3f} vol/s", file=sys.stderr,
              flush=True)

    if only == "config4s":
        guarded("config4s_k16", lambda: _config4s(16))

    # ---- config 4g: gradient-accumulation scan (bf16) -----------------------
    # VERDICT r4 item 3: K microbatches of b2 through lax.scan with ONE
    # optimizer update per program. Each conv still sees the b2 shapes (the
    # platform INVALID_ARGUMENTs b4+ train programs), while the
    # batch-independent weight/optimizer/backward-weight traffic of the
    # update amortizes over 2K volumes. Effective batch = 2K.
    def _config4g(K):
        prob16 = M1(
            input_spatial_dims=(20, 160, 160), input_channels=4, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
            dropout_mode="monte-carlo", dropout_rate=0.5, summary=False,
            dtype=jnp.bfloat16)
        opt16 = make_optimizer("adam", schedule)
        accum = make_train_step(prob16, make_loss("distribution_focal"),
                                opt16, elbo_beta=10.0, augment_params=aug,
                                train_obj="lesion", accum_steps=K)
        st = {"s": init_train_state(prob16, opt16)}
        batches = jax.tree_util.tree_map(
            lambda b: jnp.stack([b] * K), batch)
        k2 = jax.random.PRNGKey(3)

        def it():
            st["s"], m = accum(st["s"], batches, k2)
            return m["loss"]

        _sync(it())
        dt = _best_of(it, n=2, iters=2)
        vps = B * K / dt
        results[f"train_accum_k{K}_bf16_vols_per_sec"] = round(vps, 3)
        print(f"# config4g bf16 grad-accum K={K} b{B} {dt*1e3:.1f}ms/program "
              f"({dt/K*1e3:.1f}ms/microbatch) -> {vps:.3f} vol/s",
              file=sys.stderr, flush=True)

    if only == "config4g":
        guarded("config4g_k16", lambda: _config4g(16))

    # ---- config 5: sliding-window whole-gland full resolution --------------
    det_model = M1(
        input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False, init_params=False)
    det_model.params = prob.params if False else det_model.init(0)
    net, params = det_model.net, det_model.params
    tile_fn = jax.jit(
        lambda x: net.apply({"params": params}, x, train=False)["y_softmax"][..., :2])
    whole = jnp.asarray(rng.normal(size=(24, 256, 256, 3)), jnp.float32)

    # config5 runs as TWO guarded sections, SMALLEST program first: the
    # round-4 record lost config5 entirely twice because the worker opened
    # with the K=12 batched program — the longest first-load in the plan —
    # and a tunnel wedge mid-load voided the whole worker. The single-case
    # program loads faster and its JSON flushes the moment it lands, so a
    # later wedge/kill still leaves a config5 number (same flush-per-point
    # split that fixed config3 in run 6 of the validation campaign).
    def config5_single():
        # ONE compiled program: tile gather + forward + Gaussian blend
        # (VERDICT r2 item 6 — the eager loop was dispatch-bound at ~9 ms/op).
        sw = make_sliding_window_fn(
            lambda x: net.apply({"params": params}, x, train=False)[
                "y_softmax"][..., :2],
            full_spatial=(24, 256, 256), window=(20, 160, 160),
            in_channels=3, out_channels=2, overlap=0.25, batch_size=8)
        _sync(sw(whole))
        dt = _best_of(lambda: sw(whole), n=2, iters=4)
        results["sliding_window_fullres_sec_per_case_single"] = round(dt, 4)
        print(f"# config5 whole-gland 24x256x256 {dt:.3f}s/case (one-program)",
              file=sys.stderr)

    def config5_batched():
        # K cases per program — the headline: the single-case result sits ON
        # the measured ~170 ms per-program device cost, and the K-case vmap
        # amortizes it (K-ladder 206/254/293 ms at K=4/8/12, marginal
        # ~10.9 ms/case, benchmarks/r3_probe_batch2).
        if _deadline_left() < 150:
            print("# config5 batched point skipped (deadline)",
                  file=sys.stderr, flush=True)
            return
        K = 12
        swk = make_sliding_window_fn(
            lambda x: net.apply({"params": params}, x, train=False)[
                "y_softmax"][..., :2],
            full_spatial=(24, 256, 256), window=(20, 160, 160),
            in_channels=3, out_channels=2, overlap=0.25, batch_size=8,
            cases=K)
        wholes = jnp.stack([whole] * K)
        _sync(swk(wholes))
        dtk = _best_of(lambda: swk(wholes), n=2, iters=4) / K
        # headline = best of (single, batched): on a bad tunnel day a
        # regressed batched point must not mask the already-measured
        # single-case time (ADVICE r4)
        single = results.get("sliding_window_fullres_sec_per_case_single",
                             float("inf"))
        results["sliding_window_fullres_sec_per_case"] = round(
            min(dtk, single), 4)
        results[f"sliding_window_fullres_sec_per_case_b{K}"] = round(dtk, 4)
        print(f"# config5 whole-gland b{K}-cases {dtk:.3f}s/case (one-program)",
              file=sys.stderr, flush=True)

    if only in (None, "config5"):
        # distinct guard names so a double failure keeps BOTH causes
        # (ADVICE r4 — one shared name lost the first error)
        guarded("config5_single", config5_single)
        guarded("config5_batched", config5_batched)

    # ---- config 5b: CASCADED two-stage + sliding window + MC uncertainty ---
    # The full BASELINE.json config-5 wording: "cascaded two-stage M1 with
    # sliding-window whole-gland inference and batched uncertainty sampling
    # at full resolution". Two-stage detect per tile batch, MC-batched over
    # posterior draws (MC dropout), Gaussian-blended tiles.
    def config5b():
        casc = M1(
            input_spatial_dims=(20, 160, 160), input_channels=3, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            cascaded="noisy-or", dropout_mode="monte-carlo", dropout_rate=0.5,
            summary=False)
        detect = casc.get_detect_model()
        n_mc = 2
        key = jax.random.PRNGKey(0)

        cparams = casc.params
        cnet = casc.net

        def tile_mc(x):
            # MC-batched posterior draws of the cascaded joint detection
            # (traceable: folds into the one-program sliding window)
            keys = jax.random.split(key, n_mc)

            def one(kk):
                d, l = jax.random.split(kk)
                out = cnet.apply({"params": cparams}, (x, x), train=False,
                                 rngs={"dropout": d, "latent": l})
                return out["detection_2"]

            return jnp.mean(jax.vmap(one)(keys), axis=0)

        sw = make_sliding_window_fn(
            tile_mc, full_spatial=(24, 256, 256), window=(20, 160, 160),
            in_channels=3, out_channels=2, overlap=0.25, batch_size=4)
        _sync(sw(whole))
        dt = _best_of(lambda: sw(whole), n=2, iters=2)
        results["cascaded_sw_mc_sec_per_case"] = round(dt, 4)
        print(f"# config5b cascaded+MC({n_mc}) whole-gland {dt:.3f}s/case "
              "(one-program)", file=sys.stderr)

    if only == "config5b":
        guarded("config5b", config5b)

    _persist()
    print(json.dumps(results))


def run_isolated():
    """Run each config in its own process: the device tunnel wedges when a
    new large program is compiled while another config's state is resident
    (observed: config4 after config3 => INVALID_ARGUMENT; standalone OK)."""
    import subprocess

    here = os.path.abspath(__file__)
    merged = {}
    for cfg in ("config3", "config4", "config4s", "config4g", "config4b",
                "config5", "config5b"):
        for attempt in range(2):
            time.sleep(20)  # let the previous process release the device
            proc = subprocess.run(
                [sys.executable, here, "--only", cfg],
                capture_output=True, text=True, timeout=1200)
            sys.stderr.write(proc.stderr[-2000:])
            got = False
            for line in proc.stdout.strip().splitlines()[::-1]:
                try:
                    parsed = json.loads(line)
                    ok = any(not k.endswith("_error") for k in parsed)
                    if ok or attempt == 1:
                        merged.update(parsed)
                    got = ok
                    break
                except json.JSONDecodeError:
                    continue
            if got:
                break
    out_path = os.path.join(os.path.dirname(here), "results_extended.json")
    prior = {}
    try:
        with open(out_path) as f:
            prior = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    prior.update(merged)
    with open(out_path, "w") as f:
        json.dump(prior, f, indent=2)
    print(json.dumps(merged))


if __name__ == "__main__":
    if "--only" in sys.argv:
        main(only=sys.argv[sys.argv.index("--only") + 1])
    else:
        run_isolated()
