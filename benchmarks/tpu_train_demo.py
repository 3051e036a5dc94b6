"""On-TPU end-to-end training demo (VERDICT r2 item 5).

Trains the flagship hierarchical-probabilistic M1 (bf16 compute, MC dropout,
fused on-device augmentation, CALR schedule, focal + ELBO-KL loss) on
synthetic ProstateX-geometry data (20x160x160 bpMRI-like volumes with
embedded lesions) ON THE CHIP, with:

  * PCaDetectionValidation every few epochs (Dice/AP/AUROC must improve),
  * async orbax checkpointing + MetricsLogger,
  * a mid-run interruption: training stops at half the epochs, a FRESH
    process-state model auto-resumes from orbax and finishes,
  * a secondary short run exercising the boundary-EDT loss path
    (region_boundary with the pipeline-precomputed signed EDT).

Writes docs/TPU_TRAIN_DEMO.json (history + validation trajectory + wall
times) for the record. Run standalone on the TPU (no JAX_PLATFORMS=cpu):

  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/tpu_train_demo.py

Reference contract: train_model.py:253-259 (compile/fit with callbacks).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

SPATIAL = (20, 160, 160)
N_TRAIN, N_VALID, BATCH = 24, 6, 2


def make_case(rng, with_lesion=True):
    """Synthetic bpMRI-like case: 3-channel noise volume with 1-2 bright
    ellipsoidal lesions in ch0/ch2 (T2W/ADC-like contrast)."""
    img = rng.normal(size=(*SPATIAL, 3)).astype(np.float32)
    lab = np.zeros(SPATIAL, np.float32)
    if with_lesion:
        for _ in range(rng.integers(1, 3)):
            cz = rng.integers(4, SPATIAL[0] - 4)
            cy, cx = rng.integers(30, 130, size=2)
            rz, ry, rx = rng.integers(2, 4), rng.integers(6, 14), rng.integers(6, 14)
            zz, yy, xx = np.ogrid[:SPATIAL[0], :SPATIAL[1], :SPATIAL[2]]
            m = (((zz - cz) / rz) ** 2 + ((yy - cy) / ry) ** 2 +
                 ((xx - cx) / rx) ** 2) <= 1.0
            lab[m] = 1.0
    img[..., 0] += lab * 2.5
    img[..., 2] -= lab * 1.5
    det = np.stack([1.0 - lab, lab], axis=-1).astype(np.float32)
    return img, det


def main():
    from bench_core import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.models.m1 import M1
    from prostatemr_3d_cad_cspca_tpu.train.checkpoint import CheckpointManager
    from prostatemr_3d_cad_cspca_tpu.train.trainer import (
        build_schedule, fit as trainer_fit, make_loss, make_optimizer)
    from prostatemr_3d_cad_cspca_tpu.train.validation import PCaDetectionValidation
    from prostatemr_3d_cad_cspca_tpu.utils.profiling import MetricsLogger

    record = {"t_start": time.time(), "phases": {}}
    rng = np.random.default_rng(0)
    train_cases = [make_case(rng) for _ in range(N_TRAIN)]
    valid_cases = [make_case(rng, with_lesion=(i % 3 != 0))
                   for i in range(N_VALID)]
    # prob models consume image ++ label channel (data_generators.py:82)
    valid_samples = [
        {"image": np.concatenate([im, det[..., 1:]], axis=-1),
         "detection": det} for im, det in valid_cases]

    def batches():
        order = np.random.default_rng(1)
        while True:
            idx = order.permutation(N_TRAIN)
            for i in range(0, N_TRAIN, BATCH):
                sel = idx[i:i + BATCH]
                img = np.stack([
                    np.concatenate([train_cases[j][0],
                                    train_cases[j][1][..., 1:]], axis=-1)
                    for j in sel])
                det = np.stack([train_cases[j][1] for j in sel])
                yield {"image": jnp.asarray(img), "detection": jnp.asarray(det)}

    steps = N_TRAIN // BATCH
    epochs_total = 24

    def mk_model():
        return M1(
            input_spatial_dims=SPATIAL, input_channels=4, num_classes=2,
            filters=(16, 32, 64, 128, 256),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
            probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
            dropout_mode="monte-carlo", dropout_rate=0.5,
            dtype=jnp.bfloat16, summary=False, seed=0)

    def mk_fit_kwargs(model, mgr):
        schedule = build_schedule("CALR", 1e-3, steps, epochs_total)
        validate = PCaDetectionValidation(
            model.get_detect_model(), valid_samples, proba_iter=2)
        return dict(
            epochs=epochs_total, steps_per_epoch=steps,
            optimizer=make_optimizer("adam", schedule),
            loss=make_loss("distribution_focal"),
            loss_weights=[1.0, 10.0],
            validate_fn=validate, validate_per_n_epochs=4,
            validate_min_epoch=4,
            augment_params=[1.00, 0.25, 0.15, 10.0, True, 1.20, 0.10, 0.025,
                            True, (0.50, 1.50)],
            train_obj="lesion", schedule=schedule,
            metrics_logger=MetricsLogger(
                os.path.join("/tmp/tpu_demo", "metrics.jsonl"), echo=False),
            checkpoint_manager=mgr,
        )

    os.makedirs("/tmp/tpu_demo", exist_ok=True)
    orbax_dir = "/tmp/tpu_demo/orbax"

    # ---- phase 1: train to the halfway point, then 'crash' -----------------
    t0 = time.time()
    model = mk_model()
    mgr = CheckpointManager(orbax_dir, save_interval_steps=4)
    kw = mk_fit_kwargs(model, mgr)
    kw["epochs"] = epochs_total // 2
    hist1 = trainer_fit(model, batches(), **kw)
    mgr.close()
    record["phases"]["train_half"] = {
        "wall_s": round(time.time() - t0, 1), "history": hist1}
    print(f"# phase1 done: loss {hist1['loss'][0]:.1f} -> "
          f"{hist1['loss'][-1]:.1f}", file=sys.stderr, flush=True)

    # ---- phase 2: FRESH model, auto-resume from orbax, finish --------------
    t0 = time.time()
    model2 = mk_model()
    mgr2 = CheckpointManager(orbax_dir, save_interval_steps=4)
    hist2 = trainer_fit(model2, batches(), **mk_fit_kwargs(model2, mgr2))
    mgr2.close()
    record["phases"]["train_resumed"] = {
        "wall_s": round(time.time() - t0, 1), "history": hist2}
    vals = hist1.get("val", []) + hist2.get("val", [])
    record["validation_trajectory"] = vals
    print(f"# phase2 (resumed) done; validations: "
          f"{[(v['epoch'], round(v['dice'], 3), round(v['lesion_ap'], 3)) for v in vals]}",
          file=sys.stderr, flush=True)

    # ---- phase 3: boundary-EDT loss path on-chip ---------------------------
    t0 = time.time()
    from prostatemr_3d_cad_cspca_tpu.ops.edt import signed_distance_map

    det_model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=(16, 32, 64, 128, 256),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(8, 8, 8, 8, 8), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, dtype=jnp.bfloat16, summary=False, seed=0)

    def bd_batches():
        order = np.random.default_rng(2)
        while True:
            idx = order.permutation(N_TRAIN)
            for i in range(0, N_TRAIN, BATCH):
                sel = idx[i:i + BATCH]
                img = np.stack([train_cases[j][0] for j in sel])
                det = np.stack([train_cases[j][1] for j in sel])
                dm = np.stack([signed_distance_map(train_cases[j][1][..., 1:])
                               for j in sel])
                yield {"image": jnp.asarray(img), "detection": jnp.asarray(det),
                       "dist_map": jnp.asarray(dm)}

    schedule = build_schedule("CALR", 1e-3, steps, 4)
    hist3 = det_model.compile(
        optimizer=make_optimizer("adam", schedule),
        loss=make_loss("region_boundary"),
    ).fit(bd_batches(), epochs=3, steps_per_epoch=steps, verbose=2)
    record["phases"]["boundary_edt"] = {
        "wall_s": round(time.time() - t0, 1), "history": hist3}
    print(f"# phase3 (boundary-EDT) loss {hist3['loss'][0]:.3f} -> "
          f"{hist3['loss'][-1]:.3f}", file=sys.stderr, flush=True)

    record["wall_s_total"] = round(time.time() - record.pop("t_start"), 1)
    out = os.path.join(os.path.dirname(HERE), "docs", "TPU_TRAIN_DEMO.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1, default=float)
    print(json.dumps({"ok": True,
                      "loss_first": hist1["loss"][0],
                      "loss_last": hist2["loss"][-1] if hist2["loss"] else None,
                      "validations": vals}), flush=True)


if __name__ == "__main__":
    main()
