"""Training-dynamics parity harness: TF/Keras oracle vs this framework.

Forward-pass parity (tests/test_tf_parity.py) proves the architectures are
voxel-identical; this harness proves the TRAINING RECIPE is too (reference:
tf2.5/scripts/train_model.py:113-131, 230-259): starting from identical
weights, the same synthetic batch sequence through

  * focal loss (alpha=[1,1], gamma=2)          — losses.py:20-49
  * Adam + amsgrad                             — train_model.py:120-121
  * cosine-decay-restarts LR (t_mul 2, m_mul 1, alpha 1e-3)
                                               — train_model.py:113-116

must produce matching loss curves step for step. The Keras side runs an
explicit GradientTape loop (not .fit) so reductions are reference-exact and
nothing hides in Keras callbacks.

Run:  JAX_PLATFORMS=cpu python benchmarks/parity_training.py [--steps N]
Writes docs/PARITY.md with the per-step table + Dice/AP eval parity.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This harness is CPU-only (TF oracle runs on CPU; the JAX side must match
# it, not race the TPU tunnel). The axon plugin re-asserts itself OVER the
# JAX_PLATFORMS env var (tests/conftest.py gotcha), so the config call is
# the only reliable override.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SPATIAL = (4, 16, 16)
FILTERS = (4, 8, 12, 16, 24)
STRIDES = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
SE_RED = (2, 2, 2, 2, 2)
BATCH = 2
BASE_LR = 1e-3
GAMMA = 2.0
ALPHA = (1.0, 1.0)


def synth_batches(steps: int, seed: int = 0):
    """Deterministic synthetic (image, one-hot label) batch sequence."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        img = rng.normal(size=(BATCH, *SPATIAL, 3)).astype(np.float32)
        blob = np.zeros((BATCH, *SPATIAL), np.float32)
        for b in range(BATCH):
            z, y, x = (int(rng.integers(1, s - 1)) for s in SPATIAL)
            blob[b, max(z - 1, 0) : z + 1,
                 max(y - 4, 0) : y + 4, max(x - 4, 0) : x + 4] = 1.0
        onehot = np.stack([1.0 - blob, blob], axis=-1).astype(np.float32)
        batches.append((img, onehot))
    return batches


def build_tf():
    from tf_cpu_baseline import build_m1_tf

    return build_m1_tf(
        input_shape=(*SPATIAL, 3), num_classes=2, filters=FILTERS,
        strides=STRIDES, kernels=KERNELS, se_reduction=SE_RED)


def run_tf(tf_model, batches, first_decay_steps: int, eval_at=(),
           eval_imgs=None):
    import tensorflow as tf

    sched = tf.keras.optimizers.schedules.CosineDecayRestarts(
        BASE_LR, first_decay_steps, t_mul=2.0, m_mul=1.0, alpha=1e-3)
    opt = tf.keras.optimizers.Adam(learning_rate=sched, amsgrad=True)
    w = tf.constant(ALPHA, tf.float32)

    def focal(y_true, y_pred):
        # reference losses.py:32-39 semantics: renormalize, clip, sum over
        # voxels+classes, mean over batch
        y_pred = y_pred / tf.reduce_sum(y_pred, axis=-1, keepdims=True)
        y_pred = tf.clip_by_value(y_pred, 1e-7, 1.0 - 1e-7)
        ce = y_true * (-tf.math.log(y_pred))
        fl = w * y_true * tf.pow(1.0 - y_pred, GAMMA) * ce
        return tf.reduce_mean(tf.reduce_sum(fl, axis=[1, 2, 3, 4]))

    losses = []
    evals = {}
    for i, (img, lab) in enumerate(batches):
        with tf.GradientTape() as tape:
            probs = tf_model(tf.constant(img), training=True)
            loss = focal(tf.constant(lab), probs)
        grads = tape.gradient(loss, tf_model.trainable_variables)
        opt.apply_gradients(zip(grads, tf_model.trainable_variables))
        losses.append(float(loss))
        if (i + 1) in eval_at:
            evals[i + 1] = tf_model(
                tf.constant(eval_imgs), training=False).numpy()[..., 1]
    return losses, evals


def snapshot_params(tf_model):
    """Import the (initial) Keras weights into a fresh flax param tree."""
    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import import_keras_m1_weights

    model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
        se_reduction=SE_RED,
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False)
    return model, import_keras_m1_weights(tf_model.layers, model.params)


def run_jax(model, params, batches, first_decay_steps: int, eval_at=(),
            eval_imgs=None):
    import jax
    import jax.numpy as jnp

    from prostatemr_3d_cad_cspca_tpu.losses import Focal
    from prostatemr_3d_cad_cspca_tpu.train.schedules import cosine_decay_restarts
    from prostatemr_3d_cad_cspca_tpu.train.trainer import make_optimizer
    import optax

    sched = cosine_decay_restarts(
        BASE_LR, first_decay_steps=first_decay_steps, t_mul=2.0, m_mul=1.0,
        alpha=1e-3)
    tx = make_optimizer("adam", learning_rate=sched)
    opt_state = tx.init(params)
    focal = Focal(alpha=ALPHA, gamma=GAMMA)
    net = model.net

    @jax.jit
    def step(params, opt_state, img, lab):
        def loss_fn(p):
            out = net.apply({"params": p}, img, train=True)
            return focal(lab, out["y_softmax"])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    evals = {}
    for i, (img, lab) in enumerate(batches):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img), jnp.asarray(lab))
        losses.append(float(loss))
        if (i + 1) in eval_at:
            evals[i + 1] = np.asarray(net.apply(
                {"params": params}, jnp.asarray(eval_imgs),
                train=False)["y_softmax"])[..., 1]
    return params, losses, evals


# Task parameters picked by benchmarks/r5_probe_learnable.py (jax side
# only — the stacks track, so task selection is recipe-neutral): +2.0
# signal collapses to all-background under the reference recipe at long
# horizons; +4.0 with the wider blob climbs monotonically through Dice
# 0.5 (step ~70) to a ~0.69 plateau at 120 steps.
LEARN_SIGNAL = 4.0
LEARN_HALF_Y = 6


def learnable_batches(steps: int, seed: int = 7):
    """LEARNABLE synthetic task (VERDICT r4 item 7): the image carries the
    label signal (+LEARN_SIGNAL in channel 0 inside the blob), so a correct
    training recipe drives Dice UP to a plateau — unlike ``synth_batches``
    where the blob location is independent noise and Dice can only decay.
    A recipe divergence (wrong LR schedule, wrong loss reduction, wrong
    optimizer eps) changes the steps-to-threshold, making this anchor
    falsifiable."""
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        img = rng.normal(size=(BATCH, *SPATIAL, 3)).astype(np.float32)
        blob = np.zeros((BATCH, *SPATIAL), np.float32)
        for b in range(BATCH):
            z, y, x = (int(rng.integers(1, s - 1)) for s in SPATIAL)
            blob[b, max(z - 1, 0) : z + 1,
                 max(y - LEARN_HALF_Y, 0) : y + LEARN_HALF_Y,
                 max(x - LEARN_HALF_Y, 0) : x + LEARN_HALF_Y] = 1.0
        img[..., 0] += blob * LEARN_SIGNAL
        onehot = np.stack([1.0 - blob, blob], axis=-1).astype(np.float32)
        batches.append((img, onehot))
    return batches


def learnable_holdout(seed: int = 123, n: int = 6):
    """Held-out volumes drawn from the SAME learnable process."""
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, *SPATIAL, 3)).astype(np.float32)
    labs = np.zeros((n, *SPATIAL), np.float32)
    for b in range(n):
        z, y, x = (int(rng.integers(1, s - 1)) for s in SPATIAL)
        labs[b, max(z - 1, 0) : z + 1,
             max(y - LEARN_HALF_Y, 0) : y + LEARN_HALF_Y,
             max(x - LEARN_HALF_Y, 0) : x + LEARN_HALF_Y] = 1.0
    imgs[..., 0] += labs * LEARN_SIGNAL
    return imgs, labs


def steps_to_threshold(evals, labs, thr):
    """First eval step whose holdout Dice@0.5 crosses ``thr`` (None if
    never), plus the full step->Dice trajectory."""
    traj = {}
    for s in sorted(evals):
        traj[s] = metrics_from_probs(evals[s], labs)["dice@0.5"]
    hit = next((s for s in sorted(traj) if traj[s] >= thr), None)
    return hit, traj


def holdout(seed: int = 99, n: int = 4):
    """Held-out synthetic volumes shared by both frameworks' eval passes."""
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, *SPATIAL, 3)).astype(np.float32)
    labs = np.zeros((n, *SPATIAL), np.float32)
    labs[:, 1:3, 4:12, 4:12] = 1.0
    imgs[..., 0] += labs * 1.5  # image informative about the label: metrics
    return imgs, labs           # can actually IMPROVE over the horizon


def metrics_from_probs(probs, labs):
    """Dice / lesion-AP from foreground probability maps
    (train/validation.py implements the reference's 'TBA' validation
    callbacks for real)."""
    from prostatemr_3d_cad_cspca_tpu.train.metrics import (
        dice_3d, lesion_average_precision)

    n = probs.shape[0]
    return {
        "dice@0.5": float(np.mean([
            dice_3d(probs[i] >= 0.5, labs[i] > 0.5) for i in range(n)])),
        "lesion_ap": float(lesion_average_precision(
            list(probs), list(labs))),
    }


STATIC_SECTIONS = """
## Structural/numerical oracle coverage (round 3)

Beyond training dynamics, the forward graphs are pinned against TF Keras
twins sharing imported weights:

| graph | test | tolerance |
|---|---|---|
| deterministic M1 (full) | `test_tf_parity.py::test_full_m1_forward_parity` | atol 5e-4 voxelwise |
| hierarchical probabilistic five-pass graph (prob_train_conv / prob_infer_conv / prob_kl / prob_softmax incl. deep-sup concat), identical injected latents both sides | `test_tf_prob_oracle.py::test_probabilistic_five_pass_oracle` | atol 1e-3 |
| cascaded two-stage (stage-2 input wiring + noisy-or fusion) | `test_tf_prob_oracle.py::test_cascaded_two_stage_oracle` | atol 1e-3 |
| reference H5 checkpoint (Keras default names, TF2.x topological format) imported by build order | `test_h5_import.py::test_default_names_h5_roundtrip` | atol 5e-4 |

## Resample parity bound (round 4 — VERDICT r3 item 6)

SimpleITK is not installable in this image, so `resample_volume`'s parity
with the reference's `resample_img` (preprocess.py:52-71) is bounded
analytically (`tests/test_ingest.py::test_resample_analytic_field_bound`):
a band-limited field (wavelengths >= ~7 samples on the coarse axis) is
sampled at typical raw bpMRI spacing (3.6, 0.5, 0.5), resampled to the
reference target (3.0, 0.5, 0.5), and compared against the TRUE field
values at the reference's exact sample locations (output voxel i at
physical i*out_spacing, origin unchanged).

| quantity | measured |
|---|---|
| max voxel delta / field amplitude (interior) | 2.0e-3 |
| mean voxel delta / field amplitude | 2.9e-4 |
| old zoom(grid_mode=True) convention (round 1-3) | 1.27e-2 max (6x worse) |

The round-4 rewrite samples at the sitk convention exactly
(`map_coordinates`, physical-point-first arithmetic so half-integer NN
coordinates land on the same side of the fp razor as
`TransformPhysicalPointToContinuousIndex`); the residual 2.0e-3 is cubic
B-spline interpolation error at ~7 samples/wavelength, which sitkBSpline
(same interpolating-spline family) shares. Documented edge deviations
(outermost voxel ring only): edge-replicate boundary vs sitk's mirror
prefilter + its fill-with-`GetPixelIDValue()` quirk (out-of-domain voxels
get the pixel-TYPE enum as a VALUE — unintentional in the reference, not
reproduced).
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=160)
    ap.add_argument("--steps-learn", type=int, default=160,
                    help="horizon for the learnable steps-to-threshold task")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    # ---- learnable-task anchor (VERDICT r4 item 7) -------------------------
    # Tolerances DECLARED IN ADVANCE (before either stack runs):
    DICE_THR = 0.50        # both stacks must reach this holdout Dice
    EVAL_EVERY = 10        # steps between holdout evals
    TOL_STEPS = 2          # |steps_to_thr(tf) - steps_to_thr(jax)| <= 2 evals
    TOL_PLATEAU = 0.05     # |final Dice(tf) - final Dice(jax)| <= 0.05

    # first restart at steps/6, second at steps/2 (t_mul=2): the run crosses
    # TWO warm restarts — the long-horizon anchor VERDICT r3 item 5 asks for
    fds = max(args.steps // 6, 1)
    eval_at = sorted({args.steps // 4, args.steps // 2,
                      3 * args.steps // 4, args.steps})
    batches = synth_batches(args.steps)
    eval_imgs, eval_labs = holdout()
    tf_model = build_tf()
    model, params0 = snapshot_params(tf_model)  # BEFORE tf trains
    tf_losses, tf_evals = run_tf(tf_model, batches, fds, eval_at, eval_imgs)
    params, jx_losses, jx_evals = run_jax(
        model, params0, batches, fds, eval_at, eval_imgs)

    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(tf_losses, jx_losses)]
    ck = {s: (metrics_from_probs(tf_evals[s], eval_labs),
              metrics_from_probs(jx_evals[s], eval_labs)) for s in eval_at}

    # learnable task: fresh identical weights, informative batches, eval
    # every EVAL_EVERY steps, compare steps-to-DICE_THR + final plateau
    lsteps = args.steps_learn
    lfds = max(lsteps // 6, 1)
    leval_at = list(range(EVAL_EVERY, lsteps + 1, EVAL_EVERY))
    lbatches = learnable_batches(lsteps)
    limgs, llabs = learnable_holdout()
    tf_model2 = build_tf()
    model2, params0_2 = snapshot_params(tf_model2)
    _, tf_levals = run_tf(tf_model2, lbatches, lfds, leval_at, limgs)
    _, _, jx_levals = run_jax(model2, params0_2, lbatches, lfds,
                              leval_at, limgs)
    tf_hit, tf_traj = steps_to_threshold(tf_levals, llabs, DICE_THR)
    jx_hit, jx_traj = steps_to_threshold(jx_levals, llabs, DICE_THR)
    tf_plateau = tf_traj[leval_at[-1]]
    jx_plateau = jx_traj[leval_at[-1]]

    lines = [
        "# Training-dynamics parity: TF/Keras oracle vs prostatemr_3d_cad_cspca_tpu",
        "",
        "Same initial weights (utils/tf_import), same synthetic batches, same",
        "recipe (focal alpha=[1,1] gamma=2; Adam+amsgrad eps=1e-7; cosine-decay-",
        f"restarts LR, first_decay_steps={fds}, TWO warm restarts inside the run).",
        "Reference recipe: train_model.py:113-131. Harness:",
        "benchmarks/parity_training.py.",
        "",
        f"- steps: {args.steps}",
        f"- max relative loss deviation (first 24 steps): "
        f"{max(rel[:24]):.3e}",
        f"- max relative loss deviation (full horizon): {max(rel):.3e} — "
        "pointwise loss deviation GROWS with horizon (chaotic fp divergence,",
        "  expected); the metric table below is the long-horizon parity check",
        f"- final losses: tf={tf_losses[-1]:.6f} jax={jx_losses[-1]:.6f}",
        "",
        "## Checkpoint metric parity (held-out volumes, Dice/lesion-AP)",
        "",
        "The VERDICT r3 item-5 anchor: pointwise losses diverge chaotically",
        "after ~dozens of fp-noise doublings, but the RECIPE is the same iff",
        "the quality trajectory matches — Dice / lesion AP at checkpoints",
        "across two cosine warm restarts:",
        "",
        "| step | tf Dice@0.5 | jax Dice@0.5 | tf lesion-AP | jax lesion-AP |",
        "|------|------|------|------|------|",
    ]
    for s in eval_at:
        t, j = ck[s]
        lines.append(
            f"| {s} | {t['dice@0.5']:.4f} | {j['dice@0.5']:.4f} "
            f"| {t['lesion_ap']:.4f} | {j['lesion_ap']:.4f} |")
    lines += [
        "",
        "## Learnable-task anchor: steps-to-threshold (round 5 — VERDICT r4 item 7)",
        "",
        "The table above tracks a NON-learnable task (batches carry no image-",
        "label signal), so Dice decays and a subtle recipe divergence could",
        "hide inside a widening-but-bounded gap. This section trains the SAME",
        "architecture from the SAME imported initial weights on a LEARNABLE",
        f"task (label blob adds +{LEARN_SIGNAL} to image channel 0) where a",
        "correct recipe drives holdout Dice up to a plateau. Tolerances were",
        "declared before the runs:",
        "",
        f"- threshold: holdout Dice@0.5 >= {DICE_THR} (6 held-out volumes,",
        f"  eval every {EVAL_EVERY} steps, horizon {lsteps} steps,",
        f"  first_decay_steps={lfds} — crosses two cosine warm restarts)",
        f"- PASS iff |steps-to-threshold| differ by <= {TOL_STEPS} evals",
        f"  ({TOL_STEPS * EVAL_EVERY} steps) AND final plateau Dice within",
        f"  {TOL_PLATEAU} absolute",
        "",
        "| stack | steps to Dice>=%.2f | final plateau Dice (step %d) |"
        % (DICE_THR, leval_at[-1]),
        "|-------|--------------------|------------------------------|",
        f"| tf    | {tf_hit if tf_hit is not None else 'never'} | {tf_plateau:.4f} |",
        f"| jax   | {jx_hit if jx_hit is not None else 'never'} | {jx_plateau:.4f} |",
        "",
        "Dice trajectory (every eval):",
        "",
        "| step | tf Dice | jax Dice |",
        "|------|---------|----------|",
    ]
    for s in leval_at:
        lines.append(f"| {s} | {tf_traj[s]:.4f} | {jx_traj[s]:.4f} |")
    stride = max(1, args.steps // 24)
    shown = sorted({0, *range(stride - 1, args.steps, stride), args.steps - 1})
    lines += [
        "",
        f"## Per-step loss table (every {stride} steps)",
        "",
        "| step | tf loss | jax loss | rel diff |",
        "|------|---------|----------|----------|",
    ]
    for i in shown:
        lines.append(f"| {i + 1} | {tf_losses[i]:.6f} | {jx_losses[i]:.6f} "
                     f"| {rel[i]:.2e} |")
    lines += [
        "",
        "Full-scale accuracy parity on the ProstateX sample feed still needs the",
        "actual bpMRI volumes (not shipped in this image) — see BASELINE.md.",
        STATIC_SECTIONS,
    ]
    report = "\n".join(lines) + "\n"
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "PARITY.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    # pass criteria: short-horizon POINTWISE loss parity (fp determinism of
    # the recipe) + long-horizon METRIC parity (quality trajectory across
    # two warm restarts — pointwise losses diverge chaotically, by design)
    ok_loss = max(rel[:24]) < 0.02
    ok_metric = all(
        abs(t["dice@0.5"] - j["dice@0.5"]) < 0.05
        and abs(t["lesion_ap"] - j["lesion_ap"]) < 0.05
        for t, j in ck.values())
    ok_learn = (
        tf_hit is not None and jx_hit is not None
        and abs(tf_hit - jx_hit) <= TOL_STEPS * EVAL_EVERY
        and abs(tf_plateau - jx_plateau) <= TOL_PLATEAU)
    ok = ok_loss and ok_metric and ok_learn
    print(f"PARITY {'OK' if ok else 'FAIL'} "
          f"(loss[:24] max rel dev {max(rel[:24]):.3e}; "
          f"metric checkpoints {'OK' if ok_metric else 'FAIL'}; "
          f"learnable steps-to-thr tf={tf_hit} jax={jx_hit} "
          f"plateau tf={tf_plateau:.4f} jax={jx_plateau:.4f} "
          f"{'OK' if ok_learn else 'FAIL'})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
