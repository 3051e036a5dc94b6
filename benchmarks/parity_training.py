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


def run_tf(tf_model, batches, first_decay_steps: int):
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
    for img, lab in batches:
        with tf.GradientTape() as tape:
            probs = tf_model(tf.constant(img), training=True)
            loss = focal(tf.constant(lab), probs)
        grads = tape.gradient(loss, tf_model.trainable_variables)
        opt.apply_gradients(zip(grads, tf_model.trainable_variables))
        losses.append(float(loss))
    return losses


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


def run_jax(model, params, batches, first_decay_steps: int):
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
    for img, lab in batches:
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(img), jnp.asarray(lab))
        losses.append(float(loss))
    return params, losses


def eval_parity(tf_model, model, params, seed: int = 99, n: int = 4):
    """Dice / lesion-AP computed from both frameworks' predictions on the
    same held-out synthetic volumes (train/validation.py implements the
    reference's 'TBA' validation callbacks for real)."""
    import jax.numpy as jnp
    import tensorflow as tf

    from prostatemr_3d_cad_cspca_tpu.train.metrics import (
        dice_3d, lesion_average_precision)

    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, *SPATIAL, 3)).astype(np.float32)
    labs = np.zeros((n, *SPATIAL), np.float32)
    labs[:, 1:3, 4:12, 4:12] = 1.0

    tf_probs = tf_model(tf.constant(imgs), training=False).numpy()[..., 1]
    jx_probs = np.asarray(
        model.apply(params, jnp.asarray(imgs))["y_softmax"])[..., 1]

    out = {}
    for tag, probs in (("tf", tf_probs), ("jax", jx_probs)):
        out[tag] = {
            "dice@0.5": float(np.mean([
                dice_3d(probs[i] >= 0.5, labs[i] > 0.5) for i in range(n)])),
            "lesion_ap": float(lesion_average_precision(
                list(probs), list(labs))),
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)

    fds = max(args.steps // 3, 1)  # exercise >=1 warm restart
    batches = synth_batches(args.steps)
    tf_model = build_tf()
    model, params0 = snapshot_params(tf_model)  # BEFORE tf trains
    tf_losses = run_tf(tf_model, batches, fds)
    params, jx_losses = run_jax(model, params0, batches, fds)

    rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(tf_losses, jx_losses)]
    ev = eval_parity(tf_model, model, params)

    lines = [
        "# Training-dynamics parity: TF/Keras oracle vs prostatemr_3d_cad_cspca_tpu",
        "",
        "Same initial weights (utils/tf_import), same synthetic batches, same",
        "recipe (focal alpha=[1,1] gamma=2; Adam+amsgrad eps=1e-7; cosine-decay-",
        f"restarts LR, first_decay_steps={fds}, one warm restart inside the run).",
        "Reference recipe: train_model.py:113-131. Harness:",
        "benchmarks/parity_training.py.",
        "",
        f"- steps: {args.steps}",
        f"- max relative loss deviation: {max(rel):.3e}",
        f"- final losses: tf={tf_losses[-1]:.6f} jax={jx_losses[-1]:.6f}",
        "",
        "| step | tf loss | jax loss | rel diff |",
        "|------|---------|----------|----------|",
    ]
    for i, (a, b, r) in enumerate(zip(tf_losses, jx_losses, rel)):
        lines.append(f"| {i + 1} | {a:.6f} | {b:.6f} | {r:.2e} |")
    lines += [
        "",
        "## Eval-metric parity (same held-out synthetic volumes)",
        "",
        "| metric | tf | jax |",
        "|--------|----|----|",
        f"| Dice@0.5 | {ev['tf']['dice@0.5']:.6f} | {ev['jax']['dice@0.5']:.6f} |",
        f"| lesion AP | {ev['tf']['lesion_ap']:.6f} | {ev['jax']['lesion_ap']:.6f} |",
        "",
        "Full-scale accuracy parity on the ProstateX sample feed still needs the",
        "actual bpMRI volumes (not shipped in this image) — see BASELINE.md.",
    ]
    report = "\n".join(lines) + "\n"
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "PARITY.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    ok = max(rel) < 0.02
    print(f"PARITY {'OK' if ok else 'FAIL'} (max rel dev {max(rel):.3e})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
