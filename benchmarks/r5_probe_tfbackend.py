"""TF-internal backend control for the learnable parity anchor.

The cross-stack learnable run (tf oneDNN vs jax XLA-CPU) shows a
one-signed ~3e-2 relative loss offset and a 0.061 plateau-Dice gap,
while same-stack weight perturbations up to 1e-4 produce only ~4e-3
loss gaps and ~3e-3 plateau gaps (r5_probe_chaos.py: the training
dynamics CONTRACT initial-condition noise). So the cross-stack gap is
driven by PERSISTENT per-op backend differences, not initial-condition
chaos. This control measures that forcing WITHIN TensorFlow: the same
recipe, same seeded initial weights, same batches, run once with
oneDNN kernels (default) and once with TF_ENABLE_ONEDNN_OPTS=0 (Eigen
kernels). If TF-vs-TF(backend) reproduces the cross-stack gap scale,
the anchor's residual is backend-numerics floor, not a recipe
divergence; if it is tiny, the tf-vs-jax gap needs a recipe hunt.

Each leg runs in a SUBPROCESS (the env var must be set before TF
import). Initial weights are seeded identically via
tf.keras.utils.set_random_seed(0).

Run:  python benchmarks/r5_probe_tfbackend.py
Writes benchmarks/r5_tfbackend_results.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "r5_tfbackend_results.json")

LEG = r"""
import json, os, sys
sys.path.insert(0, {here!r})
sys.path.insert(0, os.path.dirname({here!r}))
import numpy as np
import tensorflow as tf
tf.keras.utils.set_random_seed(0)
import parity_training as pt

steps = {steps}
fds = max(steps // 6, 1)
eval_at = list(range(10, steps + 1, 10))
batches = pt.learnable_batches(steps)
imgs, labs = pt.learnable_holdout()
tf_model = pt.build_tf()
losses, evals = pt.run_tf(tf_model, batches, fds, eval_at, imgs)
hit, traj = pt.steps_to_threshold(evals, labs, 0.5)
print("LEGRESULT " + json.dumps({{
    "losses": losses, "steps_to_thr": hit,
    "traj": {{str(s): traj[s] for s in eval_at}}}}))
"""


def run_leg(tag, env_extra, steps):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    code = LEG.format(here=HERE, steps=steps)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"{tag}: no result\n{p.stdout[-800:]}\n{p.stderr[-800:]}")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    a = run_leg("onednn", {}, steps)
    print(f"# oneDNN leg: steps_to_thr={a['steps_to_thr']}", flush=True)
    b = run_leg("eigen", {"TF_ENABLE_ONEDNN_OPTS": "0"}, steps)
    print(f"# eigen leg: steps_to_thr={b['steps_to_thr']}", flush=True)

    la, lb = a["losses"], b["losses"]
    rel = [abs(x - y) / max(abs(x), 1e-9) for x, y in zip(la, lb)]
    signs = [1.0 if y > x else 0.0 for x, y in zip(la[4:], lb[4:])]
    evs = sorted(int(s) for s in a["traj"])
    gaps = {s: abs(a["traj"][str(s)] - b["traj"][str(s)]) for s in evs}
    plateau3 = lambda t: sum(t[str(s)] for s in evs[-3:]) / 3  # noqa: E731
    results = {
        "steps": steps,
        "steps_to_thr_onednn": a["steps_to_thr"],
        "steps_to_thr_eigen": b["steps_to_thr"],
        "max_rel_loss_gap_first24": float(f"{max(rel[:24]):.3e}"),
        "max_rel_loss_gap": float(f"{max(rel):.3e}"),
        "frac_steps_eigen_loss_above": round(
            float(sum(signs) / len(signs)), 3),
        "max_dice_gap": round(max(gaps.values()), 4),
        "plateau_gap_final": round(gaps[evs[-1]], 4),
        "plateau_onednn_last3": round(plateau3(a["traj"]), 4),
        "plateau_eigen_last3": round(plateau3(b["traj"]), 4),
        "traj_onednn": {str(s): round(a["traj"][str(s)], 4) for s in evs},
        "traj_eigen": {str(s): round(b["traj"][str(s)], 4) for s in evs},
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
