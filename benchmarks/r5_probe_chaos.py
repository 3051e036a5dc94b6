"""Chaos control for the learnable-task parity anchor.

The tf-vs-jax learnable run (2026-08-20) matched steps-to-threshold within
one eval (80 vs 90) but the step-160 plateau differed by 0.061 (> the
pre-declared 0.05).  Both stacks are deterministic (dropout 0.0) and step 1
matches at 6.5e-7 rel, so any later divergence is fp-operation-order chaos
(oneDNN conv orderings vs XLA fusions, ~1e-7/op) compounding through the
optimizer.  This control bounds what PURE CHAOS produces on the SAME jax
stack: identical recipe and batches, initial weights perturbed by
eps * N(0,1) relative for eps in {1e-6, 1e-5, 1e-4}.  For each run we
record (a) steps-to-threshold, (b) the Dice-trajectory gap vs base, and
(c) the LOSS-GAP SIGNATURE vs base — max relative gap and one-signedness
(fraction of steps where pert-loss > base-loss) — because the cross-stack
run shows a one-signed ~2-3e-2 loss offset and the question is whether a
same-stack perturbed run shows the same (chaos-typical) or not (drift).

Run:  JAX_PLATFORMS=cpu python benchmarks/r5_probe_chaos.py [steps]
Writes benchmarks/r5_chaos_results.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo/benchmarks")
sys.path.insert(0, "/root/repo")

import parity_training as pt  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_chaos_results.json")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    fds = max(steps // 6, 1)
    eval_at = list(range(10, steps + 1, 10))
    batches = pt.learnable_batches(steps)
    imgs, labs = pt.learnable_holdout()

    tf_model = pt.build_tf()
    model, params0 = pt.snapshot_params(tf_model)

    import jax

    leaves, treedef = jax.tree_util.tree_flatten(params0)

    def perturbed(eps, seed):
        rng = np.random.default_rng(seed)
        pert = [l * (1.0 + eps * rng.standard_normal(l.shape)
                     .astype(np.float32)) for l in leaves]
        return jax.tree_util.tree_unflatten(treedef, pert)

    runs = [("base", params0)] + [
        (f"pert_{eps:.0e}", perturbed(eps, 0))
        for eps in (1e-6, 1e-5, 1e-4)]

    results = {"steps": steps}
    curves = {}
    for tag, p0 in runs:
        _, losses, evals = pt.run_jax(model, p0, batches, fds, eval_at, imgs)
        hit, traj = pt.steps_to_threshold(evals, labs, 0.5)
        curves[tag] = (hit, traj, losses)
        print(f"{tag}: steps_to_0.5={hit} plateau={traj[eval_at[-1]]:.4f}",
              flush=True)

    h0, t0, l0 = curves["base"]
    results["base"] = {"steps_to_thr": h0,
                       "plateau": round(t0[eval_at[-1]], 4)}
    for tag, (h1, t1, l1) in curves.items():
        if tag == "base":
            continue
        gaps = {s: abs(t0[s] - t1[s]) for s in eval_at}
        rel = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(l0, l1)]
        # one-signedness of the loss gap AFTER divergence sets in (skip the
        # still-locked first 4 steps)
        signs = [1.0 if b > a else 0.0 for a, b in zip(l0[4:], l1[4:])]
        results[tag] = {
            "steps_to_thr": h1,
            "plateau": round(t1[eval_at[-1]], 4),
            "plateau_gap": round(gaps[eval_at[-1]], 4),
            "max_dice_gap": round(max(gaps.values()), 4),
            "max_rel_loss_gap": float(f"{max(rel):.3e}"),
            "frac_steps_pert_loss_above": round(float(np.mean(signs)), 3),
        }
        print(f"{tag} vs base: steps_to_thr {h0} vs {h1}; "
              f"max |Dice gap| {max(gaps.values()):.4f}; "
              f"plateau gap {gaps[eval_at[-1]]:.4f}; "
              f"max rel loss gap {max(rel):.2e}; "
              f"one-signedness {np.mean(signs):.2f}", flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(json.dumps(results, sort_keys=True))


if __name__ == "__main__":
    main()
