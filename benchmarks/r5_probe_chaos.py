"""Chaos control for the learnable-task parity anchor.

The tf-vs-jax learnable run matched steps-to-threshold exactly (50 vs 50)
but the step-160 plateau differed by 0.085 (> the pre-declared 0.05).
Both stacks are deterministic (dropout 0.0), so any divergence is
fp-operation-order chaos (oneDNN conv orderings vs XLA fusions).  This
control bounds the plateau spread PURE CHAOS produces: the SAME jax stack
run twice, identical recipe and batches, differing only by a 1e-6
relative perturbation of the initial weights (far below the import
round-trip error of 5e-4).  If the control spread is comparable to the
cross-stack gap, the plateau tolerance must sit above the chaos floor and
the discriminating statistic is steps-to-threshold.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/benchmarks")
sys.path.insert(0, "/root/repo")

import parity_training as pt  # noqa: E402


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
    rng = np.random.default_rng(0)
    pert = [l * (1.0 + 1e-6 * rng.standard_normal(l.shape).astype(np.float32))
            for l in leaves]
    params_pert = jax.tree_util.tree_unflatten(treedef, pert)

    results = {}
    for tag, p0 in (("base", params0), ("pert_1e-6", params_pert)):
        _, _, evals = pt.run_jax(model, p0, batches, fds, eval_at, imgs)
        hit, traj = pt.steps_to_threshold(evals, labs, 0.5)
        results[tag] = (hit, traj)
        print(f"{tag}: steps_to_0.5={hit} "
              f"traj={{{', '.join(f'{s}: {traj[s]:.4f}' for s in eval_at)}}}",
              flush=True)
    (h0, t0), (h1, t1) = results["base"], results["pert_1e-6"]
    gaps = {s: abs(t0[s] - t1[s]) for s in eval_at}
    print(f"steps_to_thr: {h0} vs {h1}; "
          f"max |Dice gap| over evals = {max(gaps.values()):.4f}; "
          f"plateau gap (step {eval_at[-1]}) = {gaps[eval_at[-1]]:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
