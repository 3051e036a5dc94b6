"""Probe the learnable-task anchor's task parameters (jax side only).

The round-5 full parity run showed BOTH stacks collapsing to Dice 0 on the
learnable task at horizon 240 (first_decay_steps=40): the task signal
(+2.0 on channel 0) is too weak to survive the focal-loss background
collapse under the reference recipe at that LR schedule.  The two stacks
track each other, so picking task parameters that learn only needs one
side.  This probe sweeps signal strength / blob size / horizon and prints
the holdout Dice trajectory for each, so the full tf-vs-jax run can be
re-launched with a configuration where "reach Dice 0.5" is achievable.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/benchmarks")
sys.path.insert(0, "/root/repo")

import parity_training as pt  # noqa: E402


def make_batches(steps, signal, half_y, seed=7):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(steps):
        img = rng.normal(size=(pt.BATCH, *pt.SPATIAL, 3)).astype(np.float32)
        blob = np.zeros((pt.BATCH, *pt.SPATIAL), np.float32)
        for b in range(pt.BATCH):
            z, y, x = (int(rng.integers(1, s - 1)) for s in pt.SPATIAL)
            blob[b, max(z - 1, 0): z + 1,
                 max(y - half_y, 0): y + half_y,
                 max(x - half_y, 0): x + half_y] = 1.0
        img[..., 0] += blob * signal
        onehot = np.stack([1.0 - blob, blob], axis=-1).astype(np.float32)
        batches.append((img, onehot))
    return batches


def make_holdout(signal, half_y, seed=123, n=6):
    rng = np.random.default_rng(seed)
    imgs = rng.normal(size=(n, *pt.SPATIAL, 3)).astype(np.float32)
    labs = np.zeros((n, *pt.SPATIAL), np.float32)
    for b in range(n):
        z, y, x = (int(rng.integers(1, s - 1)) for s in pt.SPATIAL)
        labs[b, max(z - 1, 0): z + 1,
             max(y - half_y, 0): y + half_y,
             max(x - half_y, 0): x + half_y] = 1.0
    imgs[..., 0] += labs * signal
    return imgs, labs


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    configs = [
        # (signal, half_y, fds)
        (4.0, 4, steps // 6),
        (4.0, 6, steps // 6),
        (2.0, 4, 10),
        (4.0, 4, 10),
    ]
    tf_model = pt.build_tf()
    model, params0 = pt.snapshot_params(tf_model)
    eval_at = list(range(10, steps + 1, 10))
    for signal, half_y, fds in configs:
        batches = make_batches(steps, signal, half_y)
        imgs, labs = make_holdout(signal, half_y)
        _, _, evals = pt.run_jax(model, params0, batches, fds, eval_at, imgs)
        hit, traj = pt.steps_to_threshold(evals, labs, 0.5)
        tail = {s: round(traj[s], 3) for s in eval_at}
        print(f"signal={signal} half_y={half_y} fds={fds} "
              f"steps_to_0.5={hit} traj={tail}", flush=True)


if __name__ == "__main__":
    main()
