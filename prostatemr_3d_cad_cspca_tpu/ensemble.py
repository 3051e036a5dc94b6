"""Cross-validation fold ensembling and test-time augmentation (TTA).

The reference trains one M1 per fold (train_model.py:101 ``for f in FOLDS``)
and its deployed grand-challenge algorithm (reference README.md:6) serves the
*ensemble* of fold members — but the public repo ships no ensembling code.
This module provides it TPU-natively:

  * ``M1Ensemble`` stacks the K fold checkpoints' parameter pytrees along a
    leading member axis and runs the detect head over it — ``lax.scan`` by
    default, ``jax.vmap`` optionally — so all K members run as ONE compiled
    program. On this toolchain a compiled program execution pays a fixed
    ~170 ms device cost regardless of content (docs/ROUND2_NOTES.md) — K
    separate member programs would pay it K times; the fused ensemble pays it
    once, exactly the amortization lever that won every round-2/3 measurement
    campaign. scan is the default because the vmapped K=5 program exceeds
    the remote compile helper's limit on the real chip (see the class doc).
  * ``tta_detect`` fuses axial left-right-flip test-time augmentation into the
    same program (the one label-symmetric geometric transform in this anatomy;
    it is also the reference's train-time flip, augmentations.py:156-163):
    predict(x) and unflip(predict(flip(x))) are averaged on device.

``M1Ensemble`` duck-types the model surface ``serve.InferenceSession``
consumes (``params``, ``get_detect_model``, ``cascaded``, ``probabilistic``,
``num_classes``, ``input_spatial_dims``, ``input_channels``, ``config``), so
fold-ensemble serving is ``--MODEL fold1.npz,fold2.npz,...`` — batched
window-sized cases, K-case sliding windows, MC sampling and cascaded
composition all compose with it unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

# W is axis -2 of (..., D, H, W, C) — the axial left-right axis flipped by
# the reference's train-time h-flip (augmentations.py:156-163; our
# augment.py flips the same axis). D/H flips are NOT label-symmetric for
# prostate anatomy and are deliberately not offered as defaults.
AXIAL_LR_AXIS = -2


def stack_params(params_list: Sequence):
    """Stack K same-structure parameter pytrees along a new leading axis."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *params_list)


def tta_detect(detect_fn: Callable, flip_axes: Sequence[int] = (AXIAL_LR_AXIS,),
               ) -> Callable:
    """Wrap ``detect(params, inputs, rng=None)`` with flip-TTA.

    Each axis in ``flip_axes`` doubles the prediction set: the input is
    flipped, predicted, and the prediction flipped back; all 2**len(flip_axes)
    views are averaged ON DEVICE inside the caller's program. Axes index the
    per-case layout ``(..., D, H, W, C)`` from the right (so they are correct
    with or without batch/sample leading axes); outputs share the input's
    spatial layout, so the same index unflips them.

    Works for cascaded models: tuple inputs are flipped element-wise and tuple
    outputs unflipped element-wise (reference networks.py:111-112 two-exam
    contract — both exams see the same geometric view).
    """
    flip_axes = tuple(int(a) for a in flip_axes)
    for a in flip_axes:
        assert a < -1, ("flip_axes index spatial dims from the right of "
                        f"(..., D, H, W, C); got {a} (channel/batch axis)")

    def _flip(tree, axes):
        if not axes:
            return tree
        return jax.tree.map(
            lambda x: jnp.flip(x, axis=[x.ndim + a for a in axes]), tree)

    # all subsets of flip_axes = all 2**n views (identity included)
    views = [()]
    for a in flip_axes:
        views += [v + (a,) for v in views]

    def detect(params, inputs, rng: Optional[jax.Array] = None):
        outs = None
        for i, axes in enumerate(views):
            r = None if rng is None else jax.random.fold_in(rng, i)
            kw = {} if rng is None else {"rng": r}
            out = _flip(detect_fn(params, _flip(inputs, axes), **kw), axes)
            outs = out if outs is None else jax.tree.map(jnp.add, outs, out)
        return jax.tree.map(lambda s: s / len(views), outs)

    return detect


class M1Ensemble:
    """K fold members as one vmapped model (duck-types the ``M1`` surface).

    All members must share an architecture config (they are folds of one
    recipe, reference train_model.py:101-104); ``params`` is the stacked
    pytree and ``get_detect_model()`` returns a detect head whose output is
    the member-mean probability — one compiled program for the whole
    ensemble. With an ``rng`` (probabilistic / MC-dropout members) each
    member draws independent randomness via ``fold_in``; MC mean±std on top
    of an ensemble (serve ``--MC_ITER k``) is then the std over k draws of
    member-mean probabilities.

    ``reduce=None`` keeps the stacked member axis (leading) for callers that
    want member-level analysis (e.g. inter-member disagreement maps).

    ``method`` selects how the member axis is executed inside the single
    program: ``"scan"`` (default) runs members sequentially via ``lax.scan``
    — the compiled graph is ONE member's network regardless of K, and
    mean/mean_std reductions accumulate in the scan carry so no K-stacked
    output buffer exists; ``"vmap"`` unrolls all members for cross-member
    parallelism. Measured on the real chip (benchmarks/r3_probe_ensemble.py):
    the K=5 vmapped program CRASHES the remote compile helper (HTTP 500,
    the known 16 GB compile limit — the unrolled graph is 5x the network),
    while the scan program compiles and pays the ~170 ms fixed program cost
    once. scan is therefore the production default; vmap remains available
    for toolchains without the compile-size ceiling.
    """

    def __init__(self, models: Sequence, reduce: Optional[str] = "mean",
                 method: str = "scan"):
        assert len(models) >= 1
        base = models[0]
        arch_keys = [k for k in base.config
                     if k not in ("seed", "summary", "init_params")]
        for m in models[1:]:
            diff = [k for k in arch_keys
                    if m.config.get(k) != base.config.get(k)]
            assert not diff, (
                f"ensemble members disagree on architecture config: {diff}")
        assert method in ("scan", "vmap"), method
        self.members = list(models)
        self.num_members = len(models)
        self.reduce = reduce
        self.method = method
        self.params = stack_params([m.params for m in models])
        # duck-typed M1 surface (serve.InferenceSession contract)
        self.config = dict(base.config)
        self.cascaded = base.cascaded
        self.probabilistic = base.probabilistic
        self.num_classes = base.num_classes
        self.input_spatial_dims = tuple(base.input_spatial_dims)
        self.input_channels = base.input_channels
        self._base = base

    @classmethod
    def load(cls, paths: Sequence[str], reduce: Optional[str] = "mean",
             method: str = "scan"):
        """Load fold checkpoints saved by ``M1.save`` / the CLI WeightsSaver."""
        from .models.m1 import M1

        return cls([M1.load(p) for p in paths], reduce=reduce, method=method)

    def get_detect_model(self) -> Callable:
        """``detect(stacked_params, inputs, rng=None) -> member-mean probs``.

        Runs the single-member detect head (M1.get_detect_model, models/m1.py)
        over the member axis of ``params`` — inputs broadcast, per-member rng
        via fold_in — then averages on device. Cascaded members return the
        reference's (stage-1, stage-2) tuple; each element is member-averaged.
        See the class docstring for the scan-vs-vmap execution choice.
        """
        member_detect = self._base.get_detect_model()
        k = self.num_members
        reduce = self.reduce

        method = self.method

        def detect(params, inputs, rng: Optional[jax.Array] = None):
            if rng is None:
                xs = params
                call = lambda p: member_detect(p, inputs)  # noqa: E731
            else:
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(rng, i))(jnp.arange(k))
                xs = (params, keys)
                call = lambda pr: member_detect(  # noqa: E731
                    pr[0], inputs, rng=pr[1])

            if method == "vmap":
                stacked = jax.vmap(call)(xs)
                if reduce == "mean":
                    return jax.tree.map(lambda s: jnp.mean(s, axis=0), stacked)
                if reduce == "mean_std":
                    return (
                        jax.tree.map(lambda s: jnp.mean(s, axis=0), stacked),
                        jax.tree.map(lambda s: jnp.std(s, axis=0), stacked))
                return stacked

            # scan: one member's graph compiled once; mean/mean_std
            # accumulate in the carry, so HBM never holds a K-stacked
            # output. mean_std uses a Welford update — the naive
            # E[x^2] - mean^2 form loses ~4 decimal digits to fp32
            # cancellation on near-agreeing members (measured 1.9e-4 abs
            # error vs jnp.std; Welford matches to 1e-6).
            if reduce in ("mean", "mean_std"):
                out_sds = jax.eval_shape(
                    call, jax.tree.map(lambda x: x[0], xs))
                zero = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), out_sds)

                # mean-only carries ONLY the mean: a dead m2 zero tree in the
                # carry would double the carry's HBM footprint on exactly the
                # path whose purpose is avoiding a K-stacked output buffer.
                def body(carry, ix):
                    i, x = ix
                    out = call(x)
                    mean = carry[0]
                    delta = jax.tree.map(jnp.subtract, out, mean)
                    mean = jax.tree.map(
                        lambda m, d: m + d / (i + 1).astype(d.dtype),
                        mean, delta)
                    if reduce == "mean_std":
                        m2 = jax.tree.map(
                            lambda a, d, o, m: a + d * (o - m),
                            carry[1], delta, out, mean)
                        return (mean, m2), None
                    return (mean,), None

                init = (zero, zero) if reduce == "mean_std" else (zero,)
                carry, _ = jax.lax.scan(body, init, (jnp.arange(k), xs))
                if reduce == "mean":
                    return carry[0]
                mean, m2 = carry
                # biased (ddof=0) like jnp.std
                std = jax.tree.map(lambda a: jnp.sqrt(a / k), m2)
                return mean, std

            # reduce=None: keep the member axis; scan stacks ys along axis 0
            _, stacked = jax.lax.scan(lambda c, x: (None, call(x)), None, xs)
            return stacked

        return detect

    # --- convenience mirrors of the M1 predict surface ---------------------
    def predict(self, inputs, rng: Optional[jax.Array] = None):
        import numpy as np

        detect = self.get_detect_model()
        needs_rng = (self.probabilistic
                     or self.config.get("dropout_mode") == "monte-carlo")
        if needs_rng and rng is None:  # self-key like M1.predict
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        return detect(self.params, inputs, rng=rng) if needs_rng \
            else detect(self.params, inputs)
