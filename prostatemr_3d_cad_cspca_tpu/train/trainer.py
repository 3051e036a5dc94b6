"""Training orchestration: jitted train/eval steps and the fit loop.

Replaces the reference's Keras ``compile``/``fit`` path
(train_model.py:230-259): one pure, donated, pjit-sharded train step —
forward (+KL), focal/Dice loss, L2 regularization, backward, optimizer —
compiled once and driven by a plain Python epoch loop with
WeightsSaver/Resume semantics (callbacks.py:44-75, 195-215).

Distribution: the global batch is sharded over the mesh 'data' axis
(NamedSharding); XLA inserts the gradient all-reduce over ICI — the
TPU-native equivalent of MirroredStrategy's NCCL all-reduce
(train_model.py:168).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import Focal, SoftDicePlusBoundarySurface
from ..ops.convolution import l2_penalty
from . import schedules as sched

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class _KerasAmsgradState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_hat: Any


def scale_by_keras_amsgrad(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7
) -> optax.GradientTransformation:
    """Keras-EXACT Adam+amsgrad moment scaling.

    ``optax.amsgrad`` takes the running max over the BIAS-CORRECTED second
    moment; tf.keras Adam(amsgrad=True) maxes the RAW second moment and
    folds both bias corrections into the step size:

        m_t = b1*m + (1-b1)*g;  v_t = b2*v + (1-b2)*g^2
        vhat_t = max(vhat_{t-1}, v_t)
        update = [sqrt(1-b2^t)/(1-b1^t)] * m_t / (sqrt(vhat_t) + eps)

    The two variants diverge from step 2 (the correction factor 1/(1-b2^t)
    inflates early nu_hat values, so the corrected-max retains them
    longer): 2.6e-2 relative on identical gradient sequences, which the
    round-5 learnable parity anchor caught as a 0.061 plateau-Dice gap
    (docs/PARITY.md, docs/ROUND5_NOTES.md). Reference recipe:
    train_model.py:120-121 -> keras/optimizer_v2/adam.py (eps applied
    OUTSIDE sqrt, not bias-corrected)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
            lambda p: jnp.zeros_like(p), params)
        return _KerasAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(),
            nu_hat=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g),
            state.nu, updates)
        nu_hat = jax.tree_util.tree_map(jnp.maximum, state.nu_hat, nu)
        c = count.astype(jnp.float32)
        bc = jnp.sqrt(1.0 - b2**c) / (1.0 - b1**c)
        out = jax.tree_util.tree_map(
            lambda m, vh: bc * m / (jnp.sqrt(vh) + eps), mu, nu_hat)
        return out, _KerasAmsgradState(count=count, mu=mu, nu=nu,
                                       nu_hat=nu_hat)

    return optax.GradientTransformation(init_fn, update_fn)


def keras_amsgrad(learning_rate: Any, b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam+amsgrad with tf.keras update semantics (see
    scale_by_keras_amsgrad)."""
    return optax.chain(
        scale_by_keras_amsgrad(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_optimizer(
    name: str = "adam",
    learning_rate: Any = 1e-3,
    freeze_first_n: Optional[int] = None,
    **kwargs,
) -> optax.GradientTransformation:
    """Reference optimizer menu (train_model.py:120-121): Adam+amsgrad or
    SGD+nesterov(momentum 0.9).

    ``freeze_first_n`` reproduces --FREEZE_LAYERS (train_model.py:211-215):
    the first N top-level modules (sorted by param-tree path, the JAX
    analogue of Keras layer order) receive zero updates.
    """
    if name == "adam":
        # Keras-exact amsgrad (raw-moment max, eps=1e-7 outside sqrt):
        # optax.amsgrad maxes the bias-CORRECTED second moment and diverges
        # 2.6e-2 rel by step 2 on identical gradients — caught by the
        # round-5 learnable parity anchor (docs/PARITY.md).
        kwargs.setdefault("eps", 1e-7)
        tx = keras_amsgrad(learning_rate=learning_rate, **kwargs)
    elif name in ("momentum", "sgd"):
        tx = optax.sgd(learning_rate=learning_rate, momentum=0.9, nesterov=True,
                       **kwargs)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if freeze_first_n is not None and freeze_first_n not in (0, 9999):
        def label_fn(params):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            modules = sorted({
                "/".join(str(p.key) for p in path[:2]) for path, _ in flat})
            frozen = set(modules[:freeze_first_n])

            def label(path, _):
                mod = "/".join(str(p.key) for p in path[:2])
                return "frozen" if mod in frozen else "train"

            return jax.tree_util.tree_map_with_path(label, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn)
    return tx


def make_loss(
    loss_mode: str = "distribution_focal",
    focal_alpha=(1.0, 1.0),
    focal_gamma: float = 2.0,
    dsc_bd_weights=(0.5, 0.5),
) -> Callable:
    """Reference loss menu (train_model.py:124-125)."""
    if loss_mode == "distribution_focal":
        return Focal(alpha=focal_alpha, gamma=focal_gamma).loss
    if loss_mode == "region_boundary":
        return SoftDicePlusBoundarySurface(loss_weights=dsc_bd_weights).loss
    raise ValueError(f"Unknown loss mode {loss_mode!r}")


def make_train_step(
    model,
    seg_loss: Callable,
    optimizer: optax.GradientTransformation,
    elbo_beta: float = 10.0,
    loss_weights=(1.0,),
    mesh: Optional[Mesh] = None,
    augment_params=None,
    train_obj: str = "lesion",
    scan_steps: Optional[int] = None,
    accum_steps: Optional[int] = None,
):
    """Build the jitted train step for an M1 model (single-stage or cascaded).

    Loss composition mirrors compile(loss=LOSSES, loss_weights=[1, beta])
    (train_model.py:126-131, 230-231) plus the L2 terms the reference attaches
    to every conv (networks.py:47-48) — here folded explicitly via l2_penalty.

    ``scan_steps=K`` returns a MULTI-step program instead: it takes
    ``(state, batches, rng)`` where every ``batches`` leaf has a leading K
    axis, runs K full optimizer steps via ``lax.scan`` (fresh fold-in RNG and
    on-device augmentation per step), and returns ``(state, metrics)`` with
    metrics stacked (K,). One compiled program per K steps — this is the
    training-side fixed-program-cost amortization (VERDICT r3 item 2).

    ``accum_steps=K`` returns a GRADIENT-ACCUMULATION program: same
    ``(state, batches, rng)`` signature with a leading K axis of
    microbatches, but ONE optimizer update for the whole stack — grads are
    scan-accumulated and averaged, so the effective batch is K*B while
    every conv still sees the B-sized shapes (the platform faults b4+ train
    programs with INVALID_ARGUMENT; this dodges the faulting shapes). The
    batch-independent weight/optimizer/backward-weight HBM traffic of the
    update amortizes over K*B volumes instead of B (VERDICT r4 item 3).
    Mutually exclusive with ``scan_steps``. Loss/metrics come back averaged
    over microbatches — identical in expectation to a K*B-batch step.
    """
    if scan_steps is not None and accum_steps is not None:
        raise ValueError("scan_steps and accum_steps are mutually exclusive")
    net = model.net
    cfg = model.config
    probabilistic = bool(cfg["probabilistic"])
    cascaded = bool(cfg["cascaded"])
    k_l2 = float(cfg["kernel_regularizer"])
    b_l2 = float(cfg["bias_regularizer"])
    w_seg = float(loss_weights[0]) if loss_weights else 1.0
    try:
        import inspect

        loss_takes_dist_map = "dist_map" in inspect.signature(seg_loss).parameters
    except (TypeError, ValueError):  # builtins / C callables
        loss_takes_dist_map = False

    def loss_fn(params, batch, rng):
        if augment_params is not None:
            # Fuse the on-device augmentation INTO the step program: one
            # compiled program per step (fewer dispatches; XLA overlaps the
            # augmentation gathers with the leading convs).
            from ..augment import AugmentParams, augment_sample

            ap = augment_params if isinstance(augment_params, AugmentParams) \
                else AugmentParams.from_list(augment_params)
            rng, a_rng = jax.random.split(rng)
            keys = jax.random.split(a_rng, batch["image"].shape[0])
            if "dist_map" in batch:  # warp the EDT with its label (augment.py)
                img, lbl, dm = jax.vmap(
                    lambda k, im, lb, d: augment_sample(k, im, lb, ap, train_obj, d)
                )(keys, batch["image"], batch["detection"], batch["dist_map"])
                batch = dict(batch, image=img, detection=lbl, dist_map=dm)
            else:
                img, lbl = jax.vmap(
                    lambda k, im, lb: augment_sample(k, im, lb, ap, train_obj)
                )(keys, batch["image"], batch["detection"])
                batch = dict(batch, image=img, detection=lbl)
        # Boundary loss: use the pipeline-precomputed signed EDT when the
        # batch carries one (load_sample(with_dist_map=True)); the loss only
        # falls back to a per-step host callback without it (losses.py:112).
        loss_kwargs = (
            {"dist_map": batch["dist_map"]}
            if ("dist_map" in batch and loss_takes_dist_map) else {})
        d_rng, l_rng = jax.random.split(rng)
        out = net.apply({"params": params}, batch["image"], train=True,
                        rngs={"dropout": d_rng, "latent": l_rng})
        metrics = {}
        if cascaded:
            seg = w_seg * (seg_loss(batch["detection"], out["detection_1"], **loss_kwargs) +
                           seg_loss(batch["detection"], out["detection_2"], **loss_kwargs))
            loss = seg
            if probabilistic:
                kl = out["KL_1"] + out["KL_2"]
                loss = loss + elbo_beta * kl
                metrics["kl"] = kl
        else:
            det = out["prob_softmax"] if probabilistic else out["y_softmax"]
            seg = w_seg * seg_loss(batch["detection"], det, **loss_kwargs)
            loss = seg
            if probabilistic:
                loss = loss + elbo_beta * out["prob_kl"]
                metrics["kl"] = out["prob_kl"]
        reg = l2_penalty(params, k_l2, b_l2)
        loss = loss + reg
        metrics.update(seg_loss=seg, reg=reg, loss=loss)
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    if accum_steps is not None:
        if accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
        K = int(accum_steps)

        def accum_step(state: TrainState, batches, rng):
            """K microbatch grad passes + ONE optimizer update, one program.

            The grad accumulator is the scan carry (param-sized, fp32), so
            XLA updates it in place: the extra traffic is ~2 param-buffer
            passes per microbatch, while the ~1200-leaf optimizer update
            and its amsgrad moment buffers are paid once per K*B volumes.
            """
            keys = jax.random.split(rng, K)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            def body(gacc, xs):
                batch, key = xs
                (_, metrics), grads = grad_fn(state.params, batch, key)
                return jax.tree_util.tree_map(jnp.add, gacc, grads), metrics

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.result_type(p, jnp.float32)),
                state.params)
            gsum, metrics = jax.lax.scan(body, zeros, (batches, keys))
            grads = jax.tree_util.tree_map(lambda g: g / K, gsum)
            metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m), metrics)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), metrics

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            batch_shard = NamedSharding(mesh, P(None, "data"))
            return jax.jit(accum_step,
                           in_shardings=(None, batch_shard, repl),
                           donate_argnums=(0,))
        return jax.jit(accum_step, donate_argnums=(0,))

    if scan_steps is not None:
        if scan_steps < 1:
            raise ValueError(f"scan_steps must be >= 1, got {scan_steps}")
        K = int(scan_steps)

        def multi_step(state: TrainState, batches, rng):
            """K optimizer steps over K stacked batches in ONE program.

            ``batches`` leaves carry a leading K axis (stack of K per-step
            batches). Amortizes the fixed per-program device cost the same
            way the cfg1 inference batch sweep does (docs/ROUND3_NOTES.md:
            at b2 a single step pays ~172 ms program tax on ~90 ms of
            compute); the scan carry is the donated TrainState, so XLA
            updates params/opt-state in place across iterations. Metrics
            come back stacked (K,) per leaf.
            """
            keys = jax.random.split(rng, K)

            def body(st, xs):
                batch, key = xs
                return train_step(st, batch, key)

            return jax.lax.scan(body, state, (batches, keys))

        if mesh is not None:
            repl = NamedSharding(mesh, P())
            batch_shard = NamedSharding(mesh, P(None, "data"))
            return jax.jit(multi_step,
                           in_shardings=(None, batch_shard, repl),
                           donate_argnums=(0,))
        return jax.jit(multi_step, donate_argnums=(0,))

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_shard = NamedSharding(mesh, P("data"))
        # State shardings are inferred from the input placement (None), so the
        # same step supports pure DP (replicated state) and DP+TP (state
        # pre-sharded over 'model' via parallel.sharding.state_shardings).
        train_step = jax.jit(
            train_step,
            in_shardings=(None, batch_shard, repl),
            donate_argnums=(0,),
        )
    else:
        train_step = jax.jit(train_step, donate_argnums=(0,))
    return train_step


def init_train_state(model, optimizer) -> TrainState:
    params = model.params if model.params is not None else model.init(
        model.config.get("seed", 0))
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def build_schedule(
    lr_mode: str = "CALR",
    base_lr: float = 1e-3,
    steps_per_epoch: int = 1,
    num_epochs: int = 250,
    calr_params=(2.0, 1.0, 1e-3),
    clr_params=(5e-5, 1.0, 1.25),
):
    """Reference LR menu (train_model.py:113-117, 246-251)."""
    if lr_mode == "CALR":
        return sched.cosine_decay_restarts(
            base_lr, first_decay_steps=steps_per_epoch * num_epochs,
            t_mul=calr_params[0], m_mul=calr_params[1], alpha=calr_params[2])
    if lr_mode == "CLR":
        return sched.cyclic_lr(
            base_lr=base_lr, max_lr=clr_params[0], mode="exp_range",
            gamma=clr_params[1], step_size=steps_per_epoch * clr_params[2])
    return lambda step: base_lr


def fit(
    model,
    x: Iterable,
    epochs: int = 1,
    steps_per_epoch: int = 1,
    initial_epoch: int = 0,
    optimizer: Any = None,
    loss: Any = None,
    loss_weights=None,
    elbo_beta: float = 10.0,
    mesh: Optional[Mesh] = None,
    weights_dir: Optional[str] = None,
    weights_min_epoch: int = 5,
    store_weights_per_n_epochs: int = 5,
    weights_overwrite: bool = False,
    validate_fn: Optional[Callable] = None,
    validate_per_n_epochs: int = 5,
    validate_min_epoch: int = 5,
    augment_params=None,
    train_obj: str = "lesion",
    seed: int = 0,
    log_fn: Callable[[str], None] = print,
    verbose: int = 2,
    schedule: Optional[Callable] = None,
    metrics_logger=None,
    checkpoint_manager=None,
    scan_steps: Optional[int] = None,
) -> Dict[str, list]:
    """Epoch/step fit loop with WeightsSaver + metrics history.

    ``x`` yields batches: dicts with 'image' (B,D,H,W,C) and 'detection'
    (B,D,H,W,nc) [+ optional 'KL' target, unused — the KL is computed in-model
    as in the reference (losses.py:52-63)].

    Observability / durability (SURVEY.md §5.3-5.5):
      * ``metrics_logger`` (utils.profiling.MetricsLogger) — one JSONL record
        per epoch + per validation pass;
      * ``checkpoint_manager`` (train.checkpoint.CheckpointManager) — async
        orbax full-state checkpoints, saved once per epoch (the manager's
        ``save_interval_steps`` governs cadence), auto-resumed from the
        latest step at fit() entry (overriding ``initial_epoch``).
    """
    if optimizer is None:
        optimizer = make_optimizer("adam", 1e-3)
    seg_loss = loss if callable(loss) else make_loss(loss or "distribution_focal")
    lw = loss_weights or (1.0, elbo_beta)
    if len(lw) > 1:
        elbo_beta = float(lw[1])

    if scan_steps is not None and scan_steps > 1 \
            and steps_per_epoch % scan_steps != 0:
        raise ValueError(
            f"scan_steps={scan_steps} must divide steps_per_epoch="
            f"{steps_per_epoch} (each epoch runs steps_per_epoch/scan_steps "
            "multi-step programs; pick a divisor)")
    use_scan = scan_steps is not None and scan_steps > 1
    step_fn = make_train_step(model, seg_loss, optimizer,
                              elbo_beta=elbo_beta, loss_weights=lw, mesh=mesh,
                              augment_params=augment_params, train_obj=train_obj,
                              scan_steps=scan_steps if use_scan else None)
    state = init_train_state(model, optimizer)
    rng = jax.random.PRNGKey(seed)

    if checkpoint_manager is not None and checkpoint_manager.latest_step() is not None:
        state, resumed_epoch = checkpoint_manager.restore(state)
        initial_epoch = max(initial_epoch, int(resumed_epoch))
        if verbose:
            log_fn(f"Restored orbax checkpoint @ epoch {resumed_epoch} "
                   f"({checkpoint_manager.directory})")

    history: Dict[str, list] = {"loss": [], "seg_loss": [], "epoch_time": []}
    it = iter(x)
    for epoch in range(initial_epoch, epochs):
        t0 = time.perf_counter()
        epoch_metrics: Dict[str, list] = {}
        if use_scan:
            for _ in range(steps_per_epoch // scan_steps):
                chunk = [next(it) for _ in range(scan_steps)]
                batches = jax.tree_util.tree_map(
                    lambda *leaves: jnp.stack(leaves), *chunk)
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, batches, step_rng)
                for k, v in metrics.items():  # v: (scan_steps,) stacked
                    epoch_metrics.setdefault(k, []).append(v)
        else:
            for _ in range(steps_per_epoch):
                batch = next(it)
                rng, step_rng = jax.random.split(rng)
                state, metrics = step_fn(state, batch, step_rng)
                for k, v in metrics.items():
                    epoch_metrics.setdefault(k, []).append(v)
        # Materialize once per epoch (keeps the device queue full within it).
        epoch_metrics = {k: float(np.mean(jax.device_get(v))) for k, v in epoch_metrics.items()}
        dt = time.perf_counter() - t0
        if schedule is not None:  # LR observability (Keras history parity)
            epoch_metrics["lr"] = float(schedule(int(jax.device_get(state.step))))
            history.setdefault("lr", []).append(epoch_metrics["lr"])
        history["loss"].append(epoch_metrics.get("loss"))
        history["seg_loss"].append(epoch_metrics.get("seg_loss"))
        history["epoch_time"].append(dt)
        if verbose:
            log_fn(f"epoch {epoch + 1}/{epochs} - "
                   + " ".join(f"{k}: {v:.5f}" for k, v in epoch_metrics.items())
                   + f" - {dt:.2f}s")
        if metrics_logger is not None:
            metrics_logger.log("epoch", epoch=epoch + 1,
                               epoch_time_s=round(dt, 3), **epoch_metrics)

        # Train-time validation (reference 'TBA' callbacks, train_model.py:240-245).
        if validate_fn is not None and ((epoch + 1) % validate_per_n_epochs == 0) \
                and (epoch + 1) >= validate_min_epoch:
            val = validate_fn(jax.device_get(state.params))
            history.setdefault("val", []).append({"epoch": epoch + 1, **val})
            if verbose:
                log_fn("validation @ epoch %d - %s" % (
                    epoch + 1, " ".join(f"{k}: {v:.4f}" for k, v in val.items())))
            if metrics_logger is not None:
                metrics_logger.log("validation", epoch=epoch + 1, **val)

        if checkpoint_manager is not None:
            checkpoint_manager.save(epoch + 1, state, config=model.config)

        # WeightsSaver semantics (callbacks.py:44-75).
        if weights_dir and ((epoch + 1) % store_weights_per_n_epochs == 0) \
                and epoch != 0 and (epoch + 1) >= weights_min_epoch:
            model.params = jax.device_get(state.params)
            path = os.path.join(weights_dir, f"model_weights_{epoch + 1:03d}.npz")
            model.save(path)
            if verbose:
                log_fn(f"Model Weights Saved: {path}")
            if weights_overwrite:
                prev = os.path.join(
                    weights_dir,
                    f"model_weights_{epoch + 1 - store_weights_per_n_epochs:03d}.npz")
                if os.path.exists(prev):
                    os.remove(prev)

    model.params = jax.device_get(state.params)
    model.opt_state = state.opt_state
    if checkpoint_manager is not None:
        checkpoint_manager.wait()  # async saves durable before returning
    return history


def resume_training(model, weights_dir: str, prefix: str = "model_weights"):
    """Scan ``weights_dir`` for the latest epoch checkpoint and reload
    (reference callbacks.py:195-215). Returns (model, init_epoch)."""
    init_epoch = 0
    latest = None
    if os.path.isdir(weights_dir):
        for f in os.listdir(weights_dir):
            if f.startswith(prefix) and f.endswith(".npz"):
                try:
                    ep = int(f[len(prefix) + 1:].split(".npz")[0])
                except ValueError:
                    continue
                if ep > init_epoch:
                    init_epoch, latest = ep, f
    if latest is not None:
        from ..models.m1 import M1

        print("Loading Model Weights...")
        model = M1.load(os.path.join(weights_dir, latest))
        print("Complete: ", os.path.join(weights_dir, latest))
        print(f"Resume Training @ Epoch {init_epoch}")
    else:
        print("Begin Training @ Epoch 0")
    return model, init_epoch
