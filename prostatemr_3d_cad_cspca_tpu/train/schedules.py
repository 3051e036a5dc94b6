"""Learning-rate schedules (optax-style step -> lr callables).

Parity targets:
  * CosineDecayRestarts (primary recipe) — tf.keras CosineDecayRestarts used
    at reference train_model.py:113-116 (t_mul, m_mul, alpha); formula matches
    TF's implementation exactly.
  * CyclicLR (triangular / triangular2 / exp_range) — reference
    callbacks.py:123-191.
  * PolyLR (nnU-Net heuristic) — reference callbacks.py:105-119.
  * ReduceLR piecewise schedule — reference callbacks.py:79-101.

All schedules are pure functions of the (traced) step, so they live inside
the jitted train step — no callback machinery mutating optimizer state from
Python as in the reference.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_decay_restarts(
    initial_learning_rate: float,
    first_decay_steps: int,
    t_mul: float = 2.0,
    m_mul: float = 1.0,
    alpha: float = 0.0,
) -> Schedule:
    """SGDR cosine decay with warm restarts (TF CosineDecayRestarts parity)."""

    def schedule(step):
        completed = jnp.asarray(step, jnp.float32) / float(first_decay_steps)
        if t_mul == 1.0:
            i_restart = jnp.floor(completed)
            frac = completed - i_restart
        else:
            i_restart = jnp.floor(
                jnp.log(jnp.maximum(1.0 - completed * (1.0 - t_mul), 1e-30))
                / math.log(t_mul)
            )
            sum_r = (1.0 - t_mul ** i_restart) / (1.0 - t_mul)
            frac = (completed - sum_r) / (t_mul ** i_restart)
        m_fac = m_mul ** i_restart
        cosine_decayed = 0.5 * m_fac * (1.0 + jnp.cos(jnp.pi * frac))
        decayed = (1.0 - alpha) * cosine_decayed + alpha
        return initial_learning_rate * decayed

    return schedule


def cyclic_lr(
    base_lr: float = 0.001,
    max_lr: float = 0.006,
    step_size: float = 2000.0,
    mode: str = "triangular",
    gamma: float = 1.0,
) -> Schedule:
    """Per-step cyclic LR (reference callbacks.py:123-191)."""

    def schedule(step):
        it = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + it / (2.0 * step_size))
        x = jnp.abs(it / step_size - 2.0 * cycle + 1.0)
        amp = jnp.maximum(0.0, 1.0 - x)
        if mode == "triangular":
            scale = 1.0
        elif mode == "triangular2":
            scale = 1.0 / (2.0 ** (cycle - 1.0))
        elif mode == "exp_range":
            scale = gamma ** it
        else:
            raise ValueError(f"Unknown CLR mode: {mode!r}")
        return base_lr + (max_lr - base_lr) * amp * scale

    return schedule


def poly_lr(initial_lr: float, exponent: float, max_epochs: int, steps_per_epoch: int) -> Schedule:
    """nnU-Net poly decay per epoch (reference callbacks.py:105-119)."""

    def schedule(step):
        epoch = jnp.floor(jnp.asarray(step, jnp.float32) / steps_per_epoch)
        return initial_lr * (1.0 - epoch / max_epochs) ** exponent

    return schedule


def piecewise_epoch_lr(
    lr_rates: Sequence[float], epoch_points: Sequence[int], steps_per_epoch: int
) -> Schedule:
    """ReduceLR_Schedule parity (reference callbacks.py:79-101): step function
    of (epoch+1) over 4 breakpoints."""
    assert len(lr_rates) == len(epoch_points)

    def schedule(step):
        epoch1 = jnp.floor(jnp.asarray(step, jnp.float32) / steps_per_epoch) + 1.0
        lr = jnp.asarray(lr_rates[0], jnp.float32)
        for rate, point in zip(lr_rates, epoch_points):
            lr = jnp.where(epoch1 >= point, rate, lr)
        return lr

    return schedule
