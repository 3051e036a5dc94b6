"""Keras-exact amsgrad + fp8 activation-storage tests (round 5).

The round-5 learnable parity anchor (docs/PARITY.md) caught optax.amsgrad
diverging from tf.keras Adam(amsgrad=True) by 2.6e-2 relative at step 2 on
identical gradients: optax maxes the BIAS-CORRECTED second moment, Keras
maxes the RAW one and folds both corrections into the step size
(keras/optimizer_v2/adam.py; reference recipe train_model.py:120-121).
``scale_by_keras_amsgrad`` implements the Keras variant; these tests pin it
against a handwritten numpy oracle (fast tier) and against tf.keras itself
(slow tier).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from prostatemr_3d_cad_cspca_tpu.train.trainer import (
    keras_amsgrad,
    make_optimizer,
)


def _numpy_keras_amsgrad(w0, grads, lr, b1=0.9, b2=0.999, eps=1e-7):
    """Literal transcription of keras/optimizer_v2/adam.py (amsgrad=True):
    m_t = b1*m + (1-b1)*g; v_t = b2*v + (1-b2)*g^2; vhat = max(vhat, v_t);
    w -= lr * sqrt(1-b2^t)/(1-b1^t) * m_t / (sqrt(vhat) + eps)."""
    w = w0.astype(np.float64).copy()
    m = np.zeros_like(w)
    v = np.zeros_like(w)
    vhat = np.zeros_like(w)
    traj = []
    for t, g in enumerate(grads, start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        vhat = np.maximum(vhat, v)
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        w = w - lr_t * m / (np.sqrt(vhat) + eps)
        traj.append(w.copy())
    return traj


def test_keras_amsgrad_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(32,)).astype(np.float32)
    grads = [rng.normal(size=(32,)).astype(np.float32) * 0.1
             for _ in range(40)]
    oracle = _numpy_keras_amsgrad(w0, grads, lr=1e-3)

    tx = keras_amsgrad(1e-3)
    p = jnp.asarray(w0)
    st = tx.init(p)
    for t, g in enumerate(grads):
        up, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, up)
        np.testing.assert_allclose(
            np.asarray(p), oracle[t], rtol=2e-5, atol=1e-7,
            err_msg=f"step {t + 1}")


def test_keras_amsgrad_differs_from_optax_amsgrad():
    """The divergence the parity anchor caught: the two variants must NOT
    agree (if optax ever switches to raw-moment max, this flags the
    redundancy)."""
    rng = np.random.default_rng(1)
    w0 = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    grads = [jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
             for _ in range(5)]

    def run(tx):
        p, st = w0, tx.init(w0)
        for g in grads:
            up, st = tx.update(g, st, p)
            p = optax.apply_updates(p, up)
        return np.asarray(p)

    a = run(keras_amsgrad(1e-3, eps=1e-7))
    b = run(optax.amsgrad(1e-3, eps=1e-7))
    assert np.abs(a - b).max() > 1e-5


def test_make_optimizer_adam_is_keras_variant():
    """make_optimizer('adam') must route through keras_amsgrad (not
    optax.amsgrad) — identical updates over several steps."""
    rng = np.random.default_rng(2)
    w0 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    grads = [jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
             for _ in range(4)]

    def run(tx):
        p, st = w0, tx.init(w0)
        for g in grads:
            up, st = tx.update(g, st, p)
            p = optax.apply_updates(p, up)
        return np.asarray(p)

    np.testing.assert_array_equal(
        run(make_optimizer("adam", 1e-3)), run(keras_amsgrad(1e-3)))


@pytest.mark.slow
def test_keras_amsgrad_matches_tf_oracle():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(64,)).astype(np.float32)
    grads = [rng.normal(size=(64,)).astype(np.float32) * 0.1
             for _ in range(60)]

    v = tf.Variable(w0)
    opt = tf.keras.optimizers.Adam(learning_rate=1e-3, amsgrad=True)
    ktraj = []
    for g in grads:
        opt.apply_gradients([(tf.constant(g), v)])
        ktraj.append(v.numpy().copy())

    tx = make_optimizer("adam", 1e-3)
    p = jnp.asarray(w0)
    st = tx.init(p)
    for t, g in enumerate(grads):
        up, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, up)
        rel = np.abs(np.asarray(p) - ktraj[t]) / np.maximum(
            np.abs(ktraj[t]), 1e-9)
        assert rel.max() < 1e-5, f"step {t + 1}: {rel.max():.2e}"
