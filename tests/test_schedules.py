"""Schedule parity tests (reference train_model.py:113-116, callbacks.py)."""

import numpy as np

from prostatemr_3d_cad_cspca_tpu.train import schedules as sched


def test_cosine_decay_restarts_against_tf_formula():
    s = sched.cosine_decay_restarts(1e-3, first_decay_steps=100, t_mul=2.0, m_mul=1.0, alpha=1e-3)
    # step 0 -> initial lr
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    # just before the first restart -> approaches alpha * initial
    assert float(s(99)) < 2e-6
    # at exactly first_decay_steps TF restarts (fraction=0 of period 2)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-5)
    assert float(s(101)) > float(s(99))
    # halfway through the first period: (1-alpha)*0.5 + alpha
    np.testing.assert_allclose(float(s(50)), 1e-3 * ((1 - 1e-3) * 0.5 + 1e-3), rtol=1e-5)


def test_cosine_decay_restarts_t_mul_1():
    s = sched.cosine_decay_restarts(1.0, first_decay_steps=10, t_mul=1.0, m_mul=1.0, alpha=0.0)
    np.testing.assert_allclose(float(s(0)), float(s(10)), atol=1e-6)


def test_cyclic_lr_triangular():
    s = sched.cyclic_lr(base_lr=0.1, max_lr=0.5, step_size=10, mode="triangular")
    np.testing.assert_allclose(float(s(0)), 0.1, atol=1e-7)
    np.testing.assert_allclose(float(s(10)), 0.5, atol=1e-7)
    np.testing.assert_allclose(float(s(20)), 0.1, atol=1e-7)


def test_poly_lr_nnunet():
    s = sched.poly_lr(1e-2, exponent=0.9, max_epochs=100, steps_per_epoch=5)
    np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
    np.testing.assert_allclose(float(s(5 * 50)), 1e-2 * (1 - 0.5) ** 0.9, rtol=1e-5)


def test_piecewise_epoch_lr():
    s = sched.piecewise_epoch_lr([1e-3, 1e-4, 1e-5, 1e-6], [0, 10, 20, 30], steps_per_epoch=2)
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert abs(float(s(2 * 10)) - 1e-4) < 1e-9
    assert abs(float(s(2 * 35)) - 1e-6) < 1e-9
