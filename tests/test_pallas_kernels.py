"""Pallas kernel correctness vs the XLA reference composition (interpret mode
on CPU; the same code compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.ops.pallas import fused_norm


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode on the CPU test platform."""
    from jax.experimental import pallas as pl

    real_call = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real_call(*args, **kwargs)

    monkeypatch.setattr(fused_norm.pl, "pallas_call", patched)
    yield


@pytest.mark.parametrize("shape,c", [((2, 4, 8, 8), 16), ((1, 2, 16, 16), 32),
                                     ((2, 1, 8, 16), 128)])
def test_fused_in_lrelu_matches_xla(shape, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, size=(*shape, c)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.1, size=(c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.1, size=(c,)), jnp.float32)
    got = fused_norm.fused_instance_norm_lrelu(x, scale, bias)
    want = fused_norm._xla_in_lrelu(x, scale, bias, 1e-3, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_in_lrelu_fallback_odd_channels():
    # C=24 doesn't divide 128 -> XLA fallback path must be used and correct
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 24)), jnp.float32)
    scale, bias = jnp.ones((24,)), jnp.zeros((24,))
    got = fused_norm.fused_instance_norm_lrelu(x, scale, bias)
    want = fused_norm._xla_in_lrelu(x, scale, bias, 1e-3, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_in_lrelu_grad_matches_xla():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.1, size=(16,)), jnp.float32)
    bias = jnp.zeros((16,))

    def loss_fused(x, s, b):
        return jnp.sum(fused_norm.fused_instance_norm_lrelu(x, s, b) ** 2)

    def loss_xla(x, s, b):
        return jnp.sum(fused_norm._xla_in_lrelu(x, s, b, 1e-3, 0.1) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
