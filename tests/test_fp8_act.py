"""fp8 activation-storage deployment mode (round 5).

``ConvConfig.act_store`` rounds every block-boundary activation through
float8 so the materialized fusion-boundary buffers are half the bf16
width — an HBM-traffic lever on a program that is HBM-bound end to end
(docs/ATTRIBUTION.md; measured per-op in benchmarks/r5_quant_results.json,
whole-model in benchmarks/r5_fp8act_results.json). Opt-in: default None
keeps the exact bf16/fp32 graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.ops.convolution import ConvConfig, store_act

SPATIAL = (4, 16, 16)
KW = dict(
    input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
    filters=(4, 8, 12, 16, 24),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(2, 2, 2, 2, 2),
    att_sub_samp=((1, 1, 1),) * 4,
    dropout_rate=0.0, summary=False,
)


def test_store_act_noop_and_rounding():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4, 4, 8)),
                    jnp.float32)
    assert store_act(ConvConfig(), x) is x  # default: no-op, same object
    y = store_act(ConvConfig(act_store="float8_e4m3fn"), x)
    assert y.dtype == x.dtype  # back in compute dtype
    # rounded to e4m3 (3 mantissa bits): close but not identical
    d = np.abs(np.asarray(y) - np.asarray(x))
    assert 0 < d.max() < 0.12 * np.abs(np.asarray(x)).max()


@pytest.mark.parametrize("dt", ["float8_e4m3fn", "float8_e5m2"])
def test_m1_act_store_close_and_finite(dt):
    m0 = M1(**KW)
    m8 = M1(**KW, act_store=dt)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, *SPATIAL, 3)),
                    jnp.float32)
    y0 = m0.net.apply({"params": m0.params}, x, train=False)["y_softmax"]
    y8 = m8.net.apply({"params": m0.params}, x, train=False)["y_softmax"]
    y0, y8 = np.asarray(y0), np.asarray(y8)
    assert np.isfinite(y8).all()
    # random-init tiny net: probabilities near-uniform, fp8 rounding moves
    # them but the fields must stay close in the mean
    assert np.abs(y0 - y8).mean() < 0.05
    np.testing.assert_allclose(y8.sum(-1), 1.0, atol=1e-3)  # still softmax


def test_m1_act_store_config_roundtrip():
    m8 = M1(**KW, act_store=jnp.float8_e4m3fn, init_params=False)
    # ctor-arg capture stores the dtype by NAME so checkpoint configs stay
    # JSON-serializable and M1(**config) rebuilds the same graph
    assert "float8_e4m3" in str(m8.config["act_store"])
    m8b = M1(**m8.config, init_params=False)
    assert m8b.config["act_store"] == m8.config["act_store"]
