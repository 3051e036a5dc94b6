"""End-to-end model tests for M1Core / M1Net / M1 (tiny volumes).

Covers the five BASELINE.json configurations' wiring at miniature scale:
deterministic attention U-Net, dense-skip + deep supervision, hierarchical
probabilistic, and the cascaded two-stage graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.models import M1, M1Net

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

# Miniature geometry: 4x16x16 volume, 3 channels, 2 classes.
SPATIAL = (4, 16, 16)
# NOTE: consecutive filter counts must differ — the SE block only builds its
# projection shortcut on a channel change (network_blocks.py:63), so equal
# filters with stride>1 is an invalid config in the reference too.
FILTERS = (4, 8, 12, 16, 24)
STRIDES = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
ATT = ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1))
SE = (2, 2, 2, 2, 2)

COMMON = dict(
    filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
    se_reduction=SE, att_sub_samp=ATT, dropout_rate=0.0, summary=False,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def test_deterministic_forward():
    model = M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2, **COMMON)
    x = _rand((1, *SPATIAL, 3))
    out = model.apply(model.params, x)
    assert out["y_softmax"].shape == (1, *SPATIAL, 2)
    assert out["logits"].shape == (1, *SPATIAL, 2)
    assert out["y_"].shape == (1, *SPATIAL)
    np.testing.assert_allclose(np.asarray(jnp.sum(out["y_softmax"], -1)), 1.0, atol=1e-5)


def test_dense_skip_deep_supervision():
    model = M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
               dense_skip=True, deep_supervision=True, **COMMON)
    x = _rand((2, *SPATIAL, 3))
    out = model.apply(model.params, x)
    # 4 softmax groups concatenated (networks.py:750-751)
    assert out["y_softmax"].shape == (2, *SPATIAL, 8)


def test_probabilistic_forward_and_kl():
    model = M1(input_spatial_dims=SPATIAL, input_channels=4, num_classes=2,
               probabilistic=True, prob_latent_dims=(3, 2, 1, 0),
               dropout_mode="monte-carlo", **COMMON)
    x = _rand((1, *SPATIAL, 4))
    out = model.apply(model.params, x, rng=jax.random.PRNGKey(7))
    assert out["prob_softmax"].shape == (1, *SPATIAL, 2)
    assert out["prob_infer_conv"].shape == (1, *SPATIAL, 2)
    kl = np.asarray(out["prob_kl"])
    assert kl.shape == ()
    assert np.isfinite(kl) and kl >= 0.0


def test_probabilistic_sampling_variability():
    model = M1(input_spatial_dims=SPATIAL, input_channels=4, num_classes=2,
               probabilistic=True, prob_latent_dims=(2, 1, 0, 0), **COMMON)
    x = _rand((1, *SPATIAL, 4))
    a = model.apply(model.params, x, rng=jax.random.PRNGKey(0))
    b = model.apply(model.params, x, rng=jax.random.PRNGKey(1))
    # prior-sampled inference path differs across keys...
    assert not np.allclose(np.asarray(a["infer_softmax"]), np.asarray(b["infer_softmax"]))
    # ...while the mean-latent training path is key-independent (dropout off)
    np.testing.assert_allclose(
        np.asarray(a["prob_softmax"]), np.asarray(b["prob_softmax"]), atol=1e-6)


def test_fused_matches_unfused_prob_passes():
    """The shared-trunk restructure must match the 5-pass reference wiring
    exactly when dropout is off and the same latent rng is used."""
    kw = dict(input_spatial_dims=SPATIAL, input_channels=4, num_classes=2,
              probabilistic=True, prob_latent_dims=(2, 1, 0, 0), seed=3, **COMMON)
    fused = M1(fused_prob_passes=True, **kw)
    unfused = M1(fused_prob_passes=False, **kw)
    # identical init (same seed, same param structure)
    chex_equal = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: np.allclose(a, b), fused.params, unfused.params))
    assert chex_equal
    x = _rand((1, *SPATIAL, 4))
    a = fused.apply(fused.params, x, rng=jax.random.PRNGKey(5))
    b = unfused.apply(unfused.params, x, rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(a["prob_kl"]), np.asarray(b["prob_kl"]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a["prob_softmax"]), np.asarray(b["prob_softmax"]), atol=1e-5)


def test_cascaded_two_stage():
    model = M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
               cascaded="noisy-or", **COMMON)
    x = _rand((1, *SPATIAL, 3))
    out = model.apply(model.params, (x, x))
    assert out["detection_1"].shape == (1, *SPATIAL, 2)
    assert out["detection_2"].shape == (1, *SPATIAL, 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(out["detection_2"], -1)), 1.0, atol=1e-5)


def test_get_detect_model_deterministic():
    model = M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2, **COMMON)
    detect = model.get_detect_model()
    probs = detect(model.params, _rand((1, *SPATIAL, 3)))
    assert probs.shape == (1, *SPATIAL, 2)


def test_save_load_roundtrip(tmp_path):
    model = M1(input_spatial_dims=SPATIAL, input_channels=3, num_classes=2, **COMMON)
    x = _rand((1, *SPATIAL, 3))
    y0 = model.apply(model.params, x)["y_softmax"]
    p = str(tmp_path / "m1.npz")
    model.save(p)
    loaded = M1.load(p)
    y1 = loaded.apply(loaded.params, x)["y_softmax"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0)
    assert loaded.config["num_classes"] == 2
