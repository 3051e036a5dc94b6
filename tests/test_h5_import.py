"""Build-order import of reference H5 checkpoints (VERDICT r2 item 4).

The reference's published pretrained model is saved by modelio.py:90-96 with
Keras DEFAULT layer names ('conv3d_7', 'instance_normalization_3', ...) in
the TF2.x topological H5 format. These tests round-trip that exact artifact
shape: build the unmodified-naming Keras M1 twin, write a legacy-format H5,
import it through utils.tf_import.import_reference_h5 (raw h5py, no layer
renames required), and assert voxel parity vs the TF forward.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # builds full (tiny) M1 graphs in TF and JAX

FILTERS = (4, 8, 12, 16, 24)
STRIDES = ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
KERNELS = ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3))
SE = (2, 2, 2, 2, 2)
SPATIAL = (4, 16, 16)


def _build_pair(default_names):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"))
    from tf_cpu_baseline import build_m1_tf

    from prostatemr_3d_cad_cspca_tpu.models import M1

    tf_model = build_m1_tf(
        input_shape=(*SPATIAL, 3), num_classes=2, filters=FILTERS,
        strides=STRIDES, kernels=KERNELS, se_reduction=SE,
        default_names=default_names)
    model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=FILTERS, strides=STRIDES, kernel_sizes=KERNELS,
        se_reduction=SE, att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False)
    return tf_model, model


def _save_legacy_h5(tf_model, path):
    """Write the TF2.x topological save_weights format the reference's
    modelio.py produces (root attr 'layer_names', per-layer 'weight_names')."""
    from keras.src.legacy.saving.legacy_h5_format import (
        save_weights_to_hdf5_group)

    with h5py.File(path, "w") as f:
        save_weights_to_hdf5_group(f, tf_model)


def test_default_names_h5_roundtrip(tmp_path):
    from prostatemr_3d_cad_cspca_tpu.models import M1  # noqa: F401
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import import_reference_h5

    tf_model, model = _build_pair(default_names=True)
    # sanity: the twin really has auto-names, not flax paths
    assert not any("." in l.name for l in tf_model.layers if l.weights)
    h5_path = str(tmp_path / "reference_checkpoint.h5")
    _save_legacy_h5(tf_model, h5_path)

    params = import_reference_h5(h5_path, model.params)
    x = np.random.default_rng(9).normal(size=(2, *SPATIAL, 3)).astype(np.float32)
    tf_out = tf_model(tf.constant(x), training=False).numpy()
    jax_out = np.asarray(model.apply(params, jnp.asarray(x))["y_softmax"])
    np.testing.assert_allclose(jax_out, tf_out, atol=5e-4)


def test_by_order_from_layer_list():
    """Same mapping, fed from a live model's layer list instead of an H5."""
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import (
        import_keras_m1_weights_by_order)

    tf_model, model = _build_pair(default_names=True)
    named = [(l.name, [np.asarray(w) for w in l.get_weights()])
             for l in tf_model.layers if l.weights]
    params = import_keras_m1_weights_by_order(named, model.params)
    x = np.random.default_rng(3).normal(size=(1, *SPATIAL, 3)).astype(np.float32)
    tf_out = tf_model(tf.constant(x), training=False).numpy()
    jax_out = np.asarray(model.apply(params, jnp.asarray(x))["y_softmax"])
    np.testing.assert_allclose(jax_out, tf_out, atol=5e-4)


def test_by_order_count_mismatch_raises():
    from prostatemr_3d_cad_cspca_tpu.utils.tf_import import (
        import_keras_m1_weights_by_order)

    tf_model, model = _build_pair(default_names=True)
    named = [(l.name, [np.asarray(w) for w in l.get_weights()])
             for l in tf_model.layers if l.weights]
    with pytest.raises(ValueError, match="architecture expects"):
        import_keras_m1_weights_by_order(named[:-1], model.params)
