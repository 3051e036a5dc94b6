"""Keras-style surface test: M1(...).compile(...).fit(...) end to end
(reference usage: train_model.py:231,253-259)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.train.trainer import make_optimizer

SPATIAL = (4, 16, 16)


def _batches(n=2, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        lab = np.zeros((n, *SPATIAL), np.int64)
        lab[:, 1:3, 4:10, 4:10] = 1
        det = np.eye(2, dtype=np.float32)[lab]
        img = rng.normal(size=(n, *SPATIAL, 3)).astype(np.float32)
        img[..., 0] += det[..., 1] * 2.0
        yield {"image": jnp.asarray(img), "detection": jnp.asarray(det)}


def test_compile_fit_predict_roundtrip(tmp_path):
    model = M1(
        input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False)

    model.compile(optimizer=make_optimizer("adam", 1e-3),
                  loss="distribution_focal", loss_weights=[1.0])
    history = model.fit(
        _batches(), epochs=3, steps_per_epoch=2,
        weights_dir=str(tmp_path), weights_min_epoch=1,
        store_weights_per_n_epochs=3, verbose=0)
    assert len(history["loss"]) == 3
    assert history["loss"][-1] < history["loss"][0]
    # WeightsSaver produced a checkpoint loadable via M1.load
    ckpt = tmp_path / "model_weights_003.npz"
    assert ckpt.exists()
    restored = M1.load(str(ckpt))
    probs = restored.predict(np.zeros((1, *SPATIAL, 3), np.float32))
    assert probs.shape == (1, *SPATIAL, 2)
