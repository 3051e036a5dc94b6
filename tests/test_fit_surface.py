"""Keras-style surface test: M1(...).compile(...).fit(...) end to end
(reference usage: train_model.py:231,253-259)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.train.trainer import make_optimizer

import pytest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

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


def test_fit_observability_and_orbax_resume(tmp_path):
    """VERDICT r2 item 8: fit writes per-epoch JSONL metrics via
    MetricsLogger, saves async orbax full-state checkpoints, and a second
    fit auto-resumes (params + optimizer state + epoch) from the latest."""
    import json

    from prostatemr_3d_cad_cspca_tpu.train.checkpoint import CheckpointManager
    from prostatemr_3d_cad_cspca_tpu.utils.profiling import MetricsLogger

    def mk():
        return M1(
            input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
            filters=(4, 8, 12, 16, 24),
            strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
            kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
            se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
            dropout_rate=0.0, summary=False, seed=0)

    metrics_path = tmp_path / "metrics.jsonl"
    orbax_dir = str(tmp_path / "orbax")

    model = mk()
    model.compile(optimizer=make_optimizer("adam", 1e-3),
                  loss="distribution_focal", loss_weights=[1.0])
    mgr = CheckpointManager(orbax_dir, save_interval_steps=1)
    model.fit(_batches(), epochs=2, steps_per_epoch=2, verbose=0,
              metrics_logger=MetricsLogger(str(metrics_path), echo=False),
              checkpoint_manager=mgr)
    mgr.close()

    records = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    epochs = [r for r in records if r["event"] == "epoch"]
    assert [r["epoch"] for r in epochs] == [1, 2]
    assert all(np.isfinite(r["loss"]) for r in epochs)

    # fresh model + same orbax dir -> auto-resume at epoch 2, trains 3rd only
    model2 = mk()
    model2.compile(optimizer=make_optimizer("adam", 1e-3),
                   loss="distribution_focal", loss_weights=[1.0])
    mgr2 = CheckpointManager(orbax_dir, save_interval_steps=1)
    hist2 = model2.fit(_batches(), epochs=3, steps_per_epoch=2, verbose=0,
                       checkpoint_manager=mgr2)
    assert len(hist2["loss"]) == 1  # epochs 1-2 skipped by resume
    assert mgr2.latest_step() == 3
    mgr2.close()
