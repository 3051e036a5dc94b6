"""Multi-host (DCN) wiring tests — single-process semantics.

The reference's distributed story stops at single-host MirroredStrategy
(train_model.py:167-170); SURVEY.md §2.2 names jax.distributed.initialize +
hybrid DCN/ICI meshes as first-class TPU-native capability. Real multi-host
runs need a pod; these tests pin the single-process contracts every entry
point relies on (no-op init, hybrid-mesh degradation, local→global batch
assembly).
"""

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.parallel.mesh import (
    host_local_batch_to_global,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
)


def test_initialize_distributed_noop_single_process(monkeypatch):
    for var in ("PROSTATEMR_COORDINATOR", "PROSTATEMR_NUM_PROCESSES",
                "PROSTATEMR_PROCESS_ID", "PROSTATEMR_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
    assert jax.process_count() == 1  # untouched


def test_hybrid_mesh_degrades_to_flat_mesh_single_process():
    mesh = make_hybrid_mesh(n_model=2)
    assert mesh.axis_names == ("data", "model", "spatial")
    assert mesh.shape["data"] == len(jax.devices()) // 2
    assert mesh.shape["model"] == 2


def test_host_local_batch_to_global_roundtrip():
    mesh = make_mesh()
    batch = {
        "image": np.random.default_rng(0).normal(size=(8, 4, 6, 6, 3)).astype(np.float32),
        "label": np.zeros((8, 4, 6, 6, 2), np.float32),
    }
    global_batch = host_local_batch_to_global(mesh, batch)
    for k in batch:
        arr = global_batch[k]
        assert isinstance(arr, jax.Array)
        assert arr.shape == batch[k].shape
        np.testing.assert_array_equal(np.asarray(arr), batch[k])
    # sharded over the data axis: one shard per device along axis 0
    assert len(global_batch["image"].sharding.device_set) == len(jax.devices())


def test_global_batch_feeds_jitted_step():
    mesh = make_mesh()
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    gx = host_local_batch_to_global(mesh, x)
    y = jax.jit(lambda a: jnp.sum(a * 2.0))(gx)
    assert float(y) == float(x.sum() * 2.0)
