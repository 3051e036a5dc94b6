"""Device mesh construction and sharding helpers.

The reference's entire distributed story is single-host data parallelism via
``tf.distribute.MirroredStrategy`` + hidden NCCL all-reduce
(train_model.py:167-170, misc.py:27-58). The TPU-native replacement is a
named ``jax.sharding.Mesh`` with axes:

  * ``data``    — batch sharding (DP); gradient psum rides ICI.
  * ``model``   — optional channel sharding of the widest conv stages (TP).
  * ``spatial`` — optional D/H/W slab sharding with halo exchange for
                  whole-gland full-resolution inference (see parallel.halo).

``setup_device`` keeps the reference's misc.py:27-58 contract (device-count
discovery + batch divisibility assert) in mesh terms.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model, spatial) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        assert total % (n_model * n_spatial) == 0, (total, n_model, n_spatial)
        n_data = total // (n_model * n_spatial)
    used = n_data * n_model * n_spatial
    assert used <= total, f"mesh needs {used} devices, have {total}"
    arr = np.asarray(devices[:used]).reshape(n_data, n_model, n_spatial)
    return Mesh(arr, axis_names=("data", "model", "spatial"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis sharding for an ndim array (axis 0 = batch)."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def setup_device(device_ids: str = "all") -> Tuple[list, int]:
    """Reference misc.py:27-58 parity: map a device-id string to the device
    list. On TPU the runtime owns enumeration; ids select a subset."""
    devs = jax.devices()
    if device_ids in ("all", "", None):
        return devs, len(devs)
    ids = [int(i) for i in str(device_ids).split(",")]
    sel = [d for d in devs if d.id in ids]
    return sel, len(sel)


def assert_batch_divisible(batch_size: int, num_devices: int):
    """train_model.py:170 parity."""
    assert batch_size % max(num_devices, 1) == 0, (
        f"Batch size ({batch_size}) should be a multiple of the number of "
        f"devices ({num_devices}).")
