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

Multi-host (DCN): the reference never scales past one host
(MirroredStrategy is single-process, train_model.py:168). Here
``initialize_distributed`` wires ``jax.distributed.initialize`` — env-driven,
idempotent, and a no-op for single-process runs so every entry point can call
it unconditionally — and ``make_mesh`` then meshes the GLOBAL device set with
the slowest (DCN) links on the leading ``data`` axis, so gradient psum rides
DCN exactly once per step while model/spatial collectives stay on ICI.
``host_local_batch_to_global`` turns per-process loader output into a global
jax.Array for the pjit train step.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize the multi-host (DCN) runtime. Call BEFORE any other jax use.

    Replaces the reference's single-host MirroredStrategy scope
    (train_model.py:167-170) with JAX's multi-controller model: one process
    per host, each seeing its local chips, meshed globally after this call.

    Sources, in precedence order:
      1. explicit arguments;
      2. env vars ``PROSTATEMR_COORDINATOR`` / ``PROSTATEMR_NUM_PROCESSES`` /
         ``PROSTATEMR_PROCESS_ID``;
      3. platform auto-detection inside ``jax.distributed.initialize`` (TPU
         pod metadata) when ``PROSTATEMR_MULTIHOST=1``.

    Returns True if distributed init ran, False for single-process runs (the
    common case on one host — everything downstream works unchanged). A
    second call is a no-op, so libraries and CLIs can both call it.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    env = os.environ
    coordinator_address = coordinator_address or env.get("PROSTATEMR_COORDINATOR")
    if num_processes is None and env.get("PROSTATEMR_NUM_PROCESSES"):
        num_processes = int(env["PROSTATEMR_NUM_PROCESSES"])
    if process_id is None and env.get("PROSTATEMR_PROCESS_ID"):
        process_id = int(env["PROSTATEMR_PROCESS_ID"])
    auto = env.get("PROSTATEMR_MULTIHOST", "") == "1"
    if coordinator_address is None and num_processes is None and not auto:
        return False  # single-process: nothing to do
    # Fail with a configuration message, not an opaque runtime error deep in
    # jax.distributed: unless platform auto-detection is requested
    # (PROSTATEMR_MULTIHOST=1), coordinator/num_processes/process_id must be
    # either all present or all absent.
    if not auto:
        given = {
            "PROSTATEMR_COORDINATOR": coordinator_address,
            "PROSTATEMR_NUM_PROCESSES": num_processes,
            "PROSTATEMR_PROCESS_ID": process_id,
        }
        missing = [k for k, v in given.items() if v is None]
        if missing:
            raise ValueError(
                "Partial multi-host configuration: "
                f"{[k for k, v in given.items() if v is not None]} set but "
                f"{missing} missing. Set all three env vars (or pass the "
                "corresponding arguments), or set PROSTATEMR_MULTIHOST=1 for "
                "TPU-pod auto-detection.")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _DISTRIBUTED_INITIALIZED = True
    return True


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


def make_hybrid_mesh(
    n_data_dcn: Optional[int] = None,
    n_model: int = 1,
    n_spatial: int = 1,
) -> Mesh:
    """(data, model, spatial) mesh across a multi-slice/multi-host topology.

    Data parallelism is split hierarchically: the inter-host (DCN) factor is
    the leading mesh dimension and the intra-slice remainder fills in from
    ICI-contiguous devices, so ``model``/``spatial`` collectives never cross
    DCN and the per-step gradient psum crosses it exactly once. Single-process
    runs (including the CPU-mesh dryrun) degrade to ``make_mesh``.
    """
    n_proc = jax.process_count()
    if n_data_dcn is None:
        n_data_dcn = n_proc
    if n_proc == 1 or n_data_dcn == 1:
        return make_mesh(n_model=n_model, n_spatial=n_spatial)
    from jax.experimental import mesh_utils

    total = len(jax.devices())
    per = n_model * n_spatial
    assert total % (n_data_dcn * per) == 0, (total, n_data_dcn, per)
    n_data_ici = total // (n_data_dcn * per)
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(n_data_ici, n_model, n_spatial),
        dcn_mesh_shape=(n_data_dcn, 1, 1),
    ).reshape(n_data_dcn * n_data_ici, n_model, n_spatial)
    return Mesh(arr, axis_names=("data", "model", "spatial"))


def host_local_batch_to_global(mesh: Mesh, batch):
    """Assemble per-process loader output into global batch-sharded arrays.

    Each process loads its own shard of the global batch (global batch =
    per-process batch × process_count); this stitches them into jax.Arrays
    addressable by the pjit train step. Works unchanged (and cheaply) in
    single-process runs.
    """
    def to_global(x):
        sharding = data_sharding(mesh, np.ndim(x))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(to_global, batch)


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
