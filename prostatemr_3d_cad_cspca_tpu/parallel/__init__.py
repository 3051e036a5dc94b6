"""SPMD parallelism over TPU meshes: mesh construction, sharded train steps,
spatial halo exchange. The reference's only strategy was single-host
MirroredStrategy data parallelism (train_model.py:167-170); everything here
is new TPU-native capability (SURVEY.md §2.1-2.2)."""

from .mesh import (  # noqa: F401
    assert_batch_divisible,
    data_sharding,
    host_local_batch_to_global,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    setup_device,
)
