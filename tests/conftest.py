"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

Distributed tests exercise pjit/shard_map sharding exactly as they would run
over a TPU slice, but on host-platform virtual devices
(SURVEY.md §4: 1-vs-N device loss equivalence is the multi-node contract).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
