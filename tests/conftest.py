"""Test harness: force an 8-device virtual CPU platform BEFORE any jax use.

Distributed tests exercise pjit/shard_map sharding exactly as they would run
over a TPU slice, but on host-platform virtual devices
(SURVEY.md §4: 1-vs-N device loss equivalence is the multi-node contract).

NOTE: this environment presets JAX_PLATFORMS=axon (a remote-TPU plugin) and
re-asserts it inside the process, so the env var alone does NOT stick —
``jax.config.update('jax_platforms', 'cpu')`` is the reliable override.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
