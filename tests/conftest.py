"""Test harness: force an 8-device virtual CPU mesh BEFORE jax is used.

SURVEY.md section 5 "Multi-chip without a cluster": sharding logic is
exercised with simulated devices; identical shard_map code then runs on
a real TPU slice.  Pallas kernels run with interpret=True on CPU.

NOTE: on this machine the axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so we must use jax.config.update — otherwise the
whole test suite silently runs over the TPU tunnel (~100x slower).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
