"""Test harness: force an 8-device virtual CPU mesh BEFORE jax imports.

SURVEY.md section 5 "Multi-chip without a cluster": sharding logic is
exercised with simulated devices; identical shard_map code then runs on
a real TPU slice.  Pallas kernels run with interpret=True on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
