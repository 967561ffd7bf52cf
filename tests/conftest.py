"""Test harness config: force the CPU backend with 8 virtual devices.

Correctness tests run on jax[cpu] so no TPU is needed (SURVEY.md §4); the
multi-chip sharding tests use the standard fake-backend trick
(xla_force_host_platform_device_count=8).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
