"""Test harness config.

Notes on the environment:
  * This host exposes one TPU chip (platform 'axon'); correctness tests run
    on it by default (the host has a single CPU core, so the TPU is also the
    fast path). Everything here also runs on jax[cpu].
  * An 8-device virtual CPU backend is always available via
    `jax.devices("cpu")` (xla_force_host_platform_device_count) — multi-chip
    sharding tests build their Mesh from those, the standard fake-backend
    trick (SURVEY.md §4).
  * Default matmul precision is raised to 'highest' so float32 reference
    paths are accurate on the TPU MXU; production code paths request bf16
    explicitly.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeat suite runs skip XLA compiles (the
# dominant cost on this 1-core host). Silence XLA:CPU's benign
# machine-feature-hint warnings printed on every cached-executable load.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
from neural_renderer_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

import jax  # noqa: E402

# NR_TEST_CPU=1 pins the whole test process to the CPU backend (the
# JAX_PLATFORMS env var is ignored under axon) — used to run the suite
# concurrently with TPU benchmarks/training without device contention.
if os.environ.get("NR_TEST_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def cpu_devices():
    """8 virtual CPU devices for multi-chip sharding tests."""
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "xla_force_host_platform_device_count not applied"
    return devs[:8]
