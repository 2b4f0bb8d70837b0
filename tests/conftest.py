"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests use the standard JAX fake-backend trick
(xla_force_host_platform_device_count) so the suite runs anywhere.
Must run before the first `import jax` anywhere in the test process.
"""

import os

# NB: the environment pre-imports jax via PYTHONPATH sitecustomize, so
# JAX_PLATFORMS in os.environ is read before this file runs — use the
# config API instead. XLA_FLAGS is read lazily at backend init, so the
# env route still works for the device-count flag.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# machine-local compile cache: the pipeline's large CPU test programs
# dominate suite wall time; entries are produced and consumed on this
# machine only (no cross-machine AOT risk)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/slam3d_test_xla_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("SLAM3D_TEST_PLATFORM", "cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference fixtures not available")
    return REFERENCE


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
