"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip logic (sharding, collectives) is validated on virtual CPU devices;
real-TPU behaviour is exercised separately by bench.py and the driver's
compile checks.
"""

import os

# Override any ambient platform selection (e.g. a TPU tunnel): tests always run
# on a virtual multi-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU-tunnel plugin registers itself via sitecustomize and
# overrides jax_platforms in-config, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference():
    return os.path.isdir(os.path.join(REFERENCE_DIR, "python"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repository not mounted")


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
