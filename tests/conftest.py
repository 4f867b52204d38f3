"""Test configuration: force a virtual 8-device CPU platform.

All tests run on CPU with 8 virtual XLA devices so that multi-chip shardings
(mesh / pjit / shard_map) are exercised without TPU hardware, mirroring the
reference's absent-but-needed distributed test story (SURVEY.md §4).

This must run before `import jax` anywhere in the test process.
"""

import os

# SMOLTTS_TEST_TPU=1 runs the suite on the real accelerator (for the few
# TPU-only tests, e.g. Pallas PRNG statistics); default is the virtual CPU mesh.
_USE_TPU = os.environ.get("SMOLTTS_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin a TPU platform
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize may import jax at interpreter startup (before
# this conftest), in which case jax has already latched JAX_PLATFORMS from the
# environment; override through the config API as well.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed() -> int:
    return 0
