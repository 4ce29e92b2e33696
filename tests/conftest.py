"""Test harness configuration.

Forces an 8-device virtual CPU mesh so multi-chip sharding is exercised
without TPU hardware (the TPU-world equivalent of multi-node tests; see
SURVEY.md §4).  Must run before the first ``import jax`` anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU platform regardless of
# JAX_PLATFORMS; override it after import so tests run on the virtual CPU
# mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
