"""Test configuration: force an 8-device virtual CPU platform so sharding
paths are exercised without TPU hardware (driver contract; see repo
instructions)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported by a pytest plugin, in which case it captured
# JAX_PLATFORMS/XLA_FLAGS at import time — override through the config API
# (must happen before the backend is initialised).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

FIXTURES = "/root/reference/test/integration/fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    if not os.path.isdir(FIXTURES):
        pytest.skip("reference fixtures not available")
    return FIXTURES
