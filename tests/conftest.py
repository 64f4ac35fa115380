"""Test env: run on CPU with 8 fake devices so sharding tests work without a
pod (SURVEY §4.3).  Must run before any jax import."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU backend in every interpreter and
# overwrites jax_platforms; the chip is single-tenant, so a test process
# touching it deadlocks against any other JAX process.  Backends initialise
# lazily — forcing the config here (before any device op) keeps tests on CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "fake 8-device CPU mesh required"


@pytest.fixture
def rng():
    return np.random.default_rng(42)
