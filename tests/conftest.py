"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

The reference never tested multi-device execution (SURVEY.md section 4); here
every test session gets 8 virtual CPU devices so sharded paths are exercised
on every run, and float64 so goldens can be compared against NumPy at 1e-10.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pre-sets jax_platforms to "axon,cpu" (TPU tunnel), which
# overrides JAX_PLATFORMS; force the CPU backend explicitly for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
