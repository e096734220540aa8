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

# ---------------------------------------------------------------------------
# Memory-map guard (round 5, VERDICT r4 item 1).
#
# A full suite session accumulates hundreds of XLA CPU executables, each of
# which mmaps JIT code regions; Linux caps a process at vm.max_map_count
# mappings (65530 default).  Near the cap, LLVM's JIT linker segfaults
# inside backend_compile_and_load -- observed reproducibly at the largest
# compile of the session (the spectral transmission dispatch in
# tests/test_scf.py::test_save_mat_roundtrip), while the same test passes
# in isolation.  Between modules, when the map count crosses the
# threshold, drop every jit/pjit executable cache (jax.clear_caches also
# clears the lru_caches of our engine builders' jitted closures' compiled
# artifacts); later modules recompile what they need.  Counts are logged
# to /tmp/gaunegf_maps_guard.log for postmortems.
# ---------------------------------------------------------------------------
_MAPS_GUARD_LIMIT = int(os.environ.get("GAUNEGF_MAPS_GUARD", "40000"))


def _n_maps():
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return -1


def _guard_log(msg):
    try:
        with open("/tmp/gaunegf_maps_guard.log", "a") as f:
            f.write(msg + "\n")
    except OSError:
        pass


@pytest.fixture(autouse=True, scope="module")
def _xla_maps_guard(request):
    n = _n_maps()
    _guard_log(f"{request.module.__name__}: {n} maps")
    if 0 < _MAPS_GUARD_LIMIT < n:
        jax.clear_caches()
        _guard_log(f"{request.module.__name__}: cleared caches "
                   f"({n} -> {_n_maps()} maps)")
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
