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


# ---------------------------------------------------------------------------
# Slow-marking (round 5, VERDICT r4 item 6): the ~30 tests below each took
# >= 30 s in the round-5 durations run (full suite 61 min on a 1-core
# host); the CI fast lane deselects them with -m "not slow" while the
# nightly lane and a plain `pytest tests/` run everything.  Marked
# centrally so the list is maintained in one place; each family keeps at
# least one cheap representative unmarked (e.g. zsolve_dist [4-kar]/
# [4-bf3], the core spectral accuracy tests).  The dryrun entry tests are
# also covered by the workflow's explicit multichip step.
# ---------------------------------------------------------------------------
_SLOW_TESTS = {
    "test_model_parallel.py::test_zsolve_dist_matches_serial[2-bf3]",
    "test_model_parallel.py::test_zsolve_dist_matches_serial[2-kar]",
    "test_model_parallel.py::test_zsolve_dist_matches_serial[2-hi]",
    "test_model_parallel.py::test_zsolve_dist_matches_serial[4-hi]",
    "test_model_parallel.py::test_zsolve_dist_pads_uneven_sizes",
    "test_spectral.py::test_spectral_near_pole_grid",
    "test_spectral.py::test_defl_union_ritz_sharded",
    "test_spectral.py::test_defl_union_ritz_refinement",
    "test_spectral.py::test_spectral_forced_dw_mode",
    "test_spectral.py::test_on_pole_point_exact_hit",
    "test_spectral.py::test_spectral_deflated_segment_single_dispatch",
    "test_spectral.py::test_spectral_gless_near_pole_deflated",
    "test_spectral.py::test_spectral_transmission_matches_strict",
    "test_spectral.py::test_spectral_density_neq_matches_lu",
    "test_zlinalg.py::test_blocked_solve_under_shard_map",
    "test_entry.py::test_dryrun_multichip_self_provisions",
    "test_entry.py::test_dryrun_multichip_inline",
    "test_precision_tiers.py::test_exact_tier_energy_dependent_chain_provider",
    "test_density.py::test_adaptive_routes",
    "test_pallas_panel.py::test_psplit_panel_matches_split",
    "test_lattice3d.py::test_lattice3d_kspace_dw_provider",
    "test_lattice3d.py::test_lattice3d_kspace_warm_matches_cold_sweep",
    "test_kspace.py::test_sigma_down_dw_sym_reduction_exact",
    "test_kspace.py::test_sigma_down_dw_matches_c128",
    "test_bethe.py::test_warm_start_transmission_matches_cold",
    "test_density.py::test_contour_equals_real_axis_route",
    "test_iv_sweep.py::test_iv_sweep_sharded",
    "test_chain1d.py::test_chain_warm_transmission_matches_cold",
    "test_bethe.py::test_high_tier_engine_uses_bethe_dw",
    "test_lowrank.py::test_transmission_lowrank_equals_dense",
    "test_transport.py::test_current_matches_reference",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid.split("/")[-1]
        if nid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
