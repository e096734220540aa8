"""Near-pole accuracy guard for the LU fast/mixed tiers (VERDICT r4 item 5).

The refined-f32 LU tiers floor at ~cond * u_res and silently violate their
accuracy contract on real-axis grid points close to a bare eigenvalue of
the (H, S) pencil (PARITY.md round-4 caveat, device experiment e41).  The
engine must warn a user who explicitly picks solver='lu' (or hits the
silent spectral->LU fallback) on such a grid -- and stay silent on
broadened/contour grids, on the spectral route, and on the high/exact
tiers.
"""

import warnings

import numpy as np
import pytest

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.ops.greens import EnergyEngine


def _system(N=64):
    """e41 geometry family: tridiagonal junction, constant contact Sigma."""
    rng = np.random.default_rng(0)
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(N - 4, N)],
                           sig1=-0.1j)
    return H, S, g


def _near_pole_grid(H, dist=4.4e-7):
    lam = np.linalg.eigvalsh(H)
    return np.array([lam[len(lam) // 2] + dist, lam[0] - 1.0])


def test_warning_fires_on_near_pole_lu_grid():
    H, S, g = _system()
    E = _near_pole_grid(H)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="lu", energy_chunk=2))
    with pytest.warns(RuntimeWarning, match="bare eigenvalue"):
        eng.gr_sum(E, np.ones(E.size))


def test_warning_fires_once_per_grid():
    H, S, g = _system()
    E = _near_pole_grid(H)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="lu", energy_chunk=2))
    with pytest.warns(RuntimeWarning):
        eng.gr_sum(E, np.ones(E.size))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng.gr_sum(E, np.ones(E.size))          # same grid: silent
    with pytest.warns(RuntimeWarning):          # new near-pole grid warns
        eng.gr_sum(E + 1e-9, np.ones(E.size))


def test_gless_path_guarded():
    H, S, g = _system()
    E = _near_pole_grid(H)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="lu", energy_chunk=2))
    with pytest.warns(RuntimeWarning, match="bare eigenvalue"):
        eng.gless_sum(E, np.ones(E.size), contact=0)


def test_no_warning_off_axis_contour():
    H, S, g = _system()
    E = _near_pole_grid(H) + 0.3j              # contour: cond is bounded
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="lu", energy_chunk=2))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng.gr_sum(E, np.ones(E.size))


def test_no_warning_on_spectral_default():
    """solver='auto' serves near-pole points in contract (deflation + the
    exact-tier fallback) -- no warning on the default configuration."""
    H, S, g = _system()
    E = _near_pole_grid(H)
    eng = EnergyEngine(H, S, g, ExecutionConfig(energy_chunk=2))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng.gr_sum(E, np.ones(E.size))


def test_no_warning_high_tier_or_disabled():
    H, S, g = _system()
    E = _near_pole_grid(H)
    for cfg in (ExecutionConfig(precision="high", solver="lu",
                                energy_chunk=2),
                ExecutionConfig(precision="mixed", solver="lu",
                                energy_chunk=2, near_pole_warn=False)):
        eng = EnergyEngine(H, S, g, cfg)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            eng.gr_sum(E, np.ones(E.size))
