"""Low-rank contact fast path: agreement with the dense path.

Transmission and G< only need the contact columns of G; the fast path
solves nc right-hand sides instead of inverting (ops/greens.py
_point_transmission_lowrank / _point_gless_weighted_lowrank).  The only
approximation is dropping the -1j*1e-9*S broadening background from Gamma
(~1e-9 relative), so dense and low-rank must agree to ~1e-8.
"""

import dataclasses
import os

import numpy as np

from gaunegf_tpu import transport as tr
from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.ops.greens import EnergyEngine

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_v1.npz"))

DENSE = ExecutionConfig(use_lowrank=False)
LOWRANK = ExecutionConfig(use_lowrank=True)


def _system():
    H = GOLD["dens_H"]
    n = H.shape[0]
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(12, 16)],
                           sig1=-0.1j)
    return H, S, g


def test_transmission_lowrank_equals_dense():
    H, S, g = _system()
    E = np.linspace(-3, 3, 25)
    T_dense = EnergyEngine(H, S, g, DENSE).transmission(E)
    T_low = EnergyEngine(H, S, g, LOWRANK).transmission(E)
    assert np.max(np.abs(T_dense - T_low)) < 5e-7


def test_gless_lowrank_equals_dense():
    H, S, g = _system()
    E = np.linspace(-0.5, 0.5, 16)
    w = np.ones(16)
    d = EnergyEngine(H, S, g, DENSE).gless_sum(E, w, contact=1)
    l = EnergyEngine(H, S, g, LOWRANK).gless_sum(E, w, contact=1)
    assert np.max(np.abs(d - l)) < 5e-7


def test_chain_provider_lowrank():
    H, S = GOLD["chain_H"], GOLD["chain_S"]
    g = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(4, 8)], eta=1e-4)
    E = np.linspace(-3, 3, 15)
    T_dense = EnergyEngine(H, S, g, DENSE).transmission(E)
    T_low = EnergyEngine(H, S, g, LOWRANK).transmission(E)
    assert np.max(np.abs(T_dense - T_low)) < 5e-7


def test_static_sigma_support_detection():
    H, S, _ = _system()
    src = tr.SigmaSource(GOLD["trans_sig1"], GOLD["trans_sig2"])
    assert src.provider.contact_inds(0) == tuple(range(4))
    assert src.provider.contact_inds(1) == tuple(range(12, 16))
    # dense sigma -> no support
    rng = np.random.default_rng(0)
    dense = rng.standard_normal((16, 16)) * 1j
    src2 = tr.SigmaSource(dense, dense)
    assert src2.provider.contact_inds(0) is None


def test_spin_expansion_maps_support():
    src = tr.SigmaSource(GOLD["trans_sig1"], GOLD["trans_sig2"])
    prov_u = tr._ExpandedProvider(src.provider, "u")
    assert prov_u.contact_inds(0) == tuple(list(range(4))
                                           + list(range(16, 20)))
    prov_g = tr._ExpandedProvider(src.provider, "g")
    assert prov_g.contact_inds(0) == tuple(sorted(
        [2 * i for i in range(4)] + [2 * i + 1 for i in range(4)]))


def test_full_transport_sweep_lowrank_matches_golden():
    """calculate_transmission with the default (low-rank) config still
    matches the reference golden to the background-Gamma level."""
    H, S, _ = _system()
    T = tr.calculate_transmission(H, S,
                                  tr.SigmaSource(GOLD["trans_sig1"],
                                                 GOLD["trans_sig2"]),
                                  GOLD["trans_E"])
    assert np.max(np.abs(T - GOLD["trans_T"])) < 5e-7
