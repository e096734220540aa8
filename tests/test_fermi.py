"""Fermi-search strategies: all methods must find the same level, and the
contact drivers must reproduce known fillings."""

import numpy as np
import pytest

from gaunegf_tpu import fermi as fs
from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy


def _system(n=10):
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(2), np.arange(n - 2, n)],
                           sig1=-0.2j)
    return H, S, g


def test_all_methods_agree():
    H, S, g = _system()
    ne = 5.0
    Emin = -6.0
    res = {}
    res["secant"] = fs.calc_fermi_secant(g, ne, Emin, 0.1, 64, conv=1e-6,
                                         max_cycles=50)[0]
    res["bisect"] = fs.calc_fermi_bisect(g, ne, Emin, 0.1, 64, conv=1e-6,
                                         max_cycles=80)[0]
    res["muller"] = fs.calc_fermi_muller(g, ne, Emin, 0.1, 64, conv=1e-6,
                                         max_cycles=50)[0]
    res["poly"] = fs.calc_fermi_poly_fit(g, ne, Emin, 0.1, 64, conv=1e-6,
                                         max_cycles=50)[0]
    vals = list(res.values())
    for k, v in res.items():
        assert abs(v - vals[0]) < 1e-3, (k, res)


def test_found_fermi_gives_target_count():
    from gaunegf_tpu.density import density_complex_n
    H, S, g = _system()
    ne = 5.0
    Ef = fs.calc_fermi_secant(g, ne, -6.0, 0.1, 128, conv=1e-8,
                              max_cycles=60)[0]
    P = density_complex_n(H, S, g, -6.0, Ef, 128, T=0)
    assert abs(np.trace(P @ S).real - ne) < 1e-6


def test_half_filling_symmetry():
    """Particle-hole symmetric chain: half filling puts the Fermi level at
    the band centre (E = 0)."""
    n = 8
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    g = ConstantSelfEnergy(H, np.eye(n), [np.arange(2),
                                          np.arange(n - 2, n)], sig1=-0.2j)
    # Emin deep enough that the Lorentzian tails below the contour are
    # negligible (they shift the apparent Fermi level otherwise)
    Ef = fs.calc_fermi_secant(g, n / 2, -200.0, 0.05, 512, conv=1e-7,
                              max_cycles=60)[0]
    assert abs(Ef) < 5e-3


def test_get_fermi_contact():
    """Isolated semi-infinite chain contact: half filling -> Ef at band
    centre (onsite energy)."""
    n = 4
    eps = 0.2
    H = eps * np.eye(n) - 1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    tau = np.zeros((n, n))
    tau[0, -1] = -1.0      # cell-to-cell hopping continuing the chain
    g = Chain1DSelfEnergy(H, np.eye(n), [np.arange(n)], taus=[tau],
                          staus=[np.zeros((n, n))], eta=1e-4)
    Ef = fs.get_fermi_contact(g, n / 2, tol=1e-3, Eminf=-1000.0,
                              verbose=False)
    assert abs(Ef - eps) < 0.05


def test_get_fermi_1d_contact():
    """Pattern-(c) system: lead Fermi via the 2-cell periodic block trick."""
    n = 2
    alpha = 0.1 * np.eye(n) - 1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    beta = np.zeros((n, n))
    beta[0, -1] = -1.0
    F = np.kron(np.eye(3), alpha)   # 3-cell device (any; only leads matter)
    S = np.eye(3 * n)
    g = Chain1DSelfEnergy(
        F, S, [np.arange(n), np.arange(2 * n, 3 * n)],
        taus=[beta, beta.conj().T], staus=[np.zeros((n, n))] * 2,
        alphas=[alpha, alpha], a_overlaps=[np.eye(n)] * 2,
        betas=[beta, beta], b_overlaps=[np.zeros((n, n))] * 2, eta=1e-4)
    Ef, Emin, N1, N2 = fs.get_fermi_1d_contact(g, n / 2, 0, tol=1e-3,
                                               Eminf=-1000.0, verbose=False)
    assert abs(Ef - 0.1) < 0.05
