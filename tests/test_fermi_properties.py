"""Property-based Fermi-search tests: random monotone n(E) profiles.

VERDICT round-1 item 10: parity of the search family
(density.py:1056-1515) is guaranteed by BEHAVIOUR, not line-matching.
Each strategy is driven against analytically-known monotone electron
counts n(E) (sums of random sigmoids, the physical shape of integrated
DOS) by substituting the density probe; the properties asserted are the
ones NEGFE relies on (scfE.py:363-395):

* convergence: |n(Ef) - ne| < conv within the cycle budget;
* bracket validity: l_bound <= root <= u_bound whenever bounds exist;
* bisection-fallback usability: u_bound/l_bound straddle the root.
"""

import numpy as np
import pytest

import gaunegf_tpu.fermi as fermi


class FakeG:
    """Minimal provider double: diagonal P whose trace is n(E)."""

    def __init__(self, n_of_E, n_basis=40):
        self.n_of_E = n_of_E
        self.F = np.zeros((n_basis, n_basis))
        self.S = np.eye(n_basis)

    def setF(self, F, mu1, mu2):
        pass

    def sigmaTot(self, E):
        return -0.01j * np.eye(len(self.F))


def _monotone_profile(rng, n_basis=40):
    """Random smooth monotone n(E): sum of sigmoids (integrated DOS)."""
    k = rng.integers(3, 8)
    centers = rng.uniform(-6, 6, k)
    widths = rng.uniform(0.05, 1.0, k)
    heights = rng.uniform(0.5, 3.0, k)
    heights *= (0.8 * n_basis) / heights.sum()

    def n_of_E(E):
        return float(np.sum(heights / (1 + np.exp(-(E - centers) / widths))))

    return n_of_E


def _patch_probe(monkeypatch, g):
    """Make every contour probe return a density with trace n(E)."""
    def fake_p_mu(g_, Emin, N, tol, T, exec_cfg, mesh, method="ant"):
        def p(E):
            n = g.n_of_E(E)
            P = np.zeros_like(g.S)
            P[0, 0] = n
            return P
        return p

    monkeypatch.setattr(fermi, "_p_mu", fake_p_mu)
    monkeypatch.setattr(fermi, "dos_at_energy",
                        lambda E, F, S, sig: max(
                            (g.n_of_E(E + 5e-4) - g.n_of_E(E - 5e-4)) / 1e-3,
                            1e-6))


def _root_of(n_of_E, ne):
    from scipy.optimize import brentq
    return brentq(lambda E: n_of_E(E) - ne, -50, 50, xtol=1e-12)


METHODS = {
    "bisect": lambda g, ne, Ef: fermi.calc_fermi_bisect(
        g, ne, -10.0, Ef, 32, conv=1e-7, max_cycles=200),
    "secant": lambda g, ne, Ef: fermi.calc_fermi_secant(
        g, ne, -10.0, Ef, 32, conv=1e-7, max_cycles=200),
    "muller": lambda g, ne, Ef: fermi.calc_fermi_muller(
        g, ne, -10.0, Ef, 32, conv=1e-7, max_cycles=200),
    "polyfit": lambda g, ne, Ef: fermi.calc_fermi_poly_fit(
        g, ne, -10.0, Ef, 32, conv=1e-7, max_cycles=200),
}


@pytest.mark.parametrize("method", sorted(METHODS))
@pytest.mark.parametrize("seed", range(8))
def test_search_converges_on_random_monotone_profiles(
        monkeypatch, method, seed):
    rng = np.random.default_rng(seed)
    n_of_E = _monotone_profile(rng)
    g = FakeG(n_of_E)
    _patch_probe(monkeypatch, g)
    ne = float(rng.uniform(0.15, 0.85) * n_of_E(50.0))
    root = _root_of(n_of_E, ne)
    Ef0 = root + rng.uniform(-2.0, 2.0)      # imperfect starting guess

    out = METHODS[method](g, ne, Ef0)
    Ef = out[0]
    if method == "secant":
        # secant is not globally convergent (it stalls on DOS-gap
        # plateaus; the pre-rework implementation fails the same seeds) --
        # its contract is to report the residual honestly so NEGFE's
        # bisect fallback can take over (scfE.py:386-395)
        err = out[3]
        assert err > 1e-7 or abs(n_of_E(Ef) - ne) < 1e-6, (seed, Ef, root)
    else:
        assert abs(n_of_E(Ef) - ne) < 1e-6, (method, seed, Ef, root)

    if method in ("muller", "polyfit"):
        u_bound, l_bound = out[4], out[5]
        if u_bound is not None:
            assert n_of_E(u_bound) >= ne - 1e-6
        if l_bound is not None:
            assert n_of_E(l_bound) <= ne + 1e-6
        if u_bound is not None and l_bound is not None:
            assert l_bound <= root <= u_bound


@pytest.mark.parametrize("seed", range(4))
def test_calc_fermi_bracketed_bisection(monkeypatch, seed):
    rng = np.random.default_rng(100 + seed)
    n_of_E = _monotone_profile(rng)
    g = FakeG(n_of_E)
    _patch_probe(monkeypatch, g)
    # calc_fermi composes p_low() + p_mu(E); route the low part to zero
    monkeypatch.setattr(fermi, "density_real_n",
                        lambda *a, **k: np.zeros_like(g.S))
    ne = float(rng.uniform(0.2, 0.8) * n_of_E(50.0))
    root = _root_of(n_of_E, ne)
    Ef, Emin, N1, N2 = fermi.calc_fermi(
        g, ne, root - 4.0, root + 4.0, fermi_guess=root + 1.5,
        N1=32, N2=16, tol=1e-7, max_cycles=200, verbose=False)
    assert abs(n_of_E(Ef) - ne) < 1e-6


def test_calc_fermi_raises_when_target_below_spectrum(monkeypatch):
    g = FakeG(lambda E: 0.0)
    _patch_probe(monkeypatch, g)
    monkeypatch.setattr(fermi, "density_real_n",
                        lambda *a, **k: np.eye(len(g.S)))  # ne_low = 40
    with pytest.raises(RuntimeError, match="below lowest orbital"):
        fermi.calc_fermi(g, 5.0, -4.0, 4.0, verbose=False)


def test_bisect_memo_skips_duplicate_probe(monkeypatch):
    """The bracket-alignment re-probe must not pay a second integral."""
    rng = np.random.default_rng(7)
    n_of_E = _monotone_profile(rng)
    g = FakeG(n_of_E)
    calls = []

    def fake_p_mu(g_, Emin, N, tol, T, exec_cfg, mesh, method="ant"):
        def p(E):
            calls.append(E)
            P = np.zeros_like(g.S)
            P[0, 0] = n_of_E(E)
            return P
        return p

    monkeypatch.setattr(fermi, "_p_mu", fake_p_mu)
    monkeypatch.setattr(fermi, "dos_at_energy", lambda *a: 1.0)
    ne = 0.5 * n_of_E(50.0)
    fermi.calc_fermi_bisect(g, ne, -10.0, 0.5, 32, conv=1e-7,
                            max_cycles=200)
    assert len(calls) == len(set(calls)), "duplicate probe energies paid"


def test_muller_step_is_quadratic_root():
    """_muller_step finds the root of an exact quadratic in one step."""
    poly = np.array([0.3, -1.2, 0.7])          # 0.3 E^2 - 1.2 E + 0.7
    roots = np.roots(poly)
    pts = [(float(E), float(np.polyval(poly, E))) for E in (3.1, 2.7, 2.9)]
    E_next = fermi._muller_step(pts)
    nearest = roots[np.argmin(np.abs(roots - 2.9))]
    assert abs(E_next - nearest) < 1e-10
