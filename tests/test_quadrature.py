"""Quadrature tests (model: tests/testANT.py in the reference)."""

import numpy as np
import pytest

from gaunegf_tpu import quadrature as q


def test_ant_points_basic():
    x, w = q.ant_points(8)
    assert len(x) == 8 and len(w) == 8          # even count, pairs +/-x
    assert np.allclose(np.sort(x), np.sort(-x))
    # integrates constants: sum w ~ 2 (weight of [-1, 1])
    assert abs(np.sum(w) - 2.0) < 0.2


def test_ant_nested_node_containment():
    """N -> 3N contains the old nodes; weight-transfer ratio ~ 1/3."""
    x1, w1 = q.ant_points(6)
    x3, w3 = q.ant_points(18)
    old = np.isin(np.round(x3, 14), np.round(x1, 14))
    assert old.sum() == x1.size
    ratio = np.sum(w3[old]) / np.sum(w1)
    assert abs(ratio - 1 / 3) < 0.05


def test_ant_integrates_gaussian():
    f = lambda x: np.exp(-x ** 2)
    exact = 1.4936482656248540  # integral of exp(-x^2) over [-1,1]
    x, w = q.ant_points(54)
    assert abs(np.sum(w * f(x)) - exact) < 1e-6


def test_adaptive_ant_converges():
    calls = []

    def compute(x, w):
        calls.append(len(x))
        return np.sum(w * np.exp(-x ** 2))

    drv = q.AdaptiveANT(tol=1e-8, max_n=1000, verbose=False)
    val = drv.integrate(compute)
    assert drv.converged
    assert abs(val - 1.4936482656248540) < 1e-7
    # node reuse: later calls evaluate only the new nodes (2/3 of the level)
    assert calls[0] == 2
    for prev_total, n_new in zip(np.cumsum(calls)[:-1], calls[1:]):
        assert n_new == 2 * prev_total


def test_gauss_legendre_exactness():
    x, w = q.gauss_legendre(10)
    # exact for polynomials up to degree 19
    for p in range(0, 19):
        exact = (1 - (-1) ** (p + 1)) / (p + 1)
        assert abs(np.sum(w * x ** p) - exact) < 1e-12


def test_fermi_dirac():
    assert q.fermi_dirac(-1.0, 0.0, 0.0) == 1
    assert q.fermi_dirac(1.0, 0.0, 0.0) == 0
    assert q.fermi_dirac(0.0, 0.0, 300.0) == pytest.approx(0.5)
    # complex nodes: real-part step at T=0
    z = np.array([-1 + 1j, 1 + 1j])
    np.testing.assert_array_equal(q.fermi_dirac(z, 0.0, 0.0), [1, 0])


def test_real_axis_grid_integrates_density():
    # integral of f(E)=1 against Fermi weight at T=0 = mu - Emin
    E, w = q.real_axis_grid(-3.0, 1.0, 64, T=0.0)
    assert abs(np.sum(w) - 4.0) < 1e-10
    # finite T: integral of Fermi function extends ~symmetrically around mu
    E, w = q.real_axis_grid(-30.0, 1.0, 400, T=300.0)
    assert abs(np.sum(w) - 31.0) < 1e-3


def test_contour_closes_pole_free_integral():
    """For G(z) = 1/(z - e0) with e0 inside [Emin, mu], the contour integral
    Im(sum w G)/pi must equal the residue occupation (=1)."""
    e0 = -1.0
    for method in ("ant", "legendre"):
        z, w = q.contour_grid(-4.0, 1.5, 128, T=0.0, method=method)
        val = np.imag(np.sum(w / (z - e0))) / np.pi
        assert abs(val - 1.0) < 1e-6, method


def test_contour_excludes_state_above_mu():
    e0 = 3.0  # above mu: unoccupied
    z, w = q.contour_grid(-4.0, 1.5, 128, T=0.0)
    val = np.imag(np.sum(w / (z - e0))) / np.pi
    assert abs(val) < 1e-6


def test_contour_finite_temperature():
    """At T>0 an on-resonance state near mu gets fractional occupation."""
    T = 300.0
    mu = 0.0
    z, w = q.contour_grid(-5.0, mu, 256, T=T)
    # deep state: fully occupied
    val = np.imag(np.sum(w / (z - (-2.0)))) / np.pi
    assert abs(val - 1.0) < 1e-4
    # broadened state centred at mu (retarded pole below the axis):
    # occupation ~ 1/2 by Fermi-factor symmetry
    val_mu = np.imag(np.sum(w / (z - (mu - 0.05j)))) / np.pi
    assert abs(val_mu - 0.5) < 0.05


def test_bias_window_grid():
    mu1, mu2 = 0.5, -0.5
    E, w = q.bias_window_grid(mu1, mu2, 100, T=0.0)
    # total weight = -(mu1 - mu2) with the sign convention of the reference
    assert abs(np.sum(w) - (mu2 - mu1)) < 1e-10
