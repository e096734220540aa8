"""Fermi-level search strategies.

Functional parity with the search family in gauNEGF/density.py:1056-1515:
full-bracket bisection (calc_fermi), DOS-informed expanding bisection
(calc_fermi_bisect), secant, Muller, and robust PCHIP+Huber polynomial
regression (calc_fermi_poly_fit), plus the contact-level drivers
get_fermi_contact / get_fermi_1d_contact.

All searches are host-driven sequential loops (each probe is a full contour
integral, inherently sequential -- SURVEY.md section 7.4 item 4); every probe is a
single sharded density_complex_n call so the device mesh stays busy.

Documented deviation: the reference's calc_fermi_bisect DOS step-size
heuristic calls its DOS kernel with F and S swapped (density.py:1176); we
use the correct argument order (affects only the bracketing step sizes,
never the converged Fermi level).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

from gaunegf_tpu.config import (
    ADAPTIVE_INTEGRATION_TOL, ENERGY_MIN, FERMI_CALCULATION_TOL,
    FERMI_SEARCH_CYCLES, MAX_CYCLES, TEMPERATURE, ExecutionConfig)
from gaunegf_tpu.density import (
    density_complex, density_complex_n, density_real, density_real_n,
    dos_at_energy, integral_fit)

__all__ = [
    "calc_fermi", "calc_fermi_bisect", "calc_fermi_secant",
    "calc_fermi_muller", "calc_fermi_poly_fit",
    "get_fermi_contact", "get_fermi_1d_contact",
]

_DEFAULT_EXEC = ExecutionConfig()
FERMI_DEBUG = False


def _p_mu(g, Emin, N, tol, T, exec_cfg, mesh, method="ant"):
    if N is None:
        return lambda E: density_complex(g.F, g.S, g, Emin, E, tol, T,
                                         exec_cfg=exec_cfg, mesh=mesh,
                                         verbose=False)
    return lambda E: density_complex_n(g.F, g.S, g, Emin, E, int(N), T=T,
                                       method=method, exec_cfg=exec_cfg,
                                       mesh=mesh)


def _ne_of(P, S, n_orbs=0):
    PS = np.asarray(P) @ np.asarray(S)
    if n_orbs:
        return float(np.trace(PS[-n_orbs:, -n_orbs:]).real)
    return float(np.trace(PS).real)


def calc_fermi(g, ne, Emin, Emax, fermi_guess=0.0, N1=100, N2=50,
               Eminf=ENERGY_MIN, T=TEMPERATURE, tol=FERMI_CALCULATION_TOL,
               max_cycles=MAX_CYCLES, n_orbs=0, exec_cfg=_DEFAULT_EXEC,
               mesh=None, verbose=True):
    """Bracketed bisection over [Emin, Emax] with full-contour probes
    (calcFermi, density.py:1056-1143)."""
    if verbose:
        dos_inf = dos_at_energy(Eminf, g.F, g.S, g.sigmaTot(Eminf))
        print(f"Eminf DOS = {dos_inf}")
    fermi = fermi_guess

    def p_low():
        if N2 is None:
            return density_real(g.F, g.S, g, Eminf, Emin, tol, T=0,
                                exec_cfg=exec_cfg, mesh=mesh, verbose=False)
        return density_real_n(g.F, g.S, g, Eminf, Emin, int(N2), T=T,
                              exec_cfg=exec_cfg, mesh=mesh)

    ne_low = _ne_of(p_low(), g.S, n_orbs)
    if verbose:
        print(f"Electrons below lowest onsite energy: {ne_low}")
    if ne_low >= ne:
        raise RuntimeError(
            "Calculated Fermi energy is below lowest orbital energy!")
    # the reference's bracketed search probes with the Legendre contour
    # (density.py:1110-1112), unlike the ANT-rule defaults elsewhere
    p_mu = _p_mu(g, Emin, N1, tol, T, exec_cfg, mesh, method="legendre")

    n_curr = -1.0
    counter = 0
    lo, hi = Emin, Emax
    if verbose:
        print("Calculating Fermi energy using bisection:")
    while (abs(ne - n_curr) > tol and hi - lo > tol / 10
           and counter < max_cycles):
        g.setF(g.F, fermi, fermi)
        P = np.real(p_low() + p_mu(fermi))
        n_curr = _ne_of(P, g.S, n_orbs)
        dN = ne - n_curr
        if dN > 0 and fermi > lo:
            lo = fermi
        elif dN < 0 and fermi < hi:
            hi = fermi
        if abs(dN) > tol:
            fermi = (hi + lo) / 2
        if verbose:
            print("DN:", dN, "Fermi:", fermi, "Bounds:", lo, hi)
        counter += 1
    if abs(ne - n_curr) > tol and counter >= max_cycles:
        print(f"Warning: Fermi energy still not within tolerance! "
              f"Ef = {fermi:.2f} eV, N = {n_curr:.2f})")
    if verbose:
        print(f"Finished after {counter} iterations, Ef = {fermi:.2f}")
    return fermi, Emin, N1, N2


def calc_fermi_bisect(g, ne, Emin, Ef, N, tol=ADAPTIVE_INTEGRATION_TOL,
                      conv=FERMI_CALCULATION_TOL,
                      max_cycles=FERMI_SEARCH_CYCLES, T=TEMPERATURE,
                      u_bound=None, l_bound=None, exec_cfg=_DEFAULT_EXEC,
                      mesh=None):
    """Expanding-bracket bisection with DOS-informed step sizes
    (calcFermiBisect, density.py:1145-1201)."""
    assert ne < len(g.F), \
        "Number of electrons cannot exceed number of basis functions!"
    p_mu = _p_mu(g, Emin, N, tol, T, exec_cfg, mesh)
    E = float(Ef)
    dE = tol
    counter = 0
    g.setF(g.F, E, E)
    P = p_mu(E)
    n_curr = _ne_of(P, g.S)
    while (u_bound is None or l_bound is None) and counter < max_cycles:
        if n_curr > ne:
            u_bound = E + 0.0
            Ef = u_bound
            E -= dE
        if n_curr < ne:
            l_bound = E + 0.0
            Ef = l_bound
            E += dE
        if FERMI_DEBUG:
            print(f"DEBUG: Ef={Ef:.2f}, dN={ne - n_curr:.2E}, dE={dE:.2E}")
        dos = dos_at_energy(E, g.F, g.S, g.sigmaTot(E))
        dE = max(2 * abs(n_curr - ne) / max(dos, 1e-12), dE)
        counter += 1
        g.setF(g.F, E, E)
        P = p_mu(E)
        n_curr = _ne_of(P, g.S)
    if E != Ef:
        # Align the electron count with Ef before bisecting.  The reference
        # enters its bisection with n_curr taken at the last bracketing
        # probe E but attributes it to Ef (density.py:1182-1196), which can
        # collapse the bracket to u_bound == l_bound; documented robustness
        # fix.
        g.setF(g.F, Ef, Ef)
        P = p_mu(Ef)
        n_curr = _ne_of(P, g.S)
    while abs(ne - n_curr) > conv and counter < max_cycles \
            and u_bound != l_bound:
        dN = ne - n_curr
        if dN > 0 and Ef > l_bound:
            l_bound = Ef + 0.0
        elif dN < 0 and Ef < u_bound:
            u_bound = Ef + 0.0
        Ef = (u_bound + l_bound) / 2
        dE = u_bound - l_bound
        counter += 1
        if abs(dN) > conv:
            g.setF(g.F, Ef, Ef)
            P = p_mu(Ef)
            n_curr = _ne_of(P, g.S)
    if counter == max_cycles:
        print(f"Warning: Max cycles reached, convergence = "
              f"{abs(n_curr - ne):.2E}")
    elif u_bound == l_bound:
        print(f"Warning: Bisection failed, convergence = "
              f"{abs(n_curr - ne):.2E}")
    return Ef, dE, P


def calc_fermi_secant(g, ne, Emin, Ef, N, tol=ADAPTIVE_INTEGRATION_TOL,
                      conv=FERMI_CALCULATION_TOL,
                      max_cycles=FERMI_SEARCH_CYCLES, T=TEMPERATURE,
                      exec_cfg=_DEFAULT_EXEC, mesh=None):
    """Secant iteration (calcFermiSecant, density.py:1203-1238)."""
    assert ne < len(g.F), \
        "Number of electrons cannot exceed number of basis functions!"
    p_mu = _p_mu(g, Emin, N, tol, T, exec_cfg, mesh)
    g.setF(g.F, Ef, Ef)
    P = p_mu(Ef)
    n_curr = _ne_of(P, g.S)
    dE = conv
    counter = 0
    while abs(n_curr - ne) > conv and counter < max_cycles:
        Ef += dE
        g.setF(g.F, Ef, Ef)
        P = p_mu(Ef)
        n_next = _ne_of(P, g.S)
        if FERMI_DEBUG:
            print(f"DEBUG: Ef={Ef:.2f}, dN={n_next - ne:.2E}, dE={dE:.2E}")
        if abs(n_next - n_curr) < 1e-10:
            print("Warning: change in ne low, reducing step size")
            dE *= 0.1
            counter += 1
            continue
        dE = dE * ((ne - n_curr) / (n_next - n_curr)) - dE
        n_curr = n_next + 0.0
        counter += 1
    Ef += dE
    if counter == max_cycles:
        print(f"Warning: Max cycles reached, convergence = "
              f"{abs(n_curr - ne):.2E}")
    return Ef, dE, P, abs(n_curr - ne)


def calc_fermi_muller(g, ne, Emin, Ef, N, tol=ADAPTIVE_INTEGRATION_TOL,
                      conv=FERMI_CALCULATION_TOL,
                      max_cycles=FERMI_SEARCH_CYCLES, T=TEMPERATURE,
                      exec_cfg=_DEFAULT_EXEC, mesh=None):
    """Muller's quadratic root iteration (calcFermiMuller,
    density.py:1240-1331).  Returns (Ef, dE, P, err, u_bound, l_bound)."""
    assert ne < len(g.F), \
        "Number of electrons cannot exceed number of basis functions!"
    p_mu = _p_mu(g, Emin, N, tol, T, exec_cfg, mesh)

    E2 = float(Ef)
    E1 = E2 - conv
    E0 = E2 + conv
    u_bound = None
    l_bound = None
    n_list = []
    P = None
    for E in (E2, E1, E0):
        g.setF(g.F, E, E)
        P = p_mu(E)
        nn = _ne_of(P, g.S) - ne
        if nn > 0:
            u_bound = min(u_bound, E) if u_bound is not None else E
        elif nn < 0:
            l_bound = max(l_bound, E) if l_bound is not None else E
        if abs(nn) < conv:
            return E, 0.0, P, abs(nn), u_bound, l_bound
        n_list.append(nn)
    n2, n1, n0 = n_list

    counter = 3
    dE = conv
    while counter < max_cycles:
        h0 = E0 - E2
        h1 = E1 - E2
        c = n2
        e0 = n0 - c
        e1 = n1 - c
        det = h0 * h1 * (h0 - h1)
        a = (e0 * h1 - h0 * e1) / det
        b = (h0 * h0 * e1 - h1 * h1 * e0) / det
        disc = np.sqrt(b * b - 4 * a * c) if b * b > 4 * a * c else 0.0
        if b < 0:
            disc = -disc
        dE = -2 * c / (b + disc)
        E_next = E2 + dE
        if abs(E_next - E1) < abs(E_next - E0):
            E0, E1 = E1, E0
            n0, n1 = n1, n0
        if abs(E_next - E2) < abs(E_next - E1):
            E1 = E2
            n1 = n2
        E2 = E_next
        g.setF(g.F, E2, E2)
        P = p_mu(E2)
        n2 = _ne_of(P, g.S) - ne
        if n2 > 0:
            u_bound = min(u_bound, E2) if u_bound is not None else E2
        elif n2 < 0:
            l_bound = max(l_bound, E2) if l_bound is not None else E2
        if abs(n2) < conv:
            break
        if FERMI_DEBUG:
            print(f"DEBUG: Ef={E2:.2f}, dN={n2:.2E}, dE={dE:.2E}")
        counter += 1
    if counter == max_cycles:
        print(f"Warning: Max cycles reached, convergence = {abs(n2):.2E}")
    return E2, dE, P, abs(n2), u_bound, l_bound


def calc_fermi_poly_fit(g, ne, Emin, Ef, N, tol=ADAPTIVE_INTEGRATION_TOL,
                        conv=FERMI_CALCULATION_TOL,
                        max_cycles=FERMI_SEARCH_CYCLES, T=TEMPERATURE,
                        order=3, exec_cfg=_DEFAULT_EXEC, mesh=None):
    """Accumulating-history robust polynomial regression root finder
    (calcFermiPolyFit, density.py:1333-1515): PCHIP-smoothed points, Huber-
    loss polynomial fit, nearest real root, monotonicity enforcement."""
    from scipy.interpolate import PchipInterpolator
    from scipy.optimize import least_squares

    assert ne < len(g.F), \
        "Number of electrons cannot exceed number of basis functions!"
    p_mu = _p_mu(g, Emin, N, tol, T, exec_cfg, mesh)
    E_pts, n_pts = [], []
    u_bound = None
    l_bound = None

    E = float(Ef)
    g.setF(g.F, E, E)
    P = p_mu(E)
    n = _ne_of(P, g.S) - ne
    if abs(n) < conv:
        return E, 0.0, P, abs(n), u_bound, l_bound
    E_pts.append(E)
    n_pts.append(n)

    # establish a second point with measurable dN (monotonicity seed)
    step = conv * 10
    n_first = n
    counter = 1
    while counter < max_cycles:
        E = Ef + step
        g.setF(g.F, E, E)
        P = p_mu(E)
        n = _ne_of(P, g.S) - ne
        if n > 0:
            u_bound = min(u_bound, E) if u_bound is not None else E
        elif n < 0:
            l_bound = max(l_bound, E) if l_bound is not None else E
        if abs(n) < conv:
            return E, step, P, abs(n), u_bound, l_bound
        if n - n_first > 0:
            break
        step *= 10
        counter += 1
    E_pts.append(E)
    n_pts.append(n)
    dE = step

    while counter < max_cycles:
        poly_order = min(len(n_pts) - 1, order)
        Es, ns = zip(*sorted(zip(E_pts, n_pts)))
        pchip = PchipInterpolator(Es, ns)
        n_smooth = pchip(E_pts)
        p0 = np.polyfit(E_pts, n_pts, poly_order)

        def residuals(coeffs):
            return np.polyval(coeffs, E_pts) - n_smooth

        result = least_squares(residuals, p0, loss="huber",
                               f_scale=ADAPTIVE_INTEGRATION_TOL)
        roots = np.roots(result.x)
        E_next = roots[np.argmin(np.abs(roots - E_pts[-1]))].real

        if n_pts[-1] > 0 and E_next > E_pts[-1]:
            E_next = E_pts[-1] - abs(dE) * 10
            E_pts.pop()
            n_pts.pop()
            counter -= 1
        elif n_pts[-1] < 0 and E_next < E_pts[-1]:
            E_next = E_pts[-1] + abs(dE) * 10
            E_pts.pop()
            n_pts.pop()
            counter -= 1

        E = E_next
        g.setF(g.F, E, E)
        P = p_mu(E)
        n = _ne_of(P, g.S) - ne
        if n > 0:
            u_bound = min(u_bound, E) if u_bound is not None else E
        elif n < 0:
            l_bound = max(l_bound, E) if l_bound is not None else E
        E_pts.append(E)
        n_pts.append(n)
        dE = E - E_pts[-2]
        if abs(n) < conv:
            break
        counter += 1
    if counter >= max_cycles:
        print(f"Warning: Max cycles reached, convergence = {abs(n):.2E}")
    return E, dE, P, abs(n), u_bound, l_bound


# ---------------------------------------------------------------------------
# Contact-level Fermi drivers
# ---------------------------------------------------------------------------

def get_fermi_contact(g, ne, tol=FERMI_CALCULATION_TOL, Eminf=ENERGY_MIN,
                      max_cycles=MAX_CYCLES, T=TEMPERATURE, n_orbs=0,
                      exec_cfg=_DEFAULT_EXEC, mesh=None, verbose=True):
    """Fermi energy of an isolated contact system (getFermiContact,
    density.py:967-1003): seed from the generalized eigenvalue gap, tune
    the grids with integral_fit, then bracketed bisection."""
    S = np.asarray(g.S)
    F = np.asarray(g.F)
    orbs = np.sort(np.real(scipy.linalg.eigvals(np.linalg.solve(S, F))))
    fermi = (orbs[int(ne) - 1] + orbs[int(ne)]) / 2
    Emin, N1, N2 = integral_fit(F, S, g, fermi, Eminf, tol, T,
                                max_n=max_cycles, exec_cfg=exec_cfg,
                                mesh=mesh, verbose=verbose)
    Emax = float(np.max(orbs))
    return calc_fermi(g, ne, Emin, Emax, fermi, N1, N2, Eminf, T, tol,
                      max_cycles, n_orbs, exec_cfg, mesh, verbose)[0]


def get_fermi_1d_contact(g_sys, ne, ind=0, tol=FERMI_CALCULATION_TOL,
                         Eminf=ENERGY_MIN, T=TEMPERATURE,
                         max_cycles=MAX_CYCLES, exec_cfg=_DEFAULT_EXEC,
                         mesh=None, verbose=True):
    """Fermi energy of a 1D chain contact via the 2-cell periodic block
    trick (getFermi1DContact, density.py:1005-1053)."""
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy

    F = np.asarray(g_sys.a_list[ind])
    S = np.asarray(g_sys.aS_list[ind])
    tau = np.asarray(g_sys.b_list[ind])
    stau = np.asarray(g_sys.bS_list[ind])
    inds = np.arange(len(F))
    g = Chain1DSelfEnergy(F, S, [inds], taus=[tau], staus=[stau], eta=1e-6)

    F2 = np.block([[F, tau], [tau.conj().T, F]])
    S2 = np.block([[S, stau], [stau.T, S]])
    g2 = Chain1DSelfEnergy(F2, S2, [inds], taus=[tau], staus=[stau], eta=1e-6)
    orbs = np.sort(np.real(
        scipy.linalg.eigvals(np.linalg.solve(S2, F2))))
    fermi = (orbs[2 * int(ne) - 1] + orbs[2 * int(ne)]) / 2
    Emin, N1, N2 = integral_fit(F2, S2, g2, fermi, Eminf, tol, T,
                                max_n=max_cycles, exec_cfg=exec_cfg,
                                mesh=mesh, verbose=verbose)
    Emax = float(np.max(orbs))
    return calc_fermi(g, ne, Emin, Emax, fermi, N1, N2, Eminf, T, tol,
                      max_cycles, 0, exec_cfg, mesh, verbose)
