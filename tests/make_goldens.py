"""Generate golden regression data from the reference implementation.

Run manually (not part of the test suite):

    python tests/make_goldens.py

Imports the reference package read-only from /root/reference to record
numerical ground truth into tests/golden/*.npz.  The test suite never
imports the reference; it only loads these committed goldens.
"""

import os
import sys

sys.path.insert(0, "/root/reference")

import types

# Stub the proprietary Gaussian interface so reference modules import.
gauopen = types.ModuleType("gauopen")
gauopen.QCBinAr = types.ModuleType("gauopen.QCBinAr")
gauopen.QCOpMat = types.ModuleType("gauopen.QCOpMat")
sys.modules["gauopen"] = gauopen
sys.modules["gauopen.QCBinAr"] = gauopen.QCBinAr
sys.modules["gauopen.QCOpMat"] = gauopen.QCOpMat

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "golden")
os.makedirs(OUT, exist_ok=True)

rng = np.random.default_rng(7)


def tb_chain(n, t=-1.0, eps=0.0, s_off=0.1):
    """Tridiagonal tight-binding chain with small overlap."""
    H = eps * np.eye(n) + t * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n) + s_off * (np.eye(n, k=1) + np.eye(n, k=-1))
    return H, S


def main():
    data = {}

    # ------------------------------------------------------------------
    # 1) surfG1D: two-cell chain, auto-extraction pattern (a)
    # ------------------------------------------------------------------
    from gauNEGF.surfG1D import surfG

    n_cell = 4
    H, S = tb_chain(2 * n_cell, t=-1.2, eps=0.3, s_off=0.05)
    inds1 = np.arange(n_cell)
    inds2 = np.arange(n_cell, 2 * n_cell)
    g = surfG(H, S, [inds1, inds2], eta=1e-4)
    Es = np.array([-2.0, -0.5, 0.0, 0.7, 2.5])
    data["chain_H"] = H
    data["chain_S"] = S
    data["chain_Es"] = Es
    data["chain_sigma_tot"] = np.stack(
        [np.asarray(g.sigmaTot(E)) for E in Es])
    data["chain_sigma_0"] = np.stack(
        [np.asarray(g.sigma(E, 0)) for E in Es])
    zs = np.array([-1.0 + 0.5j, 0.3 + 1.2j])
    data["chain_zs"] = zs
    data["chain_sigma_tot_z"] = np.stack(
        [np.asarray(g.sigmaTot(z)) for z in zs])

    # ------------------------------------------------------------------
    # 2) GrInt / GrLessInt with a mock energy-dependent sigma
    # ------------------------------------------------------------------
    from gauNEGF.integrate import GrInt, GrLessInt

    n = 20
    Hm = rng.standard_normal((n, n))
    Hm = (Hm + Hm.T) / 2
    Sm = np.eye(n)
    base = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    base = 0.05 * (base + base.conj().T) / 2

    class MockSig:
        def sigmaTot(self, E):
            return (base * (1 + 0.1 * E) - 1j * 0.05 * np.eye(n)).astype(complex)

        def sigma(self, E, i):
            half = self.sigmaTot(E) / 2
            return half

        def setF(self, F, mu1, mu2):
            pass

    mock = MockSig()
    Elist = np.linspace(-2, 2, 12)
    w = rng.random(12)
    data["gint_H"] = Hm
    data["gint_E"] = Elist
    data["gint_w"] = w
    data["gint_base"] = base
    data["gint_gr"] = np.asarray(GrInt(Hm, Sm, mock, Elist, w))
    data["gint_gless"] = np.asarray(GrLessInt(Hm, Sm, mock, Elist, w, ind=0))

    # ------------------------------------------------------------------
    # 3) density routes with a constant-sigma provider, T = 0
    # ------------------------------------------------------------------
    from gauNEGF.surfGTester import surfGTest
    from gauNEGF.density import (
        densityComplexN, densityRealN, densityGridN, density, bisectFermi,
        getANTPoints, integralFit)

    n = 16
    Hd, Sd = tb_chain(n, t=-1.0, eps=0.0, s_off=0.0)
    c_inds = [np.arange(4), np.arange(12, 16)]
    gt = surfGTest(Hd, Sd, c_inds, sig1=-0.1j)
    data["dens_H"] = Hd
    data["dens_sig_tot"] = np.asarray(gt.sigmaTot(0.0))
    data["dens_complexN"] = np.asarray(
        densityComplexN(Hd, Sd, gt, -4.0, 0.5, 64, T=0, showText=False))
    data["dens_realN"] = np.asarray(
        densityRealN(Hd, Sd, gt, -6.0, 0.5, 128, T=0, showText=False))
    data["dens_gridN"] = np.asarray(
        densityGridN(Hd, Sd, gt, -0.4, 0.4, ind=1, N=64, T=0, showText=False))
    data["ant_x_16"], data["ant_w_16"] = getANTPoints(16)

    # analytic density route
    from gauNEGF.utils import fractional_matrix_power
    X = np.asarray(fractional_matrix_power(Sd, -0.5))
    sig12 = np.asarray(gt.sigmaTot(0.0))
    Fbar = X @ (Hd + sig12) @ X
    D, V = np.linalg.eig(Fbar)
    Vc = np.linalg.inv(V.conj().T)
    Gam = 1j * (sig12 - sig12.conj().T)
    GamBar = X @ Gam @ X
    data["analytic_D"] = D
    data["analytic_V"] = V
    data["analytic_P"] = np.asarray(
        density(V, Vc, D, GamBar, -1e6, 0.3))
    data["analytic_fermi"] = bisectFermi(V, Vc, D, GamBar, 8.0, 1e-10)

    # ------------------------------------------------------------------
    # 4) transport: transmission / DOS / current, restricted + spin
    # ------------------------------------------------------------------
    from gauNEGF.transport import (
        SigmaCalculator, calculate_transmission, calculate_dos,
        calculate_current, cohTrans)

    sig_vec = -0.15j * np.ones(4)
    sig1 = np.zeros((n, n), dtype=complex)
    sig1[np.ix_(c_inds[0], c_inds[0])] = np.diag(sig_vec)
    sig2 = np.zeros((n, n), dtype=complex)
    sig2[np.ix_(c_inds[1], c_inds[1])] = np.diag(sig_vec)
    calc = SigmaCalculator(sig1, sig2)
    Et = np.linspace(-3, 3, 25)
    data["trans_E"] = Et
    data["trans_sig1"] = sig1
    data["trans_sig2"] = sig2
    data["trans_T"] = np.asarray(
        calculate_transmission(Hd, Sd, calc, Et, spin="r"))
    dos_tot, dos_site = calculate_dos(Hd, Sd, calc, Et, spin="r")
    data["trans_dos_tot"] = dos_tot
    data["trans_dos_site"] = dos_site
    data["trans_I"] = calculate_current(Hd, Sd, calc, fermi=0.0, qV=0.5,
                                        T=0, spin="r", dE=0.01)
    data["trans_I_300K"] = calculate_current(Hd, Sd, calc, fermi=0.0, qV=0.5,
                                             T=300.0, spin="r", dE=0.01)

    # spin-unrestricted block case
    H2 = np.block([[Hd, np.zeros_like(Hd)], [np.zeros_like(Hd), Hd + 0.2 * np.eye(n)]])
    S2 = np.eye(2 * n)
    sig1u = np.kron(np.eye(2), sig1)
    sig2u = np.kron(np.eye(2), sig2)
    calc_u = SigmaCalculator(sig1u, sig2u)
    Tu, Tspin = calculate_transmission(H2, S2, calc_u, Et, spin="u")
    data["trans_Tu"] = Tu
    data["trans_Tspin"] = Tspin

    # energy-dependent transmission via surfG1D (SiNEGF-style workflow)
    Ts_E = np.linspace(-3, 3, 15)
    calc_e = SigmaCalculator(g)
    data["transE_E"] = Ts_E
    data["transE_T"] = np.asarray(
        calculate_transmission(H, S, calc_e, Ts_E, spin="r"))

    # ------------------------------------------------------------------
    # 5) integralFit autotuning on the constant-sigma system
    # ------------------------------------------------------------------
    emin_fit, n1_fit, n2_fit = integralFit(Hd, Sd, gt, 0.0, -1e6, 1e-4, T=0)
    data["fit_emin"] = emin_fit
    data["fit_n1"] = n1_fit
    data["fit_n2"] = n2_fit

    np.savez_compressed(os.path.join(OUT, "golden_v1.npz"), **data)
    print(f"Wrote {os.path.join(OUT, 'golden_v1.npz')} "
          f"with {len(data)} arrays")


if __name__ == "__main__":
    main()
