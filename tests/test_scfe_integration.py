"""NEGFE integration: chain contacts, Fermi-update strategies in-loop,
integralCheck autotuning (SiNEGF-style workflows, Gaussian-free)."""

import numpy as np
import pytest

from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.scfe import NEGFE


def _driver(tmp_path, U=0.3, name="x"):
    n = 12
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    be = TightBindingFock(H0, n_electrons=n, U=U, n0=0.5 * np.ones(n))
    return NEGFE(be, name=str(tmp_path / name), verbose=False)


def test_chain_contact_scf(tmp_path):
    negfe = _driver(tmp_path)
    negfe.setContact1D([[1, 2], [11, 12]], tau_list=[[3, 4], [9, 10]],
                       eta=1e-4)
    negfe.setIntegralLimits(N1=64, N2=32)
    negfe.setVoltage(0.0, fermi=0.0)
    negfe.SCF(conv=1e-3, damping=0.02, max_cycles=60)
    assert negfe.conv_level < 1e-3
    assert abs(negfe.nelec - 12) < 1.5     # open system, approximate filling


@pytest.mark.parametrize("method", ["secant", "muller", "bisect", "poly",
                                    "predict"])
def test_fermi_update_methods_in_scf(tmp_path, method):
    """Each Fermi-update strategy drives the electron count to target."""
    negfe = _driver(tmp_path, U=0.2, name=f"m_{method}")
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=64, N2=32)
    negfe.setVoltage(0.0, fermi_method=method)     # fermi=nan -> update
    negfe.SCF(conv=5e-3, damping=0.05, max_cycles=60)
    assert abs(negfe.nelec - 12) < 0.1, (method, negfe.nelec)


def test_integral_check(tmp_path):
    negfe = _driver(tmp_path, name="ic")
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setVoltage(0.0, fermi=0.0)
    negfe.integralCheck(cycles=2, damp=0.05)
    assert negfe.N1 is not None and negfe.N2 is not None
    assert negfe.N1 >= 8 and negfe.N2 >= 8
    # tuned grids reproduce the density to the tolerance
    from gaunegf_tpu import density as dens
    P1 = dens.density_complex_n(negfe.F_eV, negfe.S, negfe.g, negfe.Emin,
                                negfe.fermi, negfe.N1, T=0)
    P2 = dens.density_complex_n(negfe.F_eV, negfe.S, negfe.g, negfe.Emin,
                                negfe.fermi, 2 * negfe.N1, T=0)
    assert np.max(np.abs(np.diag(P1 - P2))) < 5e-3


def test_finite_bias_scf(tmp_path):
    negfe = _driver(tmp_path, U=0.2, name="bias")
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=64, N2=32, Nnegf=64)
    negfe.setVoltage(0.3, fermi=0.0)
    negfe.SCF(conv=1e-3, damping=0.05, max_cycles=60)
    assert negfe.conv_level < 1e-3
    # left/right occupation asymmetry under bias
    occ = np.real(np.diag(negfe.P))
    assert not np.allclose(occ, occ[::-1], atol=1e-4)


def test_finite_temperature_scf(tmp_path):
    negfe = _driver(tmp_path, U=0.2, name="temp")
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=300.0)
    negfe.setIntegralLimits(N1=128, N2=32)
    negfe.setVoltage(0.0, fermi=0.0)
    negfe.SCF(conv=1e-3, damping=0.05, max_cycles=60)
    assert negfe.conv_level < 1e-3
