"""Spin-unrestricted SCF + spin-resolved transport (BASELINE config 4)."""

import numpy as np
import pytest

from gaunegf_tpu import transport as tr
from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.scf import NEGF
from gaunegf_tpu.scfe import NEGFE


def _u_backend(n=8, U=1.5, ne=None):
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    return TightBindingFock(H0, n_electrons=(n if ne is None else ne),
                            U=U, n0=0.5 * np.ones(n), spin="u",
                            exchange=0.5, multiplicity=1)


def test_unrestricted_scf_polarizes(tmp_path):
    be = _u_backend()
    negf = NEGF(be, spin="u", name=str(tmp_path / "u"), verbose=False)
    negf.setSigma([1], [8], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-6, damping=0.1, max_cycles=300)
    assert negf.conv_level < 1e-6
    n = 8
    occ_up = np.real(np.diag(negf.P))[:n]
    occ_dn = np.real(np.diag(negf.P))[n:]
    # exchange seed + Hubbard U polarize the chain
    assert abs(occ_up.sum() - occ_dn.sum()) > 0.2


def test_unrestricted_locs_and_sigma_expansion(tmp_path):
    """N-length sigma vectors expand over both spin blocks (scf.py:478-484
    rules); contact orbital resolution uses +/- atom encoding."""
    be = _u_backend()
    negf = NEGF(be, spin="u", name=str(tmp_path / "ul"), verbose=False)
    l_ind, r_ind = negf.setSigma([1, 2], [7, 8],
                                 sig=-0.1j * np.ones(2))
    # both spin blocks covered: orbitals {0,1,8,9} and {6,7,14,15}
    assert set(l_ind) == {0, 1, 8, 9}
    assert set(r_ind) == {6, 7, 14, 15}
    assert negf.sigma1[0, 0] == -0.1j and negf.sigma1[9, 9] == -0.1j


def test_spin_resolved_transport_after_scf(tmp_path):
    be = _u_backend()
    negf = NEGF(be, spin="u", name=str(tmp_path / "ut"), verbose=False)
    negf.setSigma([1], [8], sig=-0.2j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-5, damping=0.1, max_cycles=300)
    E = np.linspace(-2, 2, 21)
    Ttot, Tspin = tr.calculate_transmission(
        negf.F, negf.S, tr.SigmaSource(negf.sigma1, negf.sigma2), E,
        spin="u")
    assert Tspin.shape == (21, 4)
    # polarized junction: up-up and down-down channels differ
    assert np.max(np.abs(Tspin[:, 0] - Tspin[:, 3])) > 1e-3
    # block-diagonal system: spin-flip channels vanish
    assert np.max(np.abs(Tspin[:, 1])) < 1e-10
    assert np.max(np.abs(Tspin[:, 2])) < 1e-10
    assert np.allclose(Ttot, Tspin.sum(axis=1))


def test_unrestricted_negfe_contour(tmp_path):
    """Energy-dependent driver in the 'u' layout with constant sigma."""
    be = _u_backend(U=0.5)
    negfe = NEGFE(be, spin="u", name=str(tmp_path / "ue"), verbose=False)
    negfe.setSigma([1], [8], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=64, N2=32)
    negfe.setVoltage(0.0, fermi=0.0)
    negfe.SCF(conv=1e-4, damping=0.1, max_cycles=200)
    assert negfe.conv_level < 1e-4


def test_asymmetric_contact_matrix_sigma_expansion(tmp_path):
    """Half-length MATRIX sigmas validate against their own contact's
    index count (the left check previously used r_ind -- a copy-paste
    that rejected valid asymmetric-contact input)."""
    be = _u_backend()
    negf = NEGF(be, spin="u", name=str(tmp_path / "am"), verbose=False)
    # 1 left atom (2 spin orbitals), 2 right atoms (4 spin orbitals):
    # spatial-sized matrices (1x1 left, 2x2 right) must spin-expand
    sig_l = -0.1j * np.eye(1)
    sig_r = -0.1j * np.eye(2)
    negf.setSigma([1], [7, 8], sig=sig_l, sig2=sig_r)
    assert negf.sigma1.shape == negf.sigma2.shape == (16, 16)
    # wrong-size left matrix (matches half of r_ind, not l_ind) rejected
    import pytest as _pt
    with _pt.raises(ValueError, match="dimension mismatch"):
        negf.setSigma([1], [7, 8], sig=-0.1j * np.eye(2),
                      sig2=-0.1j * np.eye(2))
