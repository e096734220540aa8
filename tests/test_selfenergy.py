"""form_sigma semantics + constant-sigma provider construction.

Pins the documented deviation D6 (PARITY.md): a 1-D V goes on the
*diagonal* of the contact block, unlike the reference's row-broadcast
(matTools.py:63-67), and regression-covers NEGFE.setSigma with
half-length spin vectors (ADVICE round 1, scfe.py:86).
"""

import numpy as np

from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy, form_sigma
from gaunegf_tpu.scfe import NEGFE


def test_form_sigma_vector_diagonal():
    inds = np.array([1, 3])
    V = np.array([-0.1j, -0.2j])
    sigma = form_sigma(inds, V, 5)
    assert sigma[1, 1] == -0.1j   # contact entries overwrite the background
    assert sigma[3, 3] == -0.2j
    # off-diagonal contact entries stay at the background (0 for S=I),
    # NOT row-broadcast like the reference's matrix branch
    assert sigma[1, 3] == 0.0
    assert sigma[3, 1] == 0.0


def test_form_sigma_scalar_and_matrix():
    inds = np.array([0, 2])
    s = form_sigma(inds, -0.05j, 4)
    assert s[0, 0] == -0.05j
    assert s[2, 2] == -0.05j
    M = np.array([[-0.1j, 0.01], [0.01, -0.1j]])
    sm = form_sigma(inds, M, 4)
    assert sm[0, 2] == 0.01
    assert sm[0, 0] == -0.1j


def test_form_sigma_overlap_background():
    S = np.eye(3) + 0.1 * (np.eye(3, k=1) + np.eye(3, k=-1))
    s = form_sigma(np.array([0]), -0.3j, 3, S)
    assert abs(s[1, 2] - (-1j * 1e-10)) < 1e-20


def test_negfe_set_sigma_half_length_vector_spin_u(tmp_path):
    """Half-length vector sigmas must be spin-expanded before the provider
    is built (a supported reference input pattern, scf.py:478-484)."""
    n = 8
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    be = TightBindingFock(H0, n_electrons=n, U=0.5, n0=0.5 * np.ones(n),
                          spin="u", exchange=0.5, multiplicity=1)
    negfe = NEGFE(be, spin="u", name=str(tmp_path / "hs"), verbose=False)
    # 2 contact atoms -> 4 spin orbitals per contact; pass a len-2 vector
    l_ind, r_ind = negfe.setSigma([1, 2], [7, 8],
                                  sig=-0.1j * np.ones(2), T=0)
    assert len(l_ind) == 4 and len(r_ind) == 4
    # the provider holds the expanded sigma: total has 8 broadened orbitals
    sig_tot = negfe.g.sigmaTot(0.0)
    diag = np.imag(np.diag(sig_tot))
    assert np.sum(diag < -0.05) == 8


def test_constant_provider_matches_form_sigma():
    n = 6
    H = np.diag(np.arange(n, dtype=float))
    S = np.eye(n)
    inds = [np.array([0, 1]), np.array([4, 5])]
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j * np.ones(2))
    expected = (form_sigma(inds[0], -0.1j * np.ones(2), n, S)
                + form_sigma(inds[1], -0.1j * np.ones(2), n, S))
    np.testing.assert_allclose(g.sigmaTot(0.0), expected, atol=1e-12)
