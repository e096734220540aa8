"""Non-collinear ('g' spinor) SCF and transport."""

import numpy as np
import pytest

from gaunegf_tpu import transport as tr
from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.scf import NEGF


def _g_backend(n=6, U=0.8, bx=0.6):
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    return TightBindingFock(H0, n_electrons=n, U=U, n0=0.5 * np.ones(n),
                            spin="g", exchange=bx)


def test_g_layout_shapes():
    be = _g_backend()
    F0 = be.initial_fock()
    assert F0.shape == (12, 12)
    # spinor interleaving: orbital hopping connects strides of 2
    assert F0[0, 2] == -1.0 and F0[1, 3] == -1.0
    # transverse field couples the two spins of one orbital
    assert F0[0, 1] == pytest.approx(-0.3)
    # locs alternate +/- atom numbers (matTools.py:163 convention)
    assert list(be.locs[:4]) == [1, -1, 2, -2]


def test_g_scf_noncollinear(tmp_path):
    be = _g_backend()
    negf = NEGF(be, spin="g", name=str(tmp_path / "g"), verbose=False)
    negf.setSigma([1], [6], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-6, damping=0.1, max_cycles=300)
    assert negf.conv_level < 1e-6
    # transverse magnetization: off-diagonal spinor blocks are populated
    P = negf.P
    mx = np.real(P[0::2, 1::2].diagonal())
    assert np.max(np.abs(mx)) > 1e-3


def test_g_transmission_after_scf(tmp_path):
    be = _g_backend()
    negf = NEGF(be, spin="g", name=str(tmp_path / "gt"), verbose=False)
    negf.setSigma([1], [6], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-5, damping=0.1, max_cycles=300)
    E = np.linspace(-2, 2, 11)
    Ttot, Tspin = tr.calculate_transmission(
        negf.F, negf.S, tr.SigmaSource(negf.sigma1, negf.sigma2), E,
        spin="g")
    assert Tspin.shape == (11, 4)
    assert np.allclose(Ttot, Tspin.sum(axis=1))
    # transverse field opens spin-flip channels
    assert np.max(Tspin[:, 1] + Tspin[:, 2]) > 1e-4
