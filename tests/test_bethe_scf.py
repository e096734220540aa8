"""Full Bethe-electrode SCF workflow (BASELINE config 2): TB molecule
between FCC [111] Bethe contacts, equilibrium density via complex contour."""

import os

import numpy as np
import pytest

from gaunegf_tpu.models import bethe as bt
from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.scfe import NEGFE


def _lat_file():
    import gaunegf_tpu
    return os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                        "demo.bethe")


def _junction():
    """3-atom contact patch || 2-site molecule || 3-atom contact patch."""
    d = 2.88
    u1 = np.array([1.0, 0.0, 0.0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0.0]) * d
    left = [np.zeros(3), u1, u2]
    mol = [np.array([0.8, 0.5, -2.2]), np.array([0.8, 0.5, -4.0])]
    right = [c + np.array([0, 0, -6.2]) for c in left]
    coords = np.stack(left + mol + right)

    orb_atoms = []
    for atom in range(1, 9):
        n_orb = 9 if atom in (1, 2, 3, 6, 7, 8) else 1
        orb_atoms += [atom] * n_orb
    n_orb_tot = len(orb_atoms)            # 6*9 + 2 = 56

    # sparse TB Hamiltonian: molecule levels + weak coupling to the contact
    # s-orbitals of the nearest surface atoms
    H = np.zeros((n_orb_tot, n_orb_tot))
    i_mol = [27, 28]
    # molecular levels inside the lattice s-band (demo.bethe: es ~ -7.9 eV)
    H[i_mol[0], i_mol[0]] = -8.0
    H[i_mol[1], i_mol[1]] = -7.0
    H[i_mol[0], i_mol[1]] = H[i_mol[1], i_mol[0]] = -0.8
    for a in (0, 9, 18):                  # left-contact s orbitals
        H[a, i_mol[0]] = H[i_mol[0], a] = -0.4
    for a in (29, 38, 47):                # right-contact s orbitals
        H[a, i_mol[1]] = H[i_mol[1], a] = -0.4

    geom = bt.BetheGeometry(coords, np.asarray(orb_atoms), None)
    # Hubbard U only on the molecular orbitals; the metallic contact
    # orbitals are mean-field-inert (their charge lives in the leads)
    U_vec = np.zeros(n_orb_tot)
    U_vec[i_mol] = 0.5
    backend = TightBindingFock(
        H, n_electrons=2.0, U=U_vec, n0=np.zeros(n_orb_tot),
        coords=coords, locs=np.asarray(orb_atoms))
    return backend, geom


def test_bethe_contact_scf(tmp_path):
    backend, geom = _junction()
    negfe = NEGFE(backend, name=str(tmp_path / "bethe"), verbose=False)
    negfe.setContactBethe([[1, 2, 3], [6, 7, 8]], lat_file=_lat_file(),
                          eta=1e-5, T=0.0, geometry=geom, fermi=0.0)
    negfe.setIntegralLimits(N1=48, N2=24)
    negfe.setVoltage(0.0, fermi=0.0)
    negfe.SCF(conv=5e-3, damping=0.05, max_cycles=40)
    assert negfe.conv_level < 5e-3
    assert np.isfinite(negfe.P).all()
    # both molecular orbitals carry charge; the deep level holds most of it
    occ = np.real(np.diag(negfe.P))
    assert occ[27] > occ[28] > 0


def test_bethe_transmission(tmp_path):
    from gaunegf_tpu import transport as tr
    backend, geom = _junction()
    negfe = NEGFE(backend, name=str(tmp_path / "bt"), verbose=False)
    negfe.setContactBethe([[1, 2, 3], [6, 7, 8]], lat_file=_lat_file(),
                          eta=1e-5, T=0.0, geometry=geom, fermi=0.0)
    E = np.linspace(-10, -6, 9)   # probe inside the lattice s-band
    T = tr.calculate_transmission(negfe.F_eV, negfe.S,
                                  tr.SigmaSource(negfe.g), E)
    assert T.shape == (9,)
    assert np.all(T >= -1e-8)
    assert T.max() > 1e-6          # molecule conducts through the band
