"""Harrison-rule electrode parameter generator (VERDICT round-1 item 9).

The shipped Au/Cu/Ag .bethe sets are generated -- not copied from the
reference's fitted files -- so these tests pin (a) the generator's scaling
laws, (b) the physical sanity of the bundled gold electrode (filled d-band
~2 eV below the self-consistent contact Fermi level), and (c) the full
ORTHOGONAL branch end-to-end: zero overlaps trigger the ANT-style
de-orthogonalization (models/bethe.py Xi @ sigma @ Xi; surfGBethe.py
:530-533 parity).
"""

import numpy as np
import pytest

from gaunegf_tpu.models import bethe as bt
from gaunegf_tpu.models import harrison as hr
from gaunegf_tpu.models import slater_koster as sk


def test_hopping_scaling_laws():
    h1 = hr.harrison_hoppings(2.5, 0.9)
    h2 = hr.harrison_hoppings(5.0, 0.9)
    assert h2["sss"] / h1["sss"] == pytest.approx(2 ** -2)
    assert h2["pds"] / h1["pds"] == pytest.approx(2 ** -3.5)
    assert h2["dds"] / h1["dds"] == pytest.approx(2 ** -5)
    h3 = hr.harrison_hoppings(2.5, 0.45)
    assert h3["sss"] == h1["sss"]                       # no r_d in sp block
    assert h3["sds"] / h1["sds"] == pytest.approx(2 ** -1.5)
    assert h3["ddp"] / h1["ddp"] == pytest.approx(2 ** -3)


def test_eta_signs_and_dimensions():
    h = hr.harrison_hoppings(2.88, 0.95)
    assert h["sss"] < 0 and h["pps"] > 0 and h["ppp"] < 0
    assert h["dds"] < 0 and h["ddp"] > 0 and h["ddd"] == 0.0
    assert len(h) == 10


def test_generated_files_parse_and_validate():
    for el in ("Au", "Cu", "Ag"):
        p = sk.parse_bethe_file(el)        # resolves in gaunegf_tpu/data
        assert p.ne == 11
        assert p.orthogonal                # Harrison theory: zero overlaps
        sk.validate_slater_koster(p, atol=1e-8)
        gen = hr.bethe_params(el)
        for k in p.hopping:
            assert p.hopping[k] == pytest.approx(gen.hopping[k], abs=1e-6)


def test_missing_inputs_raise():
    with pytest.raises(ValueError, match="missing inputs"):
        hr.harrison_bethe_dict(a=4.0, r_d=0.9)


def _au_atom_gf():
    p = hr.bethe_params("Au")
    nvecs = sk.fcc111_neighbor_directions(np.array([0, 0, 1.0]),
                                          np.array([1.0, 0, 0]))
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in nvecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in nvecs])
    return p, bt.BetheAtomGF(p.h0(), Slist, Vlist, eta=1e-5, T=0.0)


def test_au_electrode_band_structure_sanity():
    """Filled d-band whose top sits ~2 eV below the contact Fermi level."""
    p, g = _au_atom_gf()
    Es = np.linspace(-20, 4, 121)
    dos = np.array([g.DOS(float(E)) for E in Es])
    # fixed-point noise leaves ~1e-6 negatives where the true DOS is 0
    assert np.all(dos > -1e-5)
    i_peak = np.argmax(dos)
    band = Es[dos > 0.5 * dos[i_peak]]
    ef = g.calc_fermi(p.ne / 2, verbose=False)
    d_top = band.max()
    assert 1.0 < ef - d_top < 3.5, (ef, d_top)          # Au photoemission ~2
    assert 1.5 < band.max() - band.min() < 6.0          # d-band width
    assert dos[np.argmin(np.abs(Es - ef))] > 1e-3       # metallic at Ef


def _fcc_slab_geometry(d, n_dev_orb=4):
    u1 = np.array([1.0, 0.0, 0.0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0.0]) * d
    z_down = np.array([0.5, 0.5 / np.sqrt(3), -np.sqrt(2.0 / 3.0)]) * d
    top = [np.zeros(3), u1, u2]
    second = [z_down + m * u1 + n * u2
              for m in (-1, 0, 1) for n in (-1, 0, 1)]
    device = [np.array([1.0, 0.6, -4.5 * d])]
    coords = np.stack(top + second + device)
    n_metal = len(top) + len(second)
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        n_orb = 9 if atom <= n_metal else n_dev_orb
        orb_atoms += [atom] * n_orb
    return bt.BetheGeometry(coords + 7.0, np.asarray(orb_atoms), None)


def test_orthogonal_branch_end_to_end():
    """Generated (orthogonal) Au set through the full BetheSelfEnergy:
    the de-orthogonalization Xi @ sigma @ Xi must be active and produce a
    passive self-energy on a non-identity device overlap."""
    d_nn = hr.ELEMENTS["Au"]["a"] / np.sqrt(2.0)
    geom = _fcc_slab_geometry(d_nn)
    n_orb = 12 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb) + 0.05 * (np.eye(n_orb, k=1) + np.eye(n_orb, k=-1))
    prov = bt.BetheSelfEnergy(F, S, [[1, 2, 3]], geom, lat_file="Au",
                              fermi=-9.7, verbose=False)
    assert prov.orthogonal
    sig = prov.sigmaTot(-9.0)
    assert np.isfinite(sig).all()
    gamma = 1j * (sig - sig.conj().T)
    evals = np.linalg.eigvalsh(gamma)
    assert evals.min() > -1e-8, "self-energy must be passive (Gamma >= 0)"
    assert np.abs(sig).max() > 1e-3, "contact must actually couple"
    # the de-orthogonalization spreads weight off the contact block
    contact_orbs = np.arange(27)
    off = np.delete(np.arange(n_orb), contact_orbs)
    assert np.abs(sig[np.ix_(off, off)]).max() > 1e-8
