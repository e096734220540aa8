"""Gaussian bridge coverage without Gaussian: io/gaussian.py + GaussianFock
exercised against the fake gauopen package (tests/fake_gauopen.py).

Semantics under test mirror the reference's matTools.py:39-269: the
lower-triangular OpMat packing, the +/- atom-index spin encoding of locs,
the /2 restricted density write-back, complex typed='c' for 'g', and the
GaussianFock init / fock / write_chk round trip (models/fock.py:224-318,
reference scf.py:233-244, 664-687).
"""

import numpy as np
import pytest

import fake_gauopen
from fake_gauopen import ALPHA_SCF_DEN, BETA_SCF_DEN, BinAr, OpMat


@pytest.fixture(autouse=True)
def _gauopen():
    """Install the fake gauopen for every test in this module."""
    fake_gauopen.install()
    yield
    fake_gauopen.uninstall()


def _sys(n=6, seed=0):
    rng = np.random.default_rng(seed)
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(rng.uniform(-0.3, 0.3, n))
    S = np.eye(n) + 0.05 * (np.eye(n, k=1) + np.eye(n, k=-1))
    ibfatm = np.repeat(np.arange(1, n // 2 + 1), 2)   # 2 orbitals/atom
    coords = rng.standard_normal((n // 2, 3))
    fake_gauopen.configure(H0, S, ibfatm=ibfatm, ne=n, U=0.4,
                           coords=coords)
    return H0, S, ibfatm, coords


# ---------------------------------------------------------------------------
# OpMat packing (the layout every bridge call crosses)
# ---------------------------------------------------------------------------

def test_opmat_symmetric_roundtrip():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((7, 7))
    A = (A + A.T) / 2
    o = OpMat("X", A.copy())
    o.compress()
    assert o.array.ndim == 1 and o.array.size == 7 * 8 // 2
    np.testing.assert_allclose(o.expand(), A, atol=1e-14)


def test_opmat_hermitian_complex_roundtrip():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((5, 5)) + 1j * rng.standard_normal((5, 5))
    A = (A + A.conj().T) / 2
    o = OpMat("X", A.copy(), typed="c")
    o.compress()
    assert o.array.ndim == 1
    np.testing.assert_allclose(o.expand(), A, atol=1e-14)


def test_opmat_vector_passthrough():
    w = np.array([3.0, -1.0, 2.0])
    o = OpMat("E", w)
    np.testing.assert_array_equal(o.expand(), w)


# ---------------------------------------------------------------------------
# io/gaussian.py (matTools parity)
# ---------------------------------------------------------------------------

def test_get_fock_locs_all_spins():
    from gaunegf_tpu.io.gaussian import get_fock

    _, _, ibfatm, _ = _sys()
    bar = BinAr()
    bar.update(model="rhf", dofock=True)
    F, locs = get_fock(bar, "r")
    np.testing.assert_array_equal(locs, ibfatm)
    assert F.shape == (6, 6)

    bar.update(model="uhf", dofock=True)
    F, locs = get_fock(bar, "u")
    # matTools.py:158: [ibfatm, -ibfatm] concatenation
    np.testing.assert_array_equal(locs,
                                  np.concatenate([ibfatm, -ibfatm]))
    assert F.shape == (12, 12)
    # block-diagonal with distinct alpha/beta channels
    np.testing.assert_array_equal(F[:6, 6:], np.zeros((6, 6)))
    assert np.max(np.abs(F[:6, :6] - F[6:, 6:])) > 0

    bar.update(model="ghf", dofock=True)
    F, locs = get_fock(bar, "g")
    # matTools.py:163: interleaved [+a0, -a0, +a1, -a1, ...]
    expect = np.array([v for p in zip(ibfatm, -ibfatm) for v in p])
    np.testing.assert_array_equal(locs, expect)
    assert F.shape == (12, 12)

    with pytest.raises(ValueError):
        get_fock(bar, "x")


def test_get_density_blocks():
    from gaunegf_tpu.io.gaussian import get_density

    _sys()
    bar = BinAr()
    bar.update(model="uhf", dofock=True)
    P = get_density(bar, "u")
    Pa = bar.matlist[ALPHA_SCF_DEN].expand()
    Pb = bar.matlist[BETA_SCF_DEN].expand()
    np.testing.assert_allclose(P[:6, :6], Pa)
    np.testing.assert_allclose(P[6:, 6:], Pb)
    np.testing.assert_array_equal(P[:6, 6:], np.zeros((6, 6)))

    bar.update(model="rhf", dofock=True)
    np.testing.assert_allclose(get_density(bar, "r"),
                               bar.matlist[ALPHA_SCF_DEN].expand())


def test_get_energies_spin_conventions():
    from gaunegf_tpu.io.gaussian import get_energies
    from gaunegf_tpu.units import HAR_TO_EV

    _sys()
    bar = BinAr()
    bar.update(model="rhf", dofock=True)
    w = np.sort(bar.matlist["ALPHA ORBITAL ENERGIES"].expand())
    ev = get_energies(bar, "r")
    # restricted: every level duplicated (one per electron), in eV
    assert ev.size == 2 * w.size
    np.testing.assert_allclose(ev[0::2], w * HAR_TO_EV)
    np.testing.assert_allclose(ev[1::2], w * HAR_TO_EV)

    bar.update(model="uhf", dofock=True)
    ev_u = get_energies(bar, "u")
    wa = np.sort(bar.matlist["ALPHA ORBITAL ENERGIES"].expand())
    wb = np.sort(bar.matlist["BETA ORBITAL ENERGIES"].expand())
    np.testing.assert_allclose(
        ev_u, np.sort(np.concatenate([wa, wb])) * HAR_TO_EV)

    bar.update(model="ghf", dofock=True)
    ev_g = get_energies(bar, "g")
    wg = np.sort(bar.matlist["ALPHA ORBITAL ENERGIES"].expand())
    np.testing.assert_allclose(ev_g, wg * HAR_TO_EV)


def test_store_density_restricted_halves():
    from gaunegf_tpu.io.gaussian import get_density, store_density

    _sys()
    bar = BinAr()
    bar.update(model="rhf", dofock=True)
    rng = np.random.default_rng(3)
    P = rng.standard_normal((6, 6))
    P = P + P.T
    store_density(bar, P + 1e-3j * np.eye(6), "r")   # imag part dropped
    # matTools.py:250: restricted write-back is halved and real
    stored = bar.matlist[ALPHA_SCF_DEN].expand()
    np.testing.assert_allclose(stored, P / 2, atol=1e-14)
    np.testing.assert_allclose(get_density(bar, "r"), P / 2, atol=1e-14)


def test_store_density_unrestricted_blocks():
    from gaunegf_tpu.io.gaussian import store_density

    _sys()
    bar = BinAr()
    bar.update(model="uhf", dofock=True)
    rng = np.random.default_rng(4)
    Pa = rng.standard_normal((6, 6))
    Pa = Pa + Pa.T
    Pb = rng.standard_normal((6, 6))
    Pb = Pb + Pb.T
    Z = np.zeros((6, 6))
    store_density(bar, np.block([[Pa, Z], [Z, Pb]]), "u")
    np.testing.assert_allclose(bar.matlist[ALPHA_SCF_DEN].expand(), Pa,
                               atol=1e-14)
    np.testing.assert_allclose(bar.matlist[BETA_SCF_DEN].expand(), Pb,
                               atol=1e-14)


def test_store_density_generalized_complex():
    from gaunegf_tpu.io.gaussian import store_density

    _sys()
    bar = BinAr()
    bar.update(model="ghf", dofock=True)
    rng = np.random.default_rng(5)
    P = rng.standard_normal((12, 12)) + 1j * rng.standard_normal((12, 12))
    P = (P + P.conj().T) / 2
    store_density(bar, P, "g")
    obj = bar.matlist[ALPHA_SCF_DEN]
    assert obj.typed == "c"
    np.testing.assert_allclose(obj.expand(), P, atol=1e-14)


# ---------------------------------------------------------------------------
# GaussianFock adapter
# ---------------------------------------------------------------------------

def test_gaussian_fock_init_and_roundtrip(tmp_path):
    from gaunegf_tpu.models.fock import GaussianFock
    from gaunegf_tpu.units import HAR_TO_EV

    H0, S, ibfatm, coords = _sys()
    gf = GaussianFock(str(tmp_path / "junc"), func="hf", spin="r")
    assert gf.f_to_eV == HAR_TO_EV
    assert gf.n_electrons == 6
    np.testing.assert_array_equal(gf.locs, ibfatm)
    np.testing.assert_allclose(gf.overlap(), S, atol=1e-14)
    np.testing.assert_allclose(gf.atom_coords(), coords, atol=1e-14)

    P0 = gf.initial_density()
    # restricted Gaussian density is per-spin: trace(P S) = ne/2
    np.testing.assert_allclose(np.trace(P0 @ S), 3.0, atol=1e-10)

    # the fock(P) round trip must flow the density into the new Fock:
    # F = H0 + U diag(occ_tot) with occ from the STORED (halved) density
    P = 2.0 * P0
    F, E = gf.fock(P)
    occ = 2 * np.real(np.diag((P / 2) @ S))
    np.testing.assert_allclose(F, H0 + 0.4 * np.diag(occ), atol=1e-10)
    assert np.isfinite(E)
    # the DENSITY update must have been issued (not a fresh SCF)
    assert gf.bar.update_calls[-1]["dofock"] == "DENSITY"


def test_gaussian_fock_unrestricted_and_generalized(tmp_path):
    from gaunegf_tpu.models.fock import GaussianFock

    H0, S, ibfatm, _ = _sys()
    gfu = GaussianFock(str(tmp_path / "u"), func="hf", spin="u")
    np.testing.assert_array_equal(
        gfu.locs, np.concatenate([ibfatm, -ibfatm]))
    assert gfu.overlap().shape == (12, 12)
    Pu = gfu.initial_density()
    F, E = gfu.fock(Pu)
    assert F.shape == (12, 12)
    np.testing.assert_array_equal(F[:6, 6:], np.zeros((6, 6)))

    gfg = GaussianFock(str(tmp_path / "g"), func="hf", spin="g")
    Pg = gfg.initial_density()
    assert np.iscomplexobj(Pg) and Pg.shape == (12, 12)
    F, E = gfg.fock(Pg)
    assert F.shape == (12, 12) and np.iscomplexobj(F)


def test_gaussian_fock_field_rounding_and_chk(tmp_path):
    from gaunegf_tpu.models.fock import GaussianFock

    _sys()
    gf = GaussianFock(str(tmp_path / "f"), func="hf", spin="r")
    # reference scf.py:386-388 rounds the field components when storing
    gf.set_field([1.6, -2.4, 0.2])
    assert gf.bar.scalars["X-EFIELD"] == 2
    assert gf.bar.scalars["Y-EFIELD"] == -2
    assert gf.bar.scalars["Z-EFIELD"] == 0
    gf.write_chk()
    assert gf.bar.written == [str(tmp_path / "f") + ".chk"]


def test_gaussian_fock_import_gate(monkeypatch):
    """Without gauopen, GaussianFock raises a clear ImportError."""
    import gaunegf_tpu.models.fock as fock
    fake_gauopen.uninstall()
    import sys

    class _Block:
        def find_module(self, name, path=None):
            return None

        def find_spec(self, name, path=None, target=None):
            if name.startswith("gauopen"):
                raise ImportError("gauopen blocked for test")
            return None

    blocker = _Block()
    sys.meta_path.insert(0, blocker)
    try:
        with pytest.raises(ImportError, match="gauopen"):
            fock.GaussianFock("/tmp/nope")
    finally:
        sys.meta_path.remove(blocker)
