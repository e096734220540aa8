"""3D-lattice contact model (surfG3D equivalent) + deprecated DOS search."""

import os

import numpy as np
import pytest

from gaunegf_tpu.models import bethe as bt
from gaunegf_tpu.models.lattice3d import Lattice3DSelfEnergy


def _plane_geometry(d=2.88):
    """Single hexagonal contact plane of 4 atoms + a device atom."""
    u1 = np.array([1.0, 0.0, 0.0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0.0]) * d
    top = [np.zeros(3), u1, u2, u1 + u2]
    device = [np.array([1.0, 0.6, -5.0])]
    coords = np.stack(top + device)
    n_metal = len(top)
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        orb_atoms += [atom] * (9 if atom <= n_metal else 4)
    return bt.BetheGeometry(coords, np.asarray(orb_atoms), None)


def _lat_file():
    import gaunegf_tpu
    return os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                        "demo.bethe")


def test_lattice3d_provider():
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    prov = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                               lat_file=_lat_file(), eta=1e-6, T=0.0,
                               fermi=0.0, verbose=False)
    sig = prov.sigmaTot(-2.0)
    assert sig.shape == (n_orb, n_orb)
    blk = sig[:36, :36]
    assert np.max(np.abs(blk)) > 1e-3
    gam = 1j * (blk - blk.conj().T)
    assert np.linalg.eigvalsh(gam).min() > -1e-6


def test_lattice3d_rejects_non_planar():
    geom = _plane_geometry()
    coords = geom.coords.copy()
    coords[1, 2] += 2.5      # push one contact atom far out of the plane
    geom2 = bt.BetheGeometry(coords, geom.orbital_atoms, None)
    F = np.zeros((40, 40))
    with pytest.raises(ValueError, match="Lattice mismatch"):
        Lattice3DSelfEnergy(F, np.eye(40), [[1, 2, 3, 4]], geom2,
                            lat_file=_lat_file(), fermi=0.0, verbose=False)


def test_lattice3d_kspace_provider():
    """gamma_point_only=False: BZ-integrated half-space (beyond the
    reference, which never implemented it -- surfG3D.py:21-23)."""
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    prov = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                               lat_file=_lat_file(), eta=1e-6, T=0.0,
                               fermi=0.0, verbose=False,
                               gamma_point_only=False, nk=2)
    assert prov.kspace
    sig = prov.sigmaTot(-2.0)
    blk = sig[:36, :36]
    assert np.isfinite(blk).all()
    assert np.max(np.abs(blk)) > 1e-3
    gam = 1j * (blk - blk.conj().T)
    assert np.linalg.eigvalsh(gam).min() > -1e-6, "passivity"
    # the k-integrated half-space must differ from the Bethe half-space
    prov_g = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                                 lat_file=_lat_file(), eta=1e-6, T=0.0,
                                 fermi=0.0, verbose=False)
    sig_g = prov_g.sigmaTot(-2.0)
    assert np.max(np.abs(sig - sig_g)) > 1e-4


def test_dos_fermi_search():
    """Deprecated DOS-Taylor predictor: converges on an analytic model
    where N(E) = integral of a known smooth DOS."""
    from gaunegf_tpu.fermi_search_dos import DOSFermiSearch

    dos = lambda E: 2.0 + 0.5 * E          # N(E) = 2E + 0.25 E^2 (from 0)
    n_of = lambda E: 2.0 * E + 0.25 * E ** 2
    target = n_of(1.2)
    # note: the initial deltaEf equals the initial Ef (reference semantics,
    # fermiSearch.py:72), so a zero initial guess would collapse the
    # finite-difference step; start from a finite guess
    search = DOSFermiSearch(0.3, target, deltaE=0.01)
    Ef, n_curr = 0.3, n_of(0.3)
    for _ in range(10):
        Ef = search.step(dos, n_curr)
        n_curr = n_of(Ef)
        if abs(n_curr - target) < 1e-8:
            break
    assert abs(Ef - 1.2) < 1e-6


def test_detector_normal_points_away_from_structure():
    """The SVD normal's sign is arbitrary; the detector must orient it
    toward the missing electrode bulk (away from the structure centroid)
    regardless of which side of the plane the device sits on."""
    from gaunegf_tpu.models.lattice3d import _detect_contact_3d

    for z_dev in (-5.0, +5.0):
        geom = _plane_geometry()
        coords = geom.coords.copy()
        coords[-1, 2] = z_dev                 # device above or below
        geom2 = bt.BetheGeometry(coords, geom.orbital_atoms, None)
        _, normal, _, n_vecs, _ = _detect_contact_3d(geom2, [1, 2, 3, 4])
        assert normal[2] * z_dev < 0, (z_dev, normal)
        # bulk-side slots (3,4,5) must lie on the +normal side
        for d in (3, 4, 5):
            assert n_vecs[d] @ normal > 0.5


def _kspace_provider(nk=2):
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    return Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                               lat_file=_lat_file(), eta=1e-6, T=0.0,
                               fermi=0.0, verbose=False,
                               gamma_point_only=False, nk=nk), n_orb


def test_lattice3d_kspace_warm_matches_cold_sweep():
    """Warm-seeded in-plane Jacobi (state carried across a dense sorted
    sweep) lands on the same sigma as the cold zero-seeded path -- the
    spurious-fixed-point check that killed chain warm seeding
    (BASELINE.md round-3): only the basin-preserving relaxation carries,
    so warm == cold everywhere, including across band features."""
    prov, n_orb = _kspace_provider()
    wfn, params, state = prov.contacts_warm_apply()
    energies = np.linspace(-14.0, -2.0, 48)      # spans the spd band
    worst = 0.0
    for E in energies:
        sigs, state = wfn(params, E, state)
        cold_fn, cold_params = prov.contact_apply(0)
        cold = np.asarray(cold_fn(cold_params, E))
        d = np.max(np.abs(np.asarray(sigs[0]) - cold))
        scale = max(np.max(np.abs(cold)), 1e-30)
        worst = max(worst, d / scale)
    # both paths stop on relative-change < SURFACE_GREEN_CONVERGENCE
    # (1e-5), so they sit O(10*conv) apart near slow-contraction band
    # features; the gap scales LINEARLY with conv (measured 5e-5 ->
    # 4.9e-8 -> 5.2e-11 at conv 1e-5/1e-8/1e-11), proving a shared fixed
    # point -- a spurious attractor (the chain hazard) would be O(1)
    assert worst < 5e-4, worst


def test_lattice3d_kspace_warm_engine_transmission():
    """EnergyEngine warm path (forced) on the k-space provider matches
    the cold transmission."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    prov, n_orb = _kspace_provider()
    H = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    E = np.linspace(-11.0, -7.0, 8)
    cold = EnergyEngine(H, S, prov,
                        ExecutionConfig(warm_start=False,
                                        energy_chunk=4)).transmission(E)
    warm = EnergyEngine(H, S, prov,
                        ExecutionConfig(warm_start="force",
                                        energy_chunk=4)).transmission(E)
    assert np.isfinite(cold).all() and np.isfinite(warm).all()
    np.testing.assert_allclose(warm, cold, rtol=1e-4, atol=1e-9)


def test_lattice3d_bz_symmetry_reduction():
    """bz_symmetry=True (default) folds the surface BZ by the validated
    C3v little group: fewer decimation points, Gamma-centred grid (the
    standard for hexagonal BZs), physics within grid-flavour distance of
    the full Monkhorst-Pack evaluation and passive."""
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    kw = dict(lat_file=_lat_file(), eta=1e-6, T=0.0, fermi=0.0,
              verbose=False, gamma_point_only=False, nk=4)
    p_sym = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom, **kw)
    p_mp = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                               bz_symmetry=False, **kw)
    c = p_sym.params()["contacts"][0]
    assert c["plane_ph"].shape[0] < 16            # 16 -> 5 reps at nk=4
    assert "sym_mask" in c and "sym_D" in c
    s1 = p_sym.sigmaTot(-2.0)
    s2 = p_mp.sigmaTot(-2.0)
    blk = s1[:36, :36]
    gam = 1j * (blk - blk.conj().T)
    assert np.linalg.eigvalsh(gam).min() > -1e-6, "passivity"
    # same integral, different (Gamma-centred vs MP) nk=4 grids: close
    # but not equal; both converge to the same limit in nk
    d = np.max(np.abs(s1 - s2)) / np.max(np.abs(s2))
    assert 1e-6 < d < 0.15, d


def test_lattice3d_kspace_dw_provider():
    """The k-space mode's double-word Sigma (total_apply_dw) matches a
    tight complex128 ground truth far below the f32 floor -- the same
    provider hook the high/exact engines consume (no single-word
    fallback left for the BZ-integrated mode)."""
    from gaunegf_tpu.models import kspace as ks
    from gaunegf_tpu.models.bethe import _dw_split_host

    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    prov = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                               lat_file=_lat_file(), eta=1e-6, T=0.0,
                               fermi=0.0, verbose=False,
                               gamma_point_only=False, nk=2,
                               bz_symmetry=False)
    fn, params = prov.total_apply_dw()

    E = np.complex128(-2.0 + 0.03j)
    E_hi = np.complex64(E)
    E_dw = (E_hi, np.complex64(E - np.complex128(E_hi)))
    sh, sl = fn(params, E_dw)
    got = np.asarray(sh, np.complex128) + np.asarray(sl, np.complex128)

    # c128 truth: tight-conv kspace surface stack + the same embedding
    inds, nind, N, spin, orthogonal = prov._static_key()
    assert not orthogonal and spin == "r"
    g0 = prov.g_list[0]
    plane_ph, down_ph = prov._phases[0]
    t_dirs, t_down = ks.kspace_sigma_surface(
        E, g0.H, g0.Slist, g0.Vlist, plane_ph, down_ph, g0.eta,
        conv=1e-13, max_iter=5000)
    stack = np.asarray(t_dirs).copy()
    stack[ks.DOWN_DIRS[0]] = np.asarray(t_down)
    truth = np.zeros((N, N), dtype=np.complex128)
    for n_inds, f_inds in zip(nind[0], inds[0]):
        atom = stack[:9].sum(axis=0)
        for k in n_inds:
            if k < 9:
                atom = atom - stack[k]
        truth[np.ix_(np.asarray(f_inds), np.asarray(f_inds))] = atom

    scale = np.max(np.abs(truth))
    rel = np.max(np.abs(got - truth)) / scale
    assert rel < 1e-8, rel

    # the symmetry-reduced flavour agrees with its own single-word seed
    # grid to the same accuracy (Gamma-centred grid differs physically)
    prov_sym = Lattice3DSelfEnergy(F, S, [[1, 2, 3, 4]], geom,
                                   lat_file=_lat_file(), eta=1e-6, T=0.0,
                                   fermi=0.0, verbose=False,
                                   gamma_point_only=False, nk=2,
                                   bz_symmetry=True)
    fn_s, params_s = prov_sym.total_apply_dw()
    sh_s, sl_s = fn_s(params_s, E_dw)
    assert np.isfinite(np.asarray(sh_s)).all()
