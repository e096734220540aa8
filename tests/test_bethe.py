"""Bethe-lattice electrodes vs reference goldens (surfGBethe parity)."""

import os

import numpy as np
import pytest

from gaunegf_tpu.models import bethe as bt
from gaunegf_tpu.models import slater_koster as sk

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_bethe.npz"))


def _au_params():
    keys = [str(k) for k in GOLD["Au_keys"]]
    vals = GOLD["Au_vals"]
    return sk.bethe_params_from_dict(dict(zip(keys, vals)))


def test_bethe_params_and_h0():
    p = _au_params()
    assert p.ne == 11
    assert not p.orthogonal
    assert np.max(np.abs(p.h0() - GOLD["H0"])) < 1e-12


def test_orthogonal_param_set():
    keys = [str(k) for k in GOLD["Au2_keys"]]
    p2 = sk.bethe_params_from_dict(dict(zip(keys, GOLD["Au2_vals"])))
    assert p2.orthogonal


def test_sk_matrices_match_reference():
    p = _au_params()
    for d, Vref, Sref in zip(GOLD["sk_dirs"], GOLD["sk_V"], GOLD["sk_S"]):
        V = sk.bond_matrix(p.hopping, d)
        S = sk.bond_matrix(p.overlap, d)
        assert np.max(np.abs(V - Vref)) < 1e-10
        assert np.max(np.abs(S - Sref)) < 1e-10


def test_sk_validation_passes_on_au():
    sk.validate_slater_koster(_au_params(), atol=1e-8)


def test_neighbor_directions_match_reference():
    got = sk.fcc111_neighbor_directions(GOLD["nn_normal"], GOLD["nn_first"])
    assert got.shape == (12, 3)
    assert np.max(np.abs(got - GOLD["nn_vecs"])) < 1e-10
    # opposite pairing (k+6)%12
    for k in range(6):
        assert np.allclose(got[k], -got[k + 6])


def _atom_gf():
    p = _au_params()
    nvecs = GOLD["nn_vecs"]
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in nvecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in nvecs])
    return bt.BetheAtomGF(p.h0(), Slist, Vlist, eta=1e-6, T=0.0)


def test_extended_lattice_matrices():
    g = _atom_gf()
    assert np.max(np.abs(g.F - GOLD["at_F"])) < 1e-10
    assert np.max(np.abs(g.S - GOLD["at_S"])) < 1e-10


def test_bulk_sigma_k_matches_reference():
    g = _atom_gf()
    for E, ref in zip(GOLD["at_Es"], GOLD["at_sigmaK"]):
        got = g.sigma_k(float(E))
        assert np.max(np.abs(got - ref)) < 5e-4, E


def test_surface_sigma_matches_reference():
    g = _atom_gf()
    for E, ref in zip(GOLD["at_Es"], GOLD["at_sigma"]):
        got = g.sigma(float(E))
        assert np.max(np.abs(got - ref)) < 5e-4, E


def test_extended_sigma_tot_and_dos():
    g = _atom_gf()
    tot = g.sigmaTot(0.0)
    assert np.max(np.abs(tot - GOLD["at_sigmaTot_0"])) < 5e-4
    dos = np.array([g.DOS(float(E)) for E in GOLD["at_Es"]])
    assert np.max(np.abs(dos - GOLD["at_DOS"])) < 1e-2
    assert np.all(dos > -1e-9)


def _fcc_slab_geometry(d=2.88):
    """Synthetic FCC [111] two-layer slab + molecule below: 3-atom contact
    triangle (top layer), 3 atoms of the second layer, one device atom."""
    u1 = np.array([1.0, 0.0, 0.0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0.0]) * d
    z_down = np.array([0.5, 0.5 / np.sqrt(3), -np.sqrt(2.0 / 3.0)]) * d
    top = [np.zeros(3), u1, u2]
    # full second layer patch: each top atom gets its 3 below-neighbours
    second = []
    for m in (-1, 0, 1):
        for n in (-1, 0, 1):
            second.append(z_down + m * u1 + n * u2)
    device = [np.array([1.0, 0.6, -4.5 * d])]
    coords = np.stack(top + second + device)
    n_metal = len(top) + len(second)
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        n_orb = 9 if atom <= n_metal else 4
        orb_atoms += [atom] * n_orb
    return bt.BetheGeometry(coords + 7.0, np.asarray(orb_atoms), None)


def test_geometry_detection():
    geom = _fcc_slab_geometry()
    inds_list, normal, lat, n_vecs, n_inds = bt._detect_contact(
        geom, [1, 2, 3])
    assert len(inds_list) == 3 and all(len(i) == 9 for i in inds_list)
    # surface normal should be +z (outward from the slab)
    assert abs(abs(normal[2]) - 1) < 1e-6
    # every contact atom sees its 2 in-plane partners and 3 second-layer
    # neighbours -> 5 matched directions each
    assert all(len(n) == 5 for n in n_inds)
    # matched directions must be unit FCC neighbour slots
    for n in n_inds:
        assert all(0 <= k < 12 for k in n)


def test_full_bethe_provider():
    geom = _fcc_slab_geometry()
    n_orb = 12 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    prov = bt.BetheSelfEnergy(
        F, S, [[1, 2, 3]], geom,
        lat_file=os.path.join(os.path.dirname(bt.__file__), "..", "data",
                              "demo.bethe"),
        eta=1e-6, T=0.0, fermi=0.0, verbose=False)
    sig = prov.sigmaTot(-2.0)
    assert sig.shape == (n_orb, n_orb)
    # sigma acts only on the contact orbitals
    assert np.max(np.abs(sig[27:, 27:])) < 1e-12
    blk = sig[:27, :27]
    assert np.max(np.abs(blk)) > 1e-3
    # retarded: spectral function of the contact block is PSD-ish
    gam = 1j * (blk - blk.conj().T)
    w = np.linalg.eigvalsh(gam)
    assert w.min() > -1e-6

    # provider pure-fn API agrees with the host API
    fn, params = prov.total_apply()
    import jax.numpy as jnp
    got = np.asarray(fn(params, jnp.asarray(-2.0 + 0j)))
    assert np.max(np.abs(got - sig)) < 1e-8


def test_bethe_fermi_shift():
    g = _atom_gf()
    g.fermi = 0.0
    H_before = g.H.copy()
    V_before = g.Vlist.copy()
    g.update_h(1.5)
    assert np.allclose(g.H, H_before + 1.5 * np.eye(9))
    assert np.allclose(g.Vlist, V_before + 1.5 * g.Slist)
    assert g.fermi == 1.5


def test_warm_start_transmission_matches_cold():
    """Warm-started Bethe sweeps (previous-energy fixed-point init along
    each lane's contiguous segment) agree with cold starts."""
    import dataclasses
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    p = _au_params()
    nvecs = GOLD["nn_vecs"]
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in nvecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in nvecs])

    # build a minimal BetheSelfEnergy-like provider via the full class
    import os
    import gaunegf_tpu
    from gaunegf_tpu.models.bethe import BetheGeometry, BetheSelfEnergy
    d = 2.88
    u1 = np.array([1.0, 0, 0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0]) * d
    top = [np.zeros(3), u1, u2]
    second = [np.array([0.5, 0.5 / np.sqrt(3), -np.sqrt(2 / 3)]) * d
              + m * u1 + n_ * u2 for m in (-1, 0, 1) for n_ in (-1, 0, 1)]
    coords = np.stack(top + second + [np.array([1.0, 0.6, -12.0])])
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        orb_atoms += [atom] * (9 if atom <= 12 else 1)
    geom = BetheGeometry(coords, np.asarray(orb_atoms), None)
    n_orb = 12 * 9 + 1
    F = np.zeros((n_orb, n_orb))
    F[-1, -1] = -8.0
    F[0, -1] = F[-1, 0] = -0.5
    lat = os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                       "demo.bethe")
    prov = BetheSelfEnergy(F, np.eye(n_orb), [[1, 2, 3]], geom,
                           lat_file=lat, eta=1e-5, fermi=0.0, verbose=False)
    E = np.linspace(-10, -6, 12)
    warm = EnergyEngine(F, np.eye(n_orb), prov,
                        ExecutionConfig(energy_chunk=4, warm_start=True))
    cold = EnergyEngine(F, np.eye(n_orb), prov,
                        ExecutionConfig(energy_chunk=4, warm_start=False))
    Tw = warm.transmission(E)
    Tc = cold.transmission(E)
    # both paths stop at conv=1e-5 of the same fixed point from different
    # initializations; agreement scales with |T| (up to ~8 channels here)
    assert np.max(np.abs(Tw - Tc)) < 1e-4


def test_warm_start_density_matches_cold():
    """Warm-started contour density equals cold to fixed-point tolerance,
    serial and sharded (zero-weight padding must not contribute)."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu import density as dens
    from gaunegf_tpu.parallel.mesh import energy_mesh
    import os
    import gaunegf_tpu
    from gaunegf_tpu.models.bethe import BetheGeometry, BetheSelfEnergy

    d = 2.88
    u1 = np.array([1.0, 0, 0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0]) * d
    top = [np.zeros(3), u1, u2]
    second = [np.array([0.5, 0.5 / np.sqrt(3), -np.sqrt(2 / 3)]) * d
              + m * u1 + n_ * u2 for m in (-1, 0, 1) for n_ in (-1, 0, 1)]
    coords = np.stack(top + second + [np.array([1.0, 0.6, -12.0])])
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        orb_atoms += [atom] * (9 if atom <= 12 else 1)
    geom = BetheGeometry(coords, np.asarray(orb_atoms), None)
    n_orb = 12 * 9 + 1
    F = np.zeros((n_orb, n_orb))
    F[-1, -1] = -8.0
    F[0, -1] = F[-1, 0] = -0.5
    lat = os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                       "demo.bethe")
    prov = BetheSelfEnergy(F, np.eye(n_orb), [[1, 2, 3]], geom,
                           lat_file=lat, eta=1e-5, fermi=0.0, verbose=False)
    # 13 points: exercises padding in the lane-major layout
    Pw = dens.density_complex_n(F, np.eye(n_orb), prov, -12.0, -7.0, 13,
                                exec_cfg=ExecutionConfig(
                                    energy_chunk=4, warm_start=True))
    Pc = dens.density_complex_n(F, np.eye(n_orb), prov, -12.0, -7.0, 13,
                                exec_cfg=ExecutionConfig(
                                    energy_chunk=4, warm_start=False))
    assert np.max(np.abs(Pw - Pc)) < 1e-5
    # sharded warm == serial warm
    Pw8 = dens.density_complex_n(F, np.eye(n_orb), prov, -12.0, -7.0, 13,
                                 exec_cfg=ExecutionConfig(
                                     energy_chunk=4, warm_start=True),
                                 mesh=energy_mesh())
    assert np.max(np.abs(Pw8 - Pw)) < 1e-5


def test_embed_fn_built_under_trace_reusable_across_traces():
    """jax >= 0.9 regression: the lru-cached embed closure must not capture
    jnp constants created at BUILD time -- if the closure is first built
    inside an active trace (the warm k-space transmission scan does this),
    a build-time constant is a tracer and leaks into every later trace
    (UnexpectedTracerError on the second same-key provider)."""
    import jax
    import jax.numpy as jnp

    bt._bethe_embed_fn.cache_clear()
    key = (((tuple(range(9)),),),     # inds[contact 0][atom 0] = orbs 0-8
           (((0, 1),),),              # nind: subtract directions 0, 1
           9, "r", True)              # N=9, restricted, orthogonal (Xi@..@Xi)
    Xi_h = bt._HashableArray(np.eye(9))
    sig_surf = jnp.asarray(
        np.random.default_rng(0).standard_normal((9, 9, 9))
        + 1j * np.random.default_rng(1).standard_normal((9, 9, 9)))

    @jax.jit
    def first(x):                     # closure built DURING this trace
        return bt._bethe_embed_fn(key, Xi_h, 0)(x)

    @jax.jit
    def second(x):                    # same cached closure, new trace
        return 2.0 * bt._bethe_embed_fn(key, Xi_h, 0)(x)

    a = np.asarray(first(sig_surf))
    b = np.asarray(second(sig_surf))
    assert np.allclose(b, 2.0 * a)


def _dw_scalar(E):
    E = np.complex128(E)
    hi = np.complex64(E)
    lo = np.complex64(E - np.complex128(hi))
    return hi, lo


def test_sigma_surface_dw_matches_c128():
    """The double-word Bethe fixed point (bethe_sigma_surface_dw) agrees
    with the single-word machinery run in complex128 far below the f32
    floor (the 'high'/'exact' tiers' Sigma path)."""
    p = _au_params()
    nvecs = GOLD["nn_vecs"]
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in nvecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in nvecs])
    H = p.h0()
    for E in (0.7 + 0.013j, -3.1 + 0.05j):
        truth = np.asarray(bt.bethe_sigma_surface(
            np.complex128(E), H, Slist, Vlist, 1e-6, conv=1e-13,
            max_iter=5000))
        sh, sl = bt.bethe_sigma_surface_dw(
            _dw_scalar(E), bt._dw_split_host(H), bt._dw_split_host(Slist),
            bt._dw_split_host(Vlist), np.float32(1e-6))
        got = np.asarray(sh, dtype=np.complex128) \
            + np.asarray(sl, dtype=np.complex128)
        scale = np.max(np.abs(truth))
        rel = np.max(np.abs(got - truth)) / scale
        # f32 single-word floor is ~1e-6 relative; dw must beat it by >100x
        assert rel < 5e-9, (E, rel)
        f32 = np.asarray(bt.bethe_sigma_surface(
            np.complex64(E), H.astype(np.float32),
            Slist.astype(np.float32), Vlist.astype(np.float32),
            np.float32(1e-6))).astype(np.complex128)
        rel_f32 = np.max(np.abs(f32 - truth)) / scale
        assert rel < rel_f32 / 50, (rel, rel_f32)


def test_high_tier_engine_uses_bethe_dw():
    """EnergyEngine precision='high' with a Bethe provider runs the dw
    Sigma (provider.total_apply_dw) and lands far below the f32 floor."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    geom = _fcc_slab_geometry()
    n_orb = 12 * 9 + 4
    rng = np.random.default_rng(5)
    F = np.zeros((n_orb, n_orb))
    F[:27, :27] += 0.05 * np.diag(np.cos(np.arange(27)))
    F[27:, 27:] += np.diag(rng.uniform(-1, 1, n_orb - 27))
    S = np.eye(n_orb)
    prov = bt.BetheSelfEnergy(
        F, S, [[1, 2, 3]], geom,
        lat_file=os.path.join(os.path.dirname(bt.__file__), "..", "data",
                              "demo.bethe"),
        eta=1e-6, T=0.0, fermi=0.0, verbose=False)
    assert prov.total_apply_dw is not None

    E = np.array([-1.3 + 0.05j, 0.4 + 0.05j, 1.9 + 0.05j])
    w = np.array([0.7, 1.1, 0.3], dtype=complex)

    # c128 ground truth: tight fixed point + the same embedding data
    inds, nind, N, spin, orthogonal = prov._static_key()
    assert not orthogonal and spin == "r"
    g0 = prov.g_list[0]
    truth = np.zeros((N, N), dtype=np.complex128)
    for Ek, wk in zip(E, w):
        sig_surf = np.asarray(bt.bethe_sigma_surface(
            np.complex128(Ek), g0.H, g0.Slist, g0.Vlist, g0.eta,
            conv=1e-13, max_iter=5000))
        sig = np.zeros((N, N), dtype=np.complex128)
        for n_inds, f_inds in zip(nind[0], inds[0]):
            atom = sig_surf[:9].sum(axis=0)
            for k in n_inds:
                if k < 9:
                    atom = atom - sig_surf[k]
            sig[np.ix_(np.asarray(f_inds), np.asarray(f_inds))] = atom
        truth += wk * np.linalg.inv(
            Ek * S.astype(np.complex128) - F - sig)

    eng = EnergyEngine(F, S, prov, ExecutionConfig(
        precision="high", energy_chunk=3))
    got = eng.gr_sum(E, w)
    rel = np.max(np.abs(got - truth)) / np.max(np.abs(truth))
    assert rel < 2e-7, rel

    fast = EnergyEngine(F, S, prov, ExecutionConfig(
        precision="fast", energy_chunk=3)).gr_sum(E, w)
    rel_fast = np.max(np.abs(fast - truth)) / np.max(np.abs(truth))
    # high must clearly beat fast; the absolute bound above is the real
    # check (the ~5e-8 floor is the engine's dw solve, not the Bethe Sigma)
    assert rel < rel_fast / 4, (rel, rel_fast)
