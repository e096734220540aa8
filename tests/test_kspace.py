"""k-space surface-GF machinery (models/kspace.py) unit properties."""

import numpy as np
import pytest

import jax.numpy as jnp

from gaunegf_tpu.models import harrison as hr
from gaunegf_tpu.models import kspace as ks
from gaunegf_tpu.models import slater_koster as sk
from gaunegf_tpu.models.bethe import PLANE_DIRS


def _au():
    p = hr.bethe_params("Au")
    n_vecs = sk.fcc111_neighbor_directions(np.array([0, 0, 1.0]),
                                           np.array([1.0, 0, 0]))
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in n_vecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in n_vecs])
    return p, n_vecs, Slist, Vlist


def test_monkhorst_pack_grid():
    f = ks.monkhorst_pack_2d(4)
    assert f.shape == (16, 2)
    assert np.abs(f).max() < 0.5                  # interior of the BZ
    assert abs(f.mean()) < 1e-14                  # symmetric grid


def test_phases_unit_modulus_and_gamma_limit():
    _, n_vecs, _, _ = _au()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 3)
    assert plane_ph.shape == (9, 6) and down_ph.shape == (9, 3)
    assert np.allclose(np.abs(plane_ph), 1) and np.allclose(
        np.abs(down_ph), 1)
    # nk=1 Monkhorst-Pack = the Gamma point: all phases exactly 1
    p1, d1 = ks.kspace_phases(n_vecs, 1)
    assert np.allclose(p1, 1) and np.allclose(d1, 1)
    # opposite in-plane slots carry conjugate phases (R -> -R)
    for a, b in ((0, 3), (1, 4), (2, 5)):         # PLANE_DIRS order
        assert np.allclose(plane_ph[:, a], np.conj(plane_ph[:, b]))


def test_sigma_down_passive_and_bounded():
    p, n_vecs, Slist, Vlist = _au()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 2)
    H = jnp.asarray(p.h0())
    for E in (-12.0, -9.5, -6.0):
        sig = np.asarray(ks.kspace_sigma_down(
            E, H, jnp.asarray(Slist), jnp.asarray(Vlist),
            jnp.asarray(plane_ph), jnp.asarray(down_ph), eta=1e-5))
        assert np.isfinite(sig).all()
        # retarded: Im(Sigma) <= 0, i.e. +i(Sigma - Sigma^+) is PSD
        # (the branch the Bethe fixed points produce; see kspace docstring)
        gam = 1j * (sig - sig.conj().T)
        assert np.linalg.eigvalsh(gam).min() > -1e-6, E


def test_sigma_down_hermitian_outside_band():
    """Far below the band the half-space sigma is real (no open channels)."""
    p, n_vecs, Slist, Vlist = _au()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 2)
    sig = np.asarray(ks.kspace_sigma_down(
        -60.0, jnp.asarray(p.h0()), jnp.asarray(Slist), jnp.asarray(Vlist),
        jnp.asarray(plane_ph), jnp.asarray(down_ph), eta=1e-6))
    anti = np.abs(sig - sig.conj().T).max()
    assert anti < 1e-4, anti


def test_sigma_down_converges_in_nk():
    p, n_vecs, Slist, Vlist = _au()
    H = jnp.asarray(p.h0())

    def sig_at(nk):
        plane_ph, down_ph = ks.kspace_phases(n_vecs, nk)
        return np.asarray(ks.kspace_sigma_down(
            -9.5, H, jnp.asarray(Slist), jnp.asarray(Vlist),
            jnp.asarray(plane_ph), jnp.asarray(down_ph), eta=1e-4))

    s1, s4, s6 = sig_at(1), sig_at(4), sig_at(6)
    err1 = np.abs(s1 - s6).max()
    err4 = np.abs(s4 - s6).max()
    assert err4 < 0.3 * err1, (err1, err4)


def test_surface_sigma_structure():
    p, n_vecs, Slist, Vlist = _au()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 2)
    sig_dirs, sig_down = ks.kspace_sigma_surface(
        -9.5, jnp.asarray(p.h0()), jnp.asarray(Slist), jnp.asarray(Vlist),
        jnp.asarray(plane_ph), jnp.asarray(down_ph), eta=1e-5)
    sig_dirs = np.asarray(sig_dirs)
    assert sig_dirs.shape == (9, 9, 9)
    for d in ks.DOWN_DIRS:                      # bulk-side slots zeroed
        assert np.abs(sig_dirs[d]).max() == 0.0
    for d in PLANE_DIRS:                        # in-plane slots populated
        assert np.abs(sig_dirs[d]).max() > 1e-8


# --- BZ symmetry reduction (C3v little group) -----------------------------

def test_orbital_rep_matches_project_convention():
    """_orbital_rep reproduces rotation_matrix's 9x9 blocks for proper
    z->direction rotations (the convention anchor) and is orthogonal for
    mirrors too."""
    rng = np.random.default_rng(3)
    for _ in range(3):
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        tr = sk.rotation_matrix(d)
        D = ks._orbital_rep(tr[1:4, 1:4])
        assert np.max(np.abs(D - tr)) < 1e-10
    m = np.eye(3) - 2 * np.outer([1.0, 0, 0], [1.0, 0, 0])   # x-mirror
    Dm = ks._orbital_rep(m)
    assert np.max(np.abs(Dm @ Dm.T - np.eye(9))) < 1e-12


def test_little_group_is_c3v():
    _, n_vecs, _, _ = _au()
    ops = ks.little_group(n_vecs)
    assert len(ops) == 6          # E, 2 C3, 3 mirrors (ABC stacking
    # breaks the in-plane C6 down to C3v)
    dets = sorted(round(float(np.linalg.det(R))) for R in ops)
    assert dets == [-1, -1, -1, 1, 1, 1]


def test_bz_reduction_exact():
    """Reduced-grid symmetrized sigma_down == full Gamma-centred grid
    sigma_down, with ~3.6x fewer decimations at nk=6."""
    p, n_vecs, Slist, Vlist = _au()
    H = p.h0()
    nk = 6
    red = ks.bz_reduce(n_vecs, nk)
    assert red is not None
    frac_reps, mask, D, nk_full = red
    assert nk_full == nk * nk
    assert int(mask.sum()) == nk * nk             # every point once
    assert len(frac_reps) <= 12                   # 36 -> 10 at nk=6

    ii, jj = np.meshgrid(np.arange(nk), np.arange(nk), indexing="ij")
    frac_full = np.stack([ii.ravel() / nk, jj.ravel() / nk], axis=1)
    frac_full = (frac_full + 0.5) % 1.0 - 0.5
    for E in [-5.0, 1.0]:
        ph_f = ks.phases_for_frac(n_vecs, frac_full)
        full = np.asarray(ks.kspace_sigma_down(E, H, Slist, Vlist, *ph_f))
        ph_r = ks.phases_for_frac(n_vecs, frac_reps)
        red_s = np.asarray(ks.kspace_sigma_down(
            E, H, Slist, Vlist, *ph_r, sym_mask=mask, sym_D=D,
            nk_full=nk_full))
        err = np.max(np.abs(red_s - full)) / np.max(np.abs(full))
        assert err < 1e-6, err    # f32-path tolerance; x64 reaches 1e-13


# --- double-word BZ integration (the high/exact tiers) ---------------------

def _dw_split(x):
    x = np.asarray(x, dtype=np.complex128)
    hi = x.astype(np.complex64)
    lo = (x - hi.astype(np.complex128)).astype(np.complex64)
    return hi, lo


def _dw_scalar(E):
    E = np.complex128(E)
    hi = np.complex64(E)
    lo = np.complex64(E - np.complex128(hi))
    return hi, lo


def test_sigma_down_dw_matches_c128():
    """kspace_sigma_down_dw agrees with the single-word machinery run in
    complex128 far below the f32 floor."""
    p, n_vecs, Slist, Vlist = _au()
    H = p.h0()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 2)
    for E in (-9.5 + 0.0j, -5.0 + 0.02j):
        truth = np.asarray(ks.kspace_sigma_down(
            np.complex128(E), H, Slist, Vlist, plane_ph, down_ph,
            eta=1e-5, conv=1e-13))
        dh, dl = ks.kspace_sigma_down_dw(
            _dw_scalar(E), _dw_split(H), _dw_split(Slist), _dw_split(Vlist),
            _dw_split(plane_ph), _dw_split(down_ph), np.float32(1e-5))
        got = np.asarray(dh, np.complex128) + np.asarray(dl, np.complex128)
        scale = np.max(np.abs(truth))
        rel = np.max(np.abs(got - truth)) / scale
        assert rel < 5e-9, (E, rel)
        f32 = np.asarray(ks.kspace_sigma_down(
            np.complex64(E), H.astype(np.float32),
            Slist.astype(np.float32), Vlist.astype(np.float32),
            plane_ph.astype(np.complex64), down_ph.astype(np.complex64),
            eta=np.float32(1e-5))).astype(np.complex128)
        rel_f32 = np.max(np.abs(f32 - truth)) / scale
        assert rel < rel_f32 / 50, (rel, rel_f32)


def test_sigma_surface_dw_matches_c128():
    """The full dw surface stack (relaxed in-plane slots + dw half-space
    term) lands on the complex128 fixed point."""
    p, n_vecs, Slist, Vlist = _au()
    H = p.h0()
    plane_ph, down_ph = ks.kspace_phases(n_vecs, 2)
    E = -9.5 + 0.01j
    t_dirs, t_down = ks.kspace_sigma_surface(
        np.complex128(E), H, Slist, Vlist, plane_ph, down_ph,
        eta=1e-5, conv=1e-13, max_iter=5000)
    (sh, sl), (dh, dl) = ks.kspace_sigma_surface_dw(
        _dw_scalar(E), _dw_split(H), _dw_split(Slist), _dw_split(Vlist),
        _dw_split(plane_ph), _dw_split(down_ph), np.float32(1e-5))
    got_dirs = np.asarray(sh, np.complex128) + np.asarray(sl, np.complex128)
    got_down = np.asarray(dh, np.complex128) + np.asarray(dl, np.complex128)
    t_dirs, t_down = np.asarray(t_dirs), np.asarray(t_down)
    rel_dirs = np.max(np.abs(got_dirs - t_dirs)) / np.max(np.abs(t_dirs))
    rel_down = np.max(np.abs(got_down - t_down)) / np.max(np.abs(t_down))
    assert rel_down < 5e-9, rel_down
    assert rel_dirs < 5e-9, rel_dirs
    for d in ks.DOWN_DIRS:                       # slots stay zeroed in dw
        assert np.abs(got_dirs[d]).max() == 0.0


def test_sigma_down_dw_sym_reduction_exact():
    """dw symmetry-reduced average == dw full Gamma-centred grid (the
    D-sandwich reassembly stays exact in double-word)."""
    p, n_vecs, Slist, Vlist = _au()
    H = p.h0()
    nk = 4
    frac_reps, mask, D, nk_full = ks.bz_reduce(n_vecs, nk)
    ii, jj = np.meshgrid(np.arange(nk), np.arange(nk), indexing="ij")
    frac_full = np.stack([ii.ravel() / nk, jj.ravel() / nk], axis=1)
    frac_full = (frac_full + 0.5) % 1.0 - 0.5
    ph_f = ks.phases_for_frac(n_vecs, frac_full)
    ph_r = ks.phases_for_frac(n_vecs, frac_reps)
    E = -5.0 + 0.01j
    fh, fl = ks.kspace_sigma_down_dw(
        _dw_scalar(E), _dw_split(H), _dw_split(Slist), _dw_split(Vlist),
        _dw_split(ph_f[0]), _dw_split(ph_f[1]), np.float32(1e-4))
    rh, rl = ks.kspace_sigma_down_dw(
        _dw_scalar(E), _dw_split(H), _dw_split(Slist), _dw_split(Vlist),
        _dw_split(ph_r[0]), _dw_split(ph_r[1]), np.float32(1e-4),
        sym_mask=np.asarray(mask, np.float32), sym_D_dw=_dw_split(D))
    full = np.asarray(fh, np.complex128) + np.asarray(fl, np.complex128)
    red = np.asarray(rh, np.complex128) + np.asarray(rl, np.complex128)
    rel = np.max(np.abs(red - full)) / np.max(np.abs(full))
    assert rel < 1e-10, rel
