"""surfG3D.surfGAt parity: the explicit all-neighbour lattice closure.

The reference's surfG3D.surfGAt bulk Dyson equation (surfG3D.py:843-903)
uses g = inv(A - sum_all sigma_k) for EVERY direction -- no
opposite-direction exclusion, unlike surfGBethe.surfGBAt -- plus a
sigmaKprev warm start reused within |dE| < 1 eV (surfG3D.py:877-879).
These tests pin the closure='lattice' fixed point against a direct NumPy
iteration of that equation, verify it differs from the Bethe closure, and
exercise the compat class's warm-start bookkeeping.
"""

import os

import numpy as np

import gaunegf_tpu.models.bethe as bt
import gaunegf_tpu.models.slater_koster as sk

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_bethe.npz"))


def _matrices():
    p = sk.bethe_params_from_dict(
        dict(zip([str(k) for k in GOLD["Au_keys"]], GOLD["Au_vals"])))
    nvecs = GOLD["nn_vecs"]
    Slist = np.stack([sk.bond_matrix(p.overlap, d) for d in nvecs])
    Vlist = np.stack([sk.bond_matrix(p.hopping, d) for d in nvecs])
    return p.h0(), Slist, Vlist


def _numpy_lattice_sigma_k(E, H, Slist, Vlist, eta, conv=1e-10, mix=0.5,
                           max_iter=5000):
    """Direct NumPy iteration of surfG3D.py:877-903's equation."""
    A = (E - 1j * eta) * np.eye(bt.DIM) - H
    sig = np.array([-1j * np.eye(bt.DIM) for _ in range(bt.NN)],
                   dtype=complex)
    B = np.array([(E - 1j * eta) * S - V for S, V in zip(Slist, Vlist)])
    for _ in range(max_iter):
        old = sig.copy()
        g = np.linalg.inv(A - sig.sum(axis=0))
        sig = mix * (B @ g @ np.conj(np.swapaxes(B, -1, -2))) \
            + (1 - mix) * old
        if np.max(np.abs(sig - old)) / np.max(np.abs(old)) < conv:
            break
    return sig


def test_lattice_closure_matches_numpy_iteration():
    H, Slist, Vlist = _matrices()
    E = -3.0
    ref = _numpy_lattice_sigma_k(E, H, Slist, Vlist, 1e-3)
    got = np.asarray(bt.BetheAtomGF(H, Slist, Vlist, eta=1e-3,
                                    closure="lattice").sigma_k(E))
    assert np.max(np.abs(got - ref)) < 1e-4


def test_lattice_differs_from_bethe_closure():
    H, Slist, Vlist = _matrices()
    g_lat = bt.BetheAtomGF(H, Slist, Vlist, eta=1e-3, closure="lattice")
    g_bet = bt.BetheAtomGF(H, Slist, Vlist, eta=1e-3, closure="bethe")
    E = -3.0
    a = np.asarray(g_lat.sigma_k(E))
    b = np.asarray(g_bet.sigma_k(E))
    assert np.max(np.abs(a - b)) > 1e-4      # genuinely different closures


def test_surface_sweep_on_lattice_closure():
    H, Slist, Vlist = _matrices()
    g = bt.BetheAtomGF(H, Slist, Vlist, eta=1e-3, closure="lattice")
    sig = np.asarray(g.sigma(-3.0))
    assert sig.shape == (9, bt.DIM, bt.DIM)
    assert np.isfinite(sig).all()
    # retarded: the embedded total must broaden, not sharpen
    tot = sig.sum(axis=0)
    assert np.linalg.eigvalsh(1j * (tot - tot.conj().T)).max() > 0


def test_compat_surfgat_warm_start_bookkeeping():
    from gaunegf_tpu.compat.surfG3D import Eminf, surfGAt
    H, Slist, Vlist = _matrices()
    g = surfGAt(H, Slist, Vlist, eta=1e-3)
    assert g.closure == "lattice"
    assert g.sigmaKprev is None and g.Eprev == Eminf
    s1 = np.asarray(g.sigmaK(-3.0))
    assert g.Eprev == -3.0 and g.sigmaKprev is not None
    # warm-started nearby call converges to the same fixed point
    s2 = np.asarray(g.sigmaK(-3.0 + 1e-4))
    assert np.max(np.abs(s2 - s1)) < 1e-2
    # far jump (>= 1 eV) cold-starts; state still updates
    g.sigmaK(2.0)
    assert g.Eprev == 2.0


def test_compat_surfgat_sigma_chains_warm_state():
    """sigma()/DOS() also ride the sigmaKprev chain (the reference's
    sigma calls sigmaK internally, surfG3D.py:950) and the warm-started
    surface result matches a cold object's at the fixed-point tolerance."""
    from gaunegf_tpu.compat.surfG3D import surfGAt
    H, Slist, Vlist = _matrices()
    g = surfGAt(H, Slist, Vlist, eta=1e-3)
    g.sigma(-1.0)
    assert g.Eprev == -1.0 and g.sigmaKprev is not None
    s_warm = np.asarray(g.sigma(-1.0 + 1e-4))
    cold = surfGAt(H, Slist, Vlist, eta=1e-3)
    s_cold = np.asarray(cold.sigma(-1.0 + 1e-4))
    assert np.max(np.abs(s_warm - s_cold)) < 2e-3
    out = g.sigma(-1.0, inds=[0, 5])
    assert len(out) == 2 and out[0].shape == (bt.DIM, bt.DIM)


def test_compat_surfgat_extended_embedding_keeps_exclusion():
    """Both references keep the opposite-direction exclusion in the
    13-site EMBEDDING even though the bulk closures differ
    (surfG3D.py:1024-1031)."""
    from gaunegf_tpu.compat.surfG3D import surfGAt
    H, Slist, Vlist = _matrices()
    g = surfGAt(H, Slist, Vlist, eta=1e-3)
    E = -3.0
    sig_tot = np.asarray(g.sigmaTot(E))
    sig_k = np.asarray(g.sigma_k(E))
    tot = sig_k.sum(axis=0)
    for k in range(bt.NN):
        blk = sig_tot[k * bt.DIM:(k + 1) * bt.DIM,
                      k * bt.DIM:(k + 1) * bt.DIM]
        assert np.max(np.abs(blk - (tot - sig_k[(k + 6) % 12]))) < 1e-10
