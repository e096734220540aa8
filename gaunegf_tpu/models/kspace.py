"""k-space surface Green's functions for crystalline contact planes.

Closes the reference's open TODO (surfG3D.py:21-23 "need to implement
k-space integration (Gamma only)"): the half-space of crystal BELOW the
contact plane is treated exactly by 2D Brillouin-zone integration instead
of the Bethe-lattice approximation.

Construction (fcc(111) stacking, 9-orbital spd blocks):

* per surface-BZ point k, the layered crystal has the Bloch blocks
      A(k, E) = (E + i eta) S00(k) - H00(k)        (intra-layer)
      B(k, E) = (E + i eta) S01(k) - H01(k)        (layer n -> n+1 below)
  (+i eta: decimation converges to the branch Im(z) selects, and the
  RETARDED sigma (Im <= 0) is what the Bethe fixed points produce --
  their -1j seed picks that branch despite bethe_sigma_k's E - i eta
  notation -- so the two must match here to be summable)
  with H00(k) = H_onsite + sum_{6 in-plane R} e^{i k.R} V_R and
  H01(k) = sum_{3 below-plane R} e^{i k.R} V_R;
* Sancho-Rubio decimation (models/chain1d.surface_g_sancho, quadratic
  convergence, batched over k with vmap) gives the subsurface-stack
  surface GF g00(k, E);
* the contact atom's missing-half-space self-energy is the BZ average
      Sigma_down(E) = (1/Nk) sum_k B(k, E) g00(k, E) B(k, E)^+ .

Approximations, stated: the per-atom embedding keeps the k-average only
(local / site-diagonal approximation -- inter-atom coherence within the
contact plane is dropped, consistent with the Bethe-style per-atom
embedding it extends), and the plane's own lateral semi-infinity (the
unmatched IN-plane neighbour slots) still uses the Bethe directional
fixed point.  Both errors vanish as the explicit contact cluster grows;
the perpendicular direction -- where Gamma-only was worst -- is exact and
convergent in nk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gaunegf_tpu.config import (
    ETA, SURFACE_BETHE_MIX, SURFACE_GREEN_CONVERGENCE, SURFACE_MAX_ITER_BETHE)
from gaunegf_tpu.models.chain1d import surface_g_sancho
from gaunegf_tpu.models.bethe import DIM, PLANE_DIRS
from gaunegf_tpu.ops import zlinalg as zl

__all__ = ["monkhorst_pack_2d", "kspace_phases", "phases_for_frac",
           "little_group", "bz_reduce", "kspace_sigma_down",
           "kspace_sigma_surface", "kspace_sigma_down_dw",
           "kspace_sigma_surface_dw", "DOWN_DIRS"]

DOWN_DIRS = (3, 4, 5)                  # below-plane neighbour slots
_UP_DIRS = (9, 10, 11)


def monkhorst_pack_2d(nk: int):
    """nk x nk Monkhorst-Pack fractional coordinates in the surface BZ."""
    f = (np.arange(nk) + 0.5) / nk - 0.5
    k1, k2 = np.meshgrid(f, f, indexing="ij")
    return np.stack([k1.ravel(), k2.ravel()], axis=1)      # (nk^2, 2)


def _recip_basis(n_vecs: np.ndarray):
    """(normal, b1, b2): unit surface normal and the 2D reciprocal basis
    of the in-plane lattice vectors (slots 0/1), b_i . a_j = 2 pi d_ij."""
    n_vecs = np.asarray(n_vecs, float)
    normal = np.cross(n_vecs[0], n_vecs[1])
    normal /= np.linalg.norm(normal)
    a1, a2 = n_vecs[0], n_vecs[1]
    M = np.array([[a1 @ a1, a1 @ a2], [a2 @ a1, a2 @ a2]])
    Minv = np.linalg.inv(M)
    b1 = 2 * np.pi * (Minv[0, 0] * a1 + Minv[0, 1] * a2)
    b2 = 2 * np.pi * (Minv[1, 0] * a1 + Minv[1, 1] * a2)
    return normal, b1, b2


def phases_for_frac(n_vecs: np.ndarray, frac: np.ndarray):
    """Bloch phases e^{i k.R} at the given fractional surface-BZ points.

    Returns (plane_phases (Nk, 6), down_phases (Nk, 3)); see
    kspace_phases."""
    n_vecs = np.asarray(n_vecs, float)
    normal, b1, b2 = _recip_basis(n_vecs)

    def in_plane(v):
        return v - np.dot(v, normal) * normal

    frac = np.asarray(frac, float)
    kvecs = frac[:, :1] * b1[None, :] + frac[:, 1:] * b2[None, :]  # (Nk, 3)
    plane_R = np.stack([n_vecs[d] for d in PLANE_DIRS])             # (6, 3)
    down_R = np.stack([in_plane(n_vecs[d]) for d in DOWN_DIRS])     # (3, 3)
    plane_ph = np.exp(1j * kvecs @ plane_R.T)
    down_ph = np.exp(1j * kvecs @ down_R.T)
    return plane_ph, down_ph


def kspace_phases(n_vecs: np.ndarray, nk: int):
    """Bloch phases e^{i k.R} for the 6 in-plane + 3 below-plane slots.

    The in-plane lattice vectors are slots 0 and 1 of the matched fcc
    direction set (unit NN distance -- phases are scale-free); reciprocal
    vectors satisfy b_i . a_j = 2 pi delta_ij within the plane.  Returns
    (plane_phases (Nk, 6), down_phases (Nk, 3)) complex arrays.
    """
    return phases_for_frac(n_vecs, monkhorst_pack_2d(nk))


# ---------------------------------------------------------------------------
# Surface-BZ symmetry reduction (C3v little group of the fcc(111) plane)
# ---------------------------------------------------------------------------

def _orbital_rep(R: np.ndarray) -> np.ndarray:
    """9x9 orbital representation of a 3x3 orthogonal transform R.

    Basis order (s, px, py, pz, dz2, dxz, dyz, dx2-y2, dxy) -- the
    project's Slater-Koster convention (slater_koster.rotation_matrix).
    The l=2 block is derived numerically: the real d harmonics are
    quadratic forms, so evaluating f_i(R^T u) on generic unit vectors and
    least-squares-fitting back onto the basis gives the representation
    matrix exactly (to rounding).  Works for improper ops (mirrors) too,
    where the two-angle constructor cannot."""
    R = np.asarray(R, float)

    def dharm(u):
        x, y, z = u
        r3 = np.sqrt(3.0)
        return np.array([
            (3 * z * z - 1.0) / 2.0,
            r3 * x * z,
            r3 * y * z,
            r3 * (x * x - y * y) / 2.0,
            r3 * x * y,
        ])

    rng = np.random.default_rng(12345)
    U = rng.standard_normal((12, 3))
    U /= np.linalg.norm(U, axis=1, keepdims=True)
    Phi = np.stack([dharm(u) for u in U], axis=1)          # (5, 12)
    # active convention (f_i(R u) = sum_j D[i,j] f_j(u)): matches
    # rotation_matrix's blocks (verified against its analytic l=2 block)
    Phi_rot = np.stack([dharm(R @ u) for u in U], axis=1)
    D5 = Phi_rot @ np.linalg.pinv(Phi)

    out = np.zeros((DIM, DIM))
    out[0, 0] = 1.0
    out[1:4, 1:4] = R
    out[4:9, 4:9] = D5
    return out


def _match_set(ops_img: np.ndarray, ref: np.ndarray, tol=1e-8):
    """Permutation p with ops_img[i] == ref[p[i]], or None."""
    p = []
    for v in ops_img:
        d = np.linalg.norm(ref - v[None, :], axis=1)
        j = int(np.argmin(d))
        if d[j] > tol or j in p:
            return None
        p.append(j)
    return p


def little_group(n_vecs: np.ndarray):
    """Point-group ops of the contact plane that fix the neighbour sets.

    Candidates: rotations about the surface normal by multiples of 60
    degrees and mirrors through planes containing the normal and each
    in-plane neighbour / bond bisector.  An op survives only if it
    permutes BOTH the 6 in-plane and the 3 below-plane neighbour vectors
    (empirical gate -- for fcc(111) with ABC stacking the survivors form
    C3v, 6 ops).  Returns a list of 3x3 matrices including the identity.
    """
    n_vecs = np.asarray(n_vecs, float)
    normal, _, _ = _recip_basis(n_vecs)
    plane_R = np.stack([n_vecs[d] for d in PLANE_DIRS])
    down_R = np.stack([n_vecs[d] for d in DOWN_DIRS])

    def axis_rot(axis, ang):
        axis = axis / np.linalg.norm(axis)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)

    cands = [np.eye(3)]
    for k in range(1, 6):
        cands.append(axis_rot(normal, k * np.pi / 3))
    for v in plane_R:
        u = v / np.linalg.norm(v)
        # mirror through the plane spanned by (normal, u)
        m = np.cross(normal, u)
        cands.append(np.eye(3) - 2 * np.outer(m, m))
    for i in range(len(plane_R)):
        v = plane_R[i] + plane_R[(i + 1) % len(plane_R)]
        if np.linalg.norm(v) < 1e-9:
            continue
        u = v / np.linalg.norm(v)
        m = np.cross(normal, u)
        cands.append(np.eye(3) - 2 * np.outer(m, m))

    ops, seen = [], []
    for R in cands:
        if any(np.max(np.abs(R - S)) < 1e-8 for S in seen):
            continue
        seen.append(R)
        if _match_set(plane_R @ R.T, plane_R) is None:
            continue
        if _match_set(down_R @ R.T, down_R) is None:
            continue
        ops.append(R)
    return ops


def bz_reduce(n_vecs: np.ndarray, nk: int):
    """Symmetry-reduced Gamma-centred surface-BZ grid.

    Returns (frac_reps (n_reps, 2), mask (n_reps, n_ops), D (n_ops, 9, 9),
    nk_full) such that for any k-resolved 9x9 quantity M(k) that
    transforms as M(g k) = D_g M(k) D_g^T (Bloch blocks, half-space
    sigmas), the full-grid average equals

        (1/nk_full) sum_r sum_o mask[r, o] * D_o M(k_r) D_o^T.

    The Gamma-centred grid (i/nk fractions) is closed under the little
    group's integer action on fractional coordinates; ops whose action
    does not land on the grid (or with no nontrivial partner) are
    dropped.  Returns None when no reduction is available (caller falls
    back to the full Monkhorst-Pack grid)."""
    n_vecs = np.asarray(n_vecs, float)
    normal, b1, b2 = _recip_basis(n_vecs)
    a1, a2 = n_vecs[0], n_vecs[1]
    ops3 = little_group(n_vecs)
    if len(ops3) <= 1:
        return None

    # fractional action: frac' = (R k) . a_j / (2 pi); keep ops whose
    # action is an integer matrix on the k-lattice (grid-closure)
    kept, W = [], []
    for R in ops3:
        Wg = np.array([[(R @ b1) @ a1, (R @ b2) @ a1],
                       [(R @ b1) @ a2, (R @ b2) @ a2]]) / (2 * np.pi)
        Wi = np.rint(Wg)
        if np.max(np.abs(Wg - Wi)) < 1e-8:
            kept.append(R)
            W.append(Wi.astype(int))
    if len(kept) <= 1:
        return None

    D = np.stack([_orbital_rep(R) for R in kept])

    idx = np.arange(nk * nk)
    ii, jj = idx // nk, idx % nk
    visited = np.zeros(nk * nk, bool)
    reps, masks = [], []
    for p in range(nk * nk):
        if visited[p]:
            continue
        images = {}
        for o, Wg in enumerate(W):
            f2 = Wg @ np.array([ii[p], jj[p]])
            q = int((f2[0] % nk) * nk + (f2[1] % nk))
            if q not in images:
                images[q] = o
        for q in images:
            visited[q] = True
        row = np.zeros(len(kept))
        for q, o in images.items():
            row[o] = 1.0
        reps.append(p)
        masks.append(row)
    frac_reps = np.stack([ii[reps] / nk, jj[reps] / nk], axis=1)
    frac_reps = (frac_reps + 0.5) % 1.0 - 0.5
    return frac_reps, np.stack(masks), D, nk * nk


def _bloch_blocks(H, Slist, Vlist, plane_ph, down_ph):
    """H00(k)/S00(k) intra-layer and H01(k)/S01(k) inter-layer blocks.

    Shapes: (Nk, 9, 9) each; Slist/Vlist are the 12 directional SK
    matrices in slot order."""
    plane = jnp.asarray(PLANE_DIRS)
    down = jnp.asarray(DOWN_DIRS)
    eye = jnp.eye(DIM, dtype=plane_ph.dtype)
    H00 = H[None] + jnp.einsum("kd,dij->kij", plane_ph, Vlist[plane])
    S00 = eye[None] + jnp.einsum("kd,dij->kij", plane_ph, Slist[plane])
    H01 = jnp.einsum("kd,dij->kij", down_ph, Vlist[down])
    S01 = jnp.einsum("kd,dij->kij", down_ph, Slist[down])
    return H00, S00, H01, S01


def kspace_sigma_down(E, H, Slist, Vlist, plane_ph, down_ph, eta=ETA,
                      conv=SURFACE_GREEN_CONVERGENCE, max_iter=64,
                      sym_mask=None, sym_D=None, nk_full=None):
    """BZ-averaged half-space self-energy Sigma_down(E) (9, 9).

    One Sancho-Rubio decimation per k point, vmapped -- the nk^2
    decimations batch onto the MXU exactly like an energy chunk.

    With (sym_mask (n_reps, n_ops), sym_D (n_ops, 9, 9), nk_full) from
    ``bz_reduce``, the phases cover only the symmetry-reduced
    representatives (~nk^2/6 for fcc(111)'s C3v) and the full-grid
    average is reassembled exactly by the orbital-rotation sandwich
    sum_r sum_o mask[r,o] D_o M(k_r) D_o^T / nk_full."""
    cdt = jnp.result_type(H.dtype, plane_ph.dtype, jnp.complex64)
    z = E + 1j * eta   # retarded branch (see module docstring: matches
    # the branch the Bethe fixed points' -1j seed selects)
    H00, S00, H01, S01 = _bloch_blocks(
        H.astype(cdt), Slist.astype(cdt), Vlist.astype(cdt),
        plane_ph.astype(cdt), down_ph.astype(cdt))
    A = z * S00 - H00
    B = z * S01 - H01

    def per_k(Ak, Bk):
        g = surface_g_sancho(Ak, Bk, conv, max_iter)
        # explicit HIGHEST (bare @ is one-pass bf16 on TPU, see chain1d)
        return zl._mm(zl._mm(Bk, g), jnp.conj(Bk).T)

    sig = jax.vmap(per_k)(A, B)
    if sym_mask is None:
        return jnp.mean(sig, axis=0)
    D = jnp.asarray(sym_D, cdt)
    m = jnp.asarray(sym_mask, cdt)
    out = jnp.einsum("ro,oij,rjk,olk->il", m, D, sig, D,
                     precision=jax.lax.Precision.HIGHEST)
    denom = jnp.sum(m) if nk_full is None else jnp.asarray(nk_full, cdt)
    return out / denom


def kspace_sigma_surface(E, H, Slist, Vlist, plane_ph, down_ph, eta=ETA,
                         conv=SURFACE_GREEN_CONVERGENCE,
                         mix=SURFACE_BETHE_MIX,
                         max_iter=SURFACE_MAX_ITER_BETHE, sig0=None,
                         sym_mask=None, sym_D=None, nk_full=None):
    """Surface sigmas for a k-integrated contact atom: (sig_dirs, sig_down).

    sig_down is the exact BZ-averaged half-space term (no fixed point);
    the 6 in-plane directional sigmas re-relax around it with the Bethe
    Jacobi iteration (models/bethe.bethe_sigma_surface pattern), seeded
    from zero -- or from ``sig0`` (a previous energy's converged stack)
    for warm-started sweeps.  Warm-seeding is restricted to THIS relaxed
    Jacobi loop on purpose: seeding the per-k Sancho decimation with a
    previous-energy g is the unsound pattern found for chain contacts
    (spurious attracting fixed points near band features, BASELINE.md
    round-3 notes), while the mix<1 Jacobi relaxation is the
    basin-preserving Bethe warm path verified clean on a dense sweep.
    Returns (sig_dirs (9, 9, 9) with the DOWN slots zeroed, sig_down
    (9, 9)); the embedding's per-atom sigma is
    sig_down + sum(in-plane sig_dirs) - matched in-plane slots.
    """
    sig_down = kspace_sigma_down(E, H, Slist, Vlist, plane_ph, down_ph,
                                 eta, conv, sym_mask=sym_mask, sym_D=sym_D,
                                 nk_full=nk_full)
    cdt = sig_down.dtype
    A = (E + 1j * eta) * jnp.eye(DIM, dtype=cdt) - H.astype(cdt)
    B = (E + 1j * eta) * Slist.astype(cdt) - Vlist.astype(cdt)
    Bd = jnp.conj(jnp.swapaxes(B, -1, -2))
    plane = jnp.asarray(PLANE_DIRS)

    def cond(state):
        count, diff, sig = state
        return (diff > conv) & (count < max_iter)

    def body(state):
        count, diff, sig = state
        sig_old = sig
        g = zl.zinv(A - sig_down - jnp.sum(sig, axis=0))
        new = mix * zl._mm(zl._mm(B[plane], g[None]), Bd[plane]) \
            + (1 - mix) * sig_old[plane]
        sig = sig.at[plane].set(new)
        diff = jnp.max(jnp.abs(sig - sig_old)) / jnp.maximum(
            jnp.max(jnp.abs(sig_old)), 1e-30)
        return (count + 1, diff, sig)

    if sig0 is None:
        seed = jnp.zeros((9, DIM, DIM), cdt)
    else:
        seed = sig0.astype(cdt)
    seed = zl._tie_vma(seed, A)
    rdt = jnp.zeros((), cdt).real.dtype
    diff0 = zl._tie_vma(jnp.asarray(jnp.inf, rdt), A) \
        + 0.0 * jnp.real(jnp.sum(seed))
    count0 = zl._tie_vma(jnp.zeros((), jnp.int32), A)
    _, _, sig = lax.while_loop(cond, body, (count0, diff0, seed))
    return sig, sig_down


# ---------------------------------------------------------------------------
# Double-word BZ integration (the 'high'/'exact' tiers' k-space Sigma)
# ---------------------------------------------------------------------------

def _dw_recip(d):
    """Double-word reciprocal of a positive real scalar (traced): (hi, lo)
    with hi + lo ~= 1/d to ~eps^2 (one Newton correction with the product
    error captured by two_prod)."""
    r = 1.0 / d
    p, e = zl.two_prod(d, r)
    return r, r * ((1.0 - p) - e)


def _dw_recip_const(n):
    """Exact two-float split of the host-known weight 1/n."""
    r = 1.0 / float(n)
    hi = np.float32(r)
    lo = np.float32(r - np.float64(hi))
    return hi, lo


def _dw_ops(E_dw, H_dw, S_dw, V_dw, eta, cdt):
    """dw Bloch-block ingredients: A_at = zE I - H (9, 9) and the 12
    directional B_d = zE S_d - V_d, with zE = E + i eta captured exactly
    (the +i eta retarded branch -- see the module docstring)."""
    eta_c = jnp.asarray(1j, cdt) * jnp.asarray(eta, jnp.float32)
    zh, e = zl.ctwo_sum(E_dw[0].astype(cdt), eta_c)
    zE = (zh, E_dw[1].astype(cdt) + e)
    eye = jnp.eye(DIM, dtype=cdt)
    A_at = zl.cdw_sub(zl.cdw_smul(zE, (eye, jnp.zeros_like(eye))),
                      (H_dw[0].astype(cdt), H_dw[1].astype(cdt)))
    B_dirs = zl.cdw_sub(
        zl.cdw_smul(zE, (S_dw[0].astype(cdt), S_dw[1].astype(cdt))),
        (V_dw[0].astype(cdt), V_dw[1].astype(cdt)))
    return A_at, B_dirs


def _dw_sum0(X_dw):
    """dw sum over axis 0 (compensated; trace-time loop, small stacks)."""
    hi, lo = X_dw
    h, l = hi[0], lo[0]
    for k in range(1, hi.shape[0]):
        h, e = zl.ctwo_sum(h, hi[k])
        l = l + lo[k] + e
    return h, l


def kspace_sigma_down_dw(E_dw, H_dw, S_dw, V_dw, plane_ph_dw, down_ph_dw,
                         eta=ETA, conv=1e-12, max_iter=64,
                         sym_mask=None, sym_D_dw=None):
    """BZ-averaged half-space self-energy in double-word arithmetic.

    The dw twin of kspace_sigma_down: Bloch blocks are assembled from
    exact (hi, lo) splits of the phases and SK matrices, each k point runs
    chain1d.surface_g_sancho_dw (vmapped over k), and the average (or the
    symmetry sandwich sum_r sum_o mask D_o M(k_r) D_o^T / Nk with a
    dw-split D) is accumulated compensated.  Removes the f32 evaluation
    floor for the 'high'/'exact' tiers' k-space contacts."""
    from gaunegf_tpu.models.chain1d import surface_g_sancho_dw

    cdt = jnp.result_type(E_dw[0].dtype, H_dw[0].dtype, jnp.complex64)
    A_at, B_dirs = _dw_ops(E_dw, H_dw, S_dw, V_dw, eta, cdt)

    nk = plane_ph_dw[0].shape[0]
    Ah = jnp.broadcast_to(A_at[0], (nk, DIM, DIM))
    Al = jnp.broadcast_to(A_at[1], (nk, DIM, DIM))
    A_k = (Ah, Al)
    for idx, d in enumerate(PLANE_DIRS):
        ph = (plane_ph_dw[0][:, idx, None, None].astype(cdt),
              plane_ph_dw[1][:, idx, None, None].astype(cdt))
        A_k = zl.cdw_add2(A_k, zl.cdw_smul(
            ph, (B_dirs[0][d][None], B_dirs[1][d][None])))
    B_k = None
    for idx, d in enumerate(DOWN_DIRS):
        ph = (down_ph_dw[0][:, idx, None, None].astype(cdt),
              down_ph_dw[1][:, idx, None, None].astype(cdt))
        t = zl.cdw_smul(ph, (B_dirs[0][d][None], B_dirs[1][d][None]))
        B_k = t if B_k is None else zl.cdw_add2(B_k, t)

    def per_k(Ak, Bk):
        g = surface_g_sancho_dw(Ak, Bk, conv, max_iter)
        return zl.zmatmul_dw(
            Bk, zl.zmatmul_dw(g, zl.cdw_conj_t(Bk), exact=True), exact=True)

    sig = jax.vmap(per_k)(A_k, B_k)                        # ((Nk,9,9) hi, lo)

    if sym_mask is None:
        s = _dw_sum0(sig)
        wh, wl = _dw_recip_const(nk)
        w = (jnp.asarray(wh, cdt), jnp.asarray(wl, cdt))
        return zl.cdw_smul(w, s)

    m = jnp.asarray(sym_mask)
    n_ops = m.shape[1]
    out = None
    for o in range(n_ops):
        mo = m[:, o][:, None, None]
        # mask entries are 0/1: the per-op masked sum is exact
        So = _dw_sum0((sig[0] * mo.astype(cdt), sig[1] * mo.astype(cdt)))
        Do = (sym_D_dw[0][o].astype(cdt), sym_D_dw[1][o].astype(cdt))
        sand = zl.zmatmul_dw(
            Do, zl.zmatmul_dw(So, zl.cdw_conj_t(Do), exact=True),
            exact=True)
        out = sand if out is None else zl.cdw_add2(out, sand)
    # sum(mask) counts each full-grid point once == nk_full (exact small
    # integers, so the traced sum and its dw reciprocal are clean)
    denom = jnp.sum(jnp.real(m).astype(jnp.float32))
    wh, wl = _dw_recip(denom)
    return zl.cdw_smul((wh.astype(cdt), wl.astype(cdt)), out)


def kspace_sigma_surface_dw(E_dw, H_dw, S_dw, V_dw, plane_ph_dw,
                            down_ph_dw, eta=ETA, conv=1e-11,
                            mix=SURFACE_BETHE_MIX,
                            max_iter=SURFACE_MAX_ITER_BETHE,
                            sym_mask=None, sym_D_dw=None):
    """(sig_dirs, sig_down) for a k-integrated contact atom, double-word.

    sig_down is the dw BZ average (kspace_sigma_down_dw); the 6 in-plane
    directional sigmas are seeded from the converged single-word Jacobi
    relaxation and re-iterated with the SAME map in dw arithmetic (the
    bethe_sigma_surface_dw pattern) until stationary to ``conv``.
    Returns ((9, 9, 9) dw stack with DOWN slots zeroed, (9, 9) dw)."""
    from gaunegf_tpu.models.bethe import (
        _cdw_blend, _cdw_diff, _zinv_dw_b)

    sig_down = kspace_sigma_down_dw(
        E_dw, H_dw, S_dw, V_dw, plane_ph_dw, down_ph_dw, eta,
        sym_mask=sym_mask, sym_D_dw=sym_D_dw)
    cdt = sig_down[0].dtype

    # single-word seed (converged to ~f32 accuracy in c64; exact-split
    # hi inputs reproduce the single-word path bit-for-bit)
    sym_D_hi = None if sym_D_dw is None else sym_D_dw[0]
    seed, _ = kspace_sigma_surface(
        E_dw[0], H_dw[0], S_dw[0], V_dw[0], plane_ph_dw[0], down_ph_dw[0],
        eta, mix=mix, max_iter=max_iter, sym_mask=sym_mask, sym_D=sym_D_hi)

    A_at, B_dirs = _dw_ops(E_dw, H_dw, S_dw, V_dw, eta, cdt)
    plane = jnp.asarray(PLANE_DIRS)
    Bp = (B_dirs[0][plane], B_dirs[1][plane])
    Bpd = (jnp.conj(jnp.swapaxes(Bp[0], -1, -2)),
           jnp.conj(jnp.swapaxes(Bp[1], -1, -2)))

    def cond(state):
        count, diff, *_ = state
        return (diff > conv) & (count < max_iter)

    def body(state):
        count, diff, sh, sl = state
        tot = _dw_sum0((sh, sl))
        M = zl.cdw_sub(zl.cdw_sub(A_at, sig_down), tot)
        g = _zinv_dw_b(M)
        prod = zl.zmatmul_dw(Bp, zl.zmatmul_dw(g, Bpd, exact=True),
                             exact=True)
        new = _cdw_blend(mix, prod, (sh[plane], sl[plane]))
        nh = sh.at[plane].set(new[0])
        nl = sl.at[plane].set(new[1])
        return (count + 1, _cdw_diff((nh, nl), (sh, sl)), nh, nl)

    rdt = jnp.zeros((), cdt).real.dtype
    sh0 = zl._tie_vma(seed.astype(cdt), A_at[0])
    sl0 = jnp.zeros_like(sh0)
    diff0 = zl._tie_vma(jnp.asarray(jnp.inf, rdt), A_at[0]) \
        + 0.0 * jnp.real(jnp.sum(sh0))
    count0 = zl._tie_vma(jnp.zeros((), jnp.int32), A_at[0])
    _, _, sh, sl = lax.while_loop(cond, body, (count0, diff0, sh0, sl0))
    return (sh, sl), sig_down
