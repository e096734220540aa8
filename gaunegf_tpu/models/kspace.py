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

__all__ = ["monkhorst_pack_2d", "kspace_phases", "kspace_sigma_down",
           "kspace_sigma_surface", "DOWN_DIRS"]

DOWN_DIRS = (3, 4, 5)                  # below-plane neighbour slots
_UP_DIRS = (9, 10, 11)


def monkhorst_pack_2d(nk: int):
    """nk x nk Monkhorst-Pack fractional coordinates in the surface BZ."""
    f = (np.arange(nk) + 0.5) / nk - 0.5
    k1, k2 = np.meshgrid(f, f, indexing="ij")
    return np.stack([k1.ravel(), k2.ravel()], axis=1)      # (nk^2, 2)


def kspace_phases(n_vecs: np.ndarray, nk: int):
    """Bloch phases e^{i k.R} for the 6 in-plane + 3 below-plane slots.

    The in-plane lattice vectors are slots 0 and 1 of the matched fcc
    direction set (unit NN distance -- phases are scale-free); reciprocal
    vectors satisfy b_i . a_j = 2 pi delta_ij within the plane.  Returns
    (plane_phases (Nk, 6), down_phases (Nk, 3)) complex arrays.
    """
    n_vecs = np.asarray(n_vecs, float)
    normal = np.cross(n_vecs[0], n_vecs[1])
    normal /= np.linalg.norm(normal)

    def in_plane(v):
        return v - np.dot(v, normal) * normal

    a1, a2 = n_vecs[0], n_vecs[1]
    # 2D reciprocal basis within the plane
    M = np.array([[a1 @ a1, a1 @ a2], [a2 @ a1, a2 @ a2]])
    Minv = np.linalg.inv(M)
    b1 = 2 * np.pi * (Minv[0, 0] * a1 + Minv[0, 1] * a2)
    b2 = 2 * np.pi * (Minv[1, 0] * a1 + Minv[1, 1] * a2)

    frac = monkhorst_pack_2d(nk)
    kvecs = frac[:, :1] * b1[None, :] + frac[:, 1:] * b2[None, :]  # (Nk, 3)

    plane_R = np.stack([n_vecs[d] for d in PLANE_DIRS])             # (6, 3)
    down_R = np.stack([in_plane(n_vecs[d]) for d in DOWN_DIRS])     # (3, 3)
    plane_ph = np.exp(1j * kvecs @ plane_R.T)
    down_ph = np.exp(1j * kvecs @ down_R.T)
    return plane_ph, down_ph


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
                      conv=SURFACE_GREEN_CONVERGENCE, max_iter=64):
    """BZ-averaged half-space self-energy Sigma_down(E) (9, 9).

    One Sancho-Rubio decimation per k point, vmapped -- the nk^2
    decimations batch onto the MXU exactly like an energy chunk."""
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
        return Bk @ g @ jnp.conj(Bk).T

    sig = jax.vmap(per_k)(A, B)
    return jnp.mean(sig, axis=0)


def kspace_sigma_surface(E, H, Slist, Vlist, plane_ph, down_ph, eta=ETA,
                         conv=SURFACE_GREEN_CONVERGENCE,
                         mix=SURFACE_BETHE_MIX,
                         max_iter=SURFACE_MAX_ITER_BETHE, sig0=None):
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
                                 eta, conv)
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
        new = mix * (B[plane] @ g[None] @ Bd[plane]) \
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
    diff0 = zl._tie_vma(jnp.asarray(jnp.inf), A) \
        + 0.0 * jnp.real(jnp.sum(seed))
    count0 = zl._tie_vma(jnp.zeros((), jnp.int32), A)
    _, _, sig = lax.while_loop(cond, body, (count0, diff0, seed))
    return sig, sig_down
