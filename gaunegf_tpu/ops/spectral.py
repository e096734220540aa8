"""Spectral (eigenbasis + Woodbury) energy-grid engine.

The LU engine family (ops/greens.py) pays O(N^3) per energy point, exactly
like the reference's per-energy dense solves (gauNEGF/integrate.py:67-109).
But across one energy grid H and S are FIXED and the self-energy differs
from a constant background only on the contact orbitals (rank k << N), so
the whole grid shares one spectral decomposition:

    Sigma(z) = c0 * S + P_c M(z) P_c^T          (P_c: N x k selector)
    A(z)     = z S - H - Sigma(z) = z' S - H - P_c M(z) P_c^T,  z' = z - c0
    H C = S C diag(lam),  C^T S C = I           (one host f64 eigh per Fock)
    (z' S - H)^{-1} = C D(z) C^T,  D = diag(1/(z' - lam))

and Woodbury gives, entirely in the eigenbasis,

    Ghat(z) = D + (D Cc^T) K(z) (Cc D),   Cc = P_c^T C        (k x N)
    G0cc    = Cc D Cc^T,   K = (I_k - M G0cc)^{-1} M          (k x k)
    sum_j w_j G(z_j) = C [ sum_j w_j Ghat_j ] C^T             (ONE rotation)

Per energy point that is O(N^2 k) MXU work (the rank-k outer product; a
whole chunk stacks into ONE (N, ch*k) @ (ch*k, N) matmul that performs the
energy sum inside the MXU accumulator) instead of an O(N^3) LU -- an
algorithmic ~N/(3k) advantage at the N=2000 north-star size.  The O(N^3)
basis rotation happens once per grid, and the eigh once per Fock matrix.

Precision (prototyped against f64 direct solves, see tests/test_spectral.py):

* mode='f32': D and the k x k chain (G0cc -> K) in double-word, the heavy
  outer product and accumulation in f32 HIGHEST.  ~3e-7 relative when the
  grid stays `dist_f32` away from the bare eigenvalues (always true for
  equilibrium contours; Im z bounds 1/|D|).
* mode='dw':  the whole assembly in double-word (the outer product via
  zmatmul_dw, double-word accumulation).  Near-pole Woodbury cancellation
  (true G emerges from differences of |D|^2-sized terms) is carried at
  ~eps^2: measured 2.4e-6 with a grid point EXACTLY on an eigenvalue at
  eta = 2e-9 (kappa ~ 1e9 -- a point the f32-LU + refinement path cannot
  solve any better).

The mode is chosen per dispatch on the host: the eigenvalues are host-known,
so min_j,n |z'_j - lam_n| is an exact O(nE * N) precomputation.

Reference parity: this route is invisible API-wise -- EnergyEngine.gr_sum
(and friends) produce the same sums GrInt does (integrate.py:84-142); the
spectral path engages when ExecutionConfig.solver='spectral' and the
provider's self-energy is detectably (background + contact-block); anything
else falls back to the LU engines.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.ops import zlinalg as zl
from gaunegf_tpu.ops.complexio import merge_tree, split_traced, split_tree
from gaunegf_tpu.parallel.mesh import ENERGY_AXIS

__all__ = ["SpectralStructure", "spectral_basis", "detect_structure",
           "spectral_supported", "SpectralRunner"]

_HIGHEST = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------

_BASIS_CACHE: dict = {}


def _digest(*arrays):
    import hashlib
    h = hashlib.blake2b(digest_size=16)
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def spectral_basis(H, S):
    """Host f64 generalized eigendecomposition of the (H, S) pencil.

    Returns (lam (N,) f64, C (N, N) f64 with C^T S C = I) or None when the
    pencil is not real-symmetric-definite (the spectral route requires it).
    Cached by content digest: SCF cycles rebuild engines with a fresh F but
    repeated sweeps / Fermi probes on one Fock pay the eigh once.
    """
    H = np.asarray(H)
    S = np.asarray(S)
    if np.iscomplexobj(H):
        if np.abs(H.imag).max() > 0.0:
            return None
        H = H.real
    if np.iscomplexobj(S):
        if np.abs(S.imag).max() > 0.0:
            return None
        S = S.real
    H = H.astype(np.float64)
    S = S.astype(np.float64)
    scale = max(np.abs(H).max(), 1e-300)
    if np.abs(H - H.T).max() > 1e-10 * scale:
        return None
    key = _digest(H, S)
    hit = _BASIS_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        import scipy.linalg as sla
        lam, C = sla.eigh(H, S)
    except Exception:
        return None
    if len(_BASIS_CACHE) >= 4:
        _BASIS_CACHE.pop(next(iter(_BASIS_CACHE)))
    _BASIS_CACHE[key] = (lam, C)
    return lam, C


class SpectralStructure(NamedTuple):
    """Host-detected low-rank structure of a provider's Sigma."""
    c: tuple            # contact orbital indices (static)
    c0: complex         # background coefficient: Sigma_offblock == c0 * S
    bg_cc: np.ndarray   # c0 * S[c, c]  (subtracted from the block in-jit)


def detect_structure(provider, S, probes=(0.137 + 0.211j, -0.233 + 0.173j),
                     tol=1e-6):
    """Detect Sigma(z) = c0*S + P_c M(z) P_c^T from two host probes.

    The fit is exact for every form_sigma-based provider (the reference's
    matTools.formSigma background is -1j*1e-9*S, matTools.py:39-74); any
    provider whose Sigma leaks outside the contact block (or whose
    background is energy-dependent) fails the residual check and the
    caller falls back to the LU route.
    """
    getter = getattr(provider, "contact_inds", None)
    if getter is None:
        return None
    try:
        c = getter(None)
    except Exception:
        return None
    if not c:
        return None
    c = tuple(int(j) for j in c)
    S = np.asarray(S, dtype=np.float64)
    N = S.shape[0]
    if len(c) >= N:
        return None
    from gaunegf_tpu.ops.complexio import call_complex_safe
    fn, params = provider.total_apply()
    try:
        sigs = [np.asarray(call_complex_safe(fn, params, complex(z)),
                           dtype=np.complex128) for z in probes]
    except Exception:
        return None
    off = np.ones((N, N))
    off[np.ix_(c, c)] = 0.0
    Sm = S * off
    denom = float(np.vdot(Sm, Sm).real)
    c0s = []
    for sig in sigs:
        R = sig * off
        c0 = complex(np.vdot(Sm, R) / denom) if denom > 0 else 0.0
        scale = max(np.abs(sig).max(), 1e-30)
        if np.abs(R - c0 * Sm).max() > tol * scale + 1e-12:
            return None
        c0s.append(c0)
    if abs(c0s[0] - c0s[1]) > tol * (abs(c0s[0]) + 1e-12):
        return None
    c0 = c0s[0]
    bg_cc = (c0 * S[np.ix_(c, c)]).astype(np.complex64)
    return SpectralStructure(c=c, c0=c0, bg_cc=bg_cc)


def spectral_supported(provider, H, S):
    """True when both the pencil and the Sigma structure qualify."""
    return (spectral_basis(H, S) is not None
            and detect_structure(provider, S) is not None)


# ---------------------------------------------------------------------------
# Traced double-word helpers (vectors / small blocks)
# ---------------------------------------------------------------------------

def _cdw_recip(w_dw):
    """Double-word complex reciprocal: (hi, lo) ~= 1/(wh + wl) to ~eps^2.

    One Newton correction of the f32 quotient, with the product error
    captured by complex TwoProd."""
    wh, wl = w_dw
    r0 = 1.0 / wh
    p, pe = zl.ctwo_prod(wh, r0)
    e = (1.0 - p) - (pe + wl * r0)
    return zl.ctwo_sum(r0, r0 * e)


def _cdw_scale_rows(d_dw, V):
    """(diag(d) @ V) in double-word; d complex dw (N,), V real f32 (N, k)."""
    dh, dl = d_dw
    ph, pe = zl.ctwo_prod(dh[:, None], V.astype(dh.dtype))
    return ph, pe + dl[:, None] * V


def _cdw_scale_cols(V, d_dw):
    """(V @ diag(d)) in double-word; V real f32 (k, N), d complex dw (N,)."""
    dh, dl = d_dw
    ph, pe = zl.ctwo_prod(V.astype(dh.dtype), dh[None, :])
    return ph, pe + V * dl[None, :]


def _as_cdw(x):
    return x, jnp.zeros_like(x)


def _cdw_smul_single(w, M_dw):
    """Single-word complex scalar times a dw matrix."""
    ph, pe = zl.ctwo_prod(w, M_dw[0])
    return ph, pe + w * M_dw[1]


# ---------------------------------------------------------------------------
# Per-point assembly
# ---------------------------------------------------------------------------

def _point_factors(e_dw, w, params, sig_tot_fn, sig_block_fn, c, bg_cc,
                   basis, mode):
    """One energy point -> (X, Z, or their dw pairs).

    X = D Cc^T (N, k), Z = w * K (Cc D) (k, N); the caller stacks the
    chunk and performs sum_j X_j Z_j as ONE matmul.  The k x k chain
    (G0cc -> K) always runs double-word: it is O(N k^2) and carries the
    near-pole Woodbury conditioning (f32 G0cc near a bare eigenvalue has
    O(|D| * eps) absolute error that a k x k inverse amplifies
    catastrophically -- measured 8e-5 vs 2.4e-6 end to end)."""
    eh, el = e_dw
    lam_hi = basis["lam_hi"]
    lam_lo = basis["lam_lo"]
    Cc = basis["Cc"]                         # (k, N) real f32
    cdt = eh.dtype

    if sig_block_fn is not None:
        M = sig_block_fn(params, eh) - bg_cc
    else:
        sig = sig_tot_fn(params, eh)
        cix = np.asarray(c, dtype=np.int64)
        M = sig[cix][:, cix] - bg_cc
    # pin the interior to the TPU working dtype even when params arrive in
    # c128 (x64 CPU test runs): the route's accuracy contract is the f32+dw
    # pipeline on every backend
    M = M.astype(cdt)

    # D = 1/(z' - lam) in double-word (lam is the exact two-float split of
    # the f64 eigenvalues; z' arrives as a two-float split of the f64 grid)
    dh, de = zl.ctwo_sum(eh, (-lam_hi).astype(cdt))
    dl = el + de - lam_lo.astype(cdt)
    D = _cdw_recip((dh, dl))                 # (N,) dw

    X_dw = _cdw_scale_rows(D, Cc.T)          # (N, k) dw
    Y_dw = _cdw_scale_cols(Cc, D)            # (k, N) dw
    Cc_c = _as_cdw(Cc.astype(cdt))
    M_dw = _as_cdw(M)

    # near-pole grids (mode='dw') carry |D|-sized intermediates whose
    # Woodbury cancellation needs genuinely ~eps^2 products: error-free
    # Ozaki leading terms and an exact-residual k x k inverse (same lesson
    # as surface_g_sancho_dw, models/chain1d.py).  The O(N k^2) cost is
    # irrelevant next to the O(N^2 k) outer product.
    exact = mode != "f32"
    G0 = zl.zmatmul_dw(Cc_c, X_dw, exact=exact)          # (k, k) dw
    MG = zl.zmatmul_dw(M_dw, G0, exact=exact)
    k = len(c)
    eye = jnp.eye(k, dtype=cdt)
    A = zl.cdw_sub(_as_cdw(eye), MG)
    if exact:
        Ai = zl.zinv_dw(A[0], A[1], steps=3, exact_steps=2)
    else:
        Ai = zl.zinv_dw(A[0], A[1], steps=2)
    K = zl.zmatmul_dw(Ai, M_dw, exact=exact)             # (k, k) dw

    Z_dw = _cdw_smul_single(
        w, zl.zmatmul_dw(K, Y_dw, exact=exact))          # (k, N) dw

    if mode == "f32":
        return X_dw[0], Z_dw[0] + Z_dw[1], D, w
    return X_dw, Z_dw, D, w


def _chunk_corr(Xs, Zs, mode):
    """sum_j X_j Z_j over the chunk as one stacked matmul -> (N, N) (dw)."""
    if mode == "f32":
        corr = jnp.einsum("cnk,ckm->nm", Xs, Zs, precision=_HIGHEST)
        return _as_cdw(corr)
    (Xh, Xl), (Zh, Zl) = Xs, Zs
    ch, N, k = Xh.shape
    Xh = jnp.moveaxis(Xh, 0, 1).reshape(N, ch * k)
    Xl = jnp.moveaxis(Xl, 0, 1).reshape(N, ch * k)
    Zh = Zh.reshape(ch * k, -1)
    Zl = Zl.reshape(ch * k, -1)
    # exact leading term: the near-pole diagonal of this product cancels
    # against D to ~|result|/|D| -- a dwf leading term's f32-accumulation
    # floor re-breaks what the exact k-chain above just preserved
    return zl.zmatmul_dw((Xh, Xl), (Zh, Zl), exact=True)


def _chunk_diag(D, w, mode):
    """sum_j w_j D_j for the chunk's bare-resolvent diagonal, double-word."""
    Dh, Dl = D
    ph, pe = zl.ctwo_prod(w[:, None], Dh)
    pl = pe + w[:, None] * Dl
    # compensated reduction over the chunk axis (trace-time loop, ch terms)
    h, l = ph[0], pl[0]
    for j in range(1, ph.shape[0]):
        h, e = zl.ctwo_sum(h, ph[j])
        l = l + pl[j] + e
    return h, l


def _rotate(basis, Shat_dw, diag_dw, mode):
    """P = C (Shat + diag) C^T; C real double-word.

    mode='f32': single rotation of the hi part at HIGHEST plus the three
    first-order cross terms (C_lo and Shat_lo enter linearly ~1e-7 rel).
    mode='dw': zmatmul_dw end to end."""
    Ch = basis["C_hi"]
    Cl = basis["C_lo"]
    dh, dl = diag_dw
    sh, e = zl.ctwo_sum(Shat_dw[0], jnp.diag(dh))
    sl = Shat_dw[1] + jnp.diag(dl) + e
    cdt = sh.dtype
    if mode == "f32":
        Chc = Ch.astype(cdt)
        mm = lambda a, b: jnp.matmul(a, b, precision=_HIGHEST)
        T = mm(Chc, sh)
        P = mm(T, Chc.T)
        # first-order corrections
        P = P + mm(mm(Cl.astype(cdt), sh), Chc.T)
        P = P + mm(T, Cl.astype(cdt).T)
        P = P + mm(mm(Chc, sl), Chc.T)
        return P, jnp.zeros_like(P)
    C_dw = (Ch.astype(cdt), Cl.astype(cdt))
    Ct_dw = (Ch.T.astype(cdt), Cl.T.astype(cdt))
    T = zl.zmatmul_dw(C_dw, (sh, sl))
    return zl.zmatmul_dw(T, Ct_dw)


# ---------------------------------------------------------------------------
# Engine builder
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _build_spectral_gr_engine(sig_tot_fn, sig_block_fn, c: tuple,
                              exec_cfg: ExecutionConfig,
                              mesh: Optional[Mesh], mode: str):
    """Jitted engine: (params_s, basis, bg_cc_s, E_dw_s, w_s) -> dw split sum.

    E layout (nd, nch, ch) as a two-float split of the f64 grid; returns the
    double-word pair of sum_j w_j G(E_j) as split-complex leaves."""

    def device_body(params, basis, bg_cc, E_dw, w, varying=False):
        N = basis["C_hi"].shape[0]
        Eh, El = E_dw
        cdt = Eh.dtype

        def scan_fn(carry, inputs):
            eh, el, wb = inputs
            Xs, Zs, Ds, ws = jax.vmap(
                lambda a, b, ww: _point_factors(
                    (a, b), ww, params, sig_tot_fn, sig_block_fn, c, bg_cc,
                    basis, mode))(eh, el, wb)
            corr = _chunk_corr(Xs, Zs, mode)
            dsum = _chunk_diag(Ds, wb, mode)
            (Sh, Sl), (gh, gl) = carry
            Sh2, e = zl.ctwo_sum(Sh, corr[0])
            Sl2 = Sl + corr[1] + e
            gh2, eg = zl.ctwo_sum(gh, dsum[0])
            gl2 = gl + dsum[1] + eg
            return ((Sh2, Sl2), (gh2, gl2)), None

        z2 = (jnp.zeros((N, N), cdt), jnp.zeros((N, N), cdt))
        zd = (jnp.zeros((N,), cdt), jnp.zeros((N,), cdt))
        init = (z2, zd)
        if varying:
            init = jax.tree_util.tree_map(
                lambda x: _pvary(x, (ENERGY_AXIS,)), init)
        (Shat, diag), _ = lax.scan(scan_fn, init, (Eh, El, w))
        return Shat, diag

    def finalize(basis, Shat, diag):
        Ph, Pl = _rotate(basis, Shat, diag, mode)
        return split_traced((Ph, Pl))

    if mesh is None:
        @jax.jit
        def engine(params_s, basis, bg_cc_s, E_s, w_s):
            params, bg_cc, (Eh, El), w = merge_tree(
                (params_s, bg_cc_s, E_s, w_s))
            Shat, diag = device_body(params, basis, bg_cc,
                                     (Eh[0], El[0]), w[0])
            return finalize(basis, Shat, diag)
        return engine

    @jax.jit
    def engine(params_s, basis, bg_cc_s, E_s, w_s):
        def per_device(params_s, basis, bg_cc_s, E_s, w_s):
            params, bg_cc, (Eh, El), w = merge_tree(
                (params_s, bg_cc_s, E_s, w_s))
            Shat, diag = device_body(params, basis, bg_cc,
                                     (Eh[0], El[0]), w[0], varying=True)
            Shat = lax.psum(Shat, ENERGY_AXIS)
            diag = lax.psum(diag, ENERGY_AXIS)
            return finalize(basis, Shat, diag)

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, basis, bg_cc_s, E_s, w_s)

    return engine


def _pvary(x, axes):
    from gaunegf_tpu.ops.greens import _pvary as gp
    return gp(x, axes)


# ---------------------------------------------------------------------------
# Host runner (used by EnergyEngine)
# ---------------------------------------------------------------------------

class SpectralRunner:
    """Per-(H, S, provider) spectral state: basis + structure + dispatch.

    Built lazily by EnergyEngine when exec_cfg.solver engages the route;
    `available` is False when the pencil or the Sigma structure disqualify
    (complex H, Sigma outside the contact block, ...) and the caller falls
    back to the LU engines.
    """

    def __init__(self, H, S, provider, exec_cfg: ExecutionConfig,
                 mesh: Optional[Mesh], put_fn=None):
        self.exec_cfg = exec_cfg
        self.mesh = mesh
        self.available = False
        basis = spectral_basis(H, S)
        if basis is None:
            return
        struct = detect_structure(provider, S)
        if struct is None:
            return
        lam, C = basis
        self.lam64 = lam
        self.c0 = struct.c0
        self.c = struct.c
        lam_hi = lam.astype(np.float32)
        C_hi = C.astype(np.float32)
        basis_tree = {
            "lam_hi": lam_hi,
            "lam_lo": (lam - lam_hi.astype(np.float64)).astype(np.float32),
            "C_hi": C_hi,
            "C_lo": (C - C_hi.astype(np.float64)).astype(np.float32),
            "Cc": C[np.asarray(struct.c), :].astype(np.float32),
        }
        self.bg_cc_s = split_tree(struct.bg_cc, np.complex64)
        if put_fn is not None:
            basis_tree = put_fn(basis_tree)
            self.bg_cc_s = put_fn(self.bg_cc_s)
        self.basis = basis_tree
        self.available = True

    # -- host helpers ----------------------------------------------------

    def _dists(self, E):
        zp = np.asarray(E, dtype=np.complex128) - self.c0
        return np.abs(zp[:, None] - self.lam64[None, :]).min(axis=1)

    def _mode(self, E):
        """'f32' when every shifted grid point stays dist_f32 away from the
        bare spectrum (|D| bounded => no Woodbury cancellation), else 'dw'.

        Callers are expected to have split away sub-dist_lu points already
        (split_grid); called on a raw grid this returns the mode the
        spectral part would use, or None when NO point qualifies."""
        d = self._dists(E)
        ok = d >= self.exec_cfg.spectral_dist_lu
        if not ok.any():
            return None
        dmin = d[ok].min()
        return "f32" if dmin >= self.exec_cfg.spectral_dist_f32 else "dw"

    def split_grid(self, E, w):
        """Partition (E, w) into the spectral part and the LU-fallback part.

        Points closer than dist_lu to a bare eigenvalue floor even the dw
        Woodbury assembly at ~eps_dw * |D| -- but they are well-conditioned
        for the LU engines (the contact coupling regularizes A there), so
        the caller solves them with a second LU dispatch.  Returns
        ((E_sp, w_sp), (E_lu, w_lu)); E_sp may be empty."""
        E = np.asarray(E, dtype=np.complex128)
        w = np.asarray(w, dtype=np.complex128)
        bad = self._dists(E) < self.exec_cfg.spectral_dist_lu
        return (E[~bad], w[~bad]), (E[bad], w[bad])

    def _dw_split_grid(self, E_lay):
        hi = E_lay.astype(np.complex64)
        lo = (E_lay - hi.astype(np.complex128)).astype(np.complex64)
        return (split_tree(hi, np.complex64), split_tree(lo, np.complex64))

    def gr_sum(self, provider, params_split_fn, E, w):
        """sum_j w_j G(E_j) -> (N, N) complex128 host array."""
        from gaunegf_tpu.ops.complexio import merge_host
        from gaunegf_tpu.ops.greens import _layout

        fn, params = provider.total_apply()
        block = getattr(provider, "total_block_apply", None)
        block_fn = block(self.c) if block is not None else None
        E = np.asarray(E, dtype=np.complex128)
        mode = self._mode(E)
        if mode is None:
            return None
        E_lay, w_lay, _, _ = _layout(E - self.c0,
                                     np.asarray(w, dtype=np.complex128),
                                     self.mesh, self.exec_cfg.energy_chunk)
        eng = _build_spectral_gr_engine(fn, block_fn, self.c, self.exec_cfg,
                                        self.mesh, mode)
        out = eng(params_split_fn(params), self.basis, self.bg_cc_s,
                  self._dw_split_grid(E_lay),
                  split_tree(w_lay.astype(np.complex64), np.complex64))
        hi, lo = merge_host(out)
        return hi.astype(np.complex128) + lo.astype(np.complex128)
