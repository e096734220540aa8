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
spectral path engages when ExecutionConfig.solver is 'spectral' or 'auto'
(the default since round 4) and the provider's self-energy is detectably
(background + contact-block); anything else falls back to the LU engines.
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
        # divide-and-conquer drivers: measured 1.2 s (evd) / 2.9 s (gvd)
        # vs 21.8 s (gv default) at N=2000 on this host -- the eigh is
        # per-Fock, i.e. on the SCF cycle's critical path
        if np.array_equal(S, np.eye(S.shape[0])):
            lam, C = sla.eigh(H, driver="evd")
        else:
            try:
                lam, C = sla.eigh(H, S, driver="gvd")
            except Exception:
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
    cached = getattr(provider, "_spectral_struct", None)
    if cached is not None:
        return cached
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
    # beyond k ~ N/2 the O(N^2 k) route has no advantage over the LU (and
    # the dw k x k chain dominates) -- same support cap as use_lowrank
    if len(c) > N // 2:
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
    struct = SpectralStructure(c=c, c0=c0, bg_cc=bg_cc)
    # cache ON the provider: detection costs two sigma evaluations (for
    # chain/Bethe that is two surface fixed points) and the STRUCTURE is
    # invariant under setF -- only the block values change
    try:
        provider._spectral_struct = struct
    except Exception:
        pass
    return struct


def spectral_supported(provider, H, S):
    """True when both the pencil and the Sigma structure qualify."""
    return (spectral_basis(H, S) is not None
            and detect_structure(provider, S) is not None)


# ---------------------------------------------------------------------------
# Device-side basis: f32 eigh seed + Ogita-Aishima double-word refinement
# ---------------------------------------------------------------------------

_SM12_CACHE: dict = {}


def _s_m12_host(S):
    """Host f64 S^{-1/2} (once per run -- the overlap never changes across
    SCF cycles), cached by content digest."""
    S = np.asarray(S, dtype=np.float64)
    key = _digest(S)
    hit = _SM12_CACHE.get(key)
    if hit is not None:
        return hit
    w, U = np.linalg.eigh(S)
    if w.min() <= 0:
        return None
    M = (U / np.sqrt(w)[None, :]) @ U.T
    if len(_SM12_CACHE) >= 4:
        _SM12_CACHE.pop(next(iter(_SM12_CACHE)))
    _SM12_CACHE[key] = M
    return M


def _dw_split_real(x):
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    return hi, (x - hi.astype(np.float64)).astype(np.float32)


def _mm_dw_real(a_dw, b_dw, exact=True):
    """Real double-word matmul.

    exact=True (default): Ozaki-sliced leading product -- the
    double-float scheme only removes input representation error, NOT the
    f32 accumulation error of the partial matmuls (~1e-7 rel, measured:
    it capped the OA refinement at seed quality), while the Ozaki slices
    are exact on the MXU.  The lite tier (~3e-14 per product, ~4x fewer
    MXU passes -- zlinalg.matmul_ozaki_lite) is ample for the OA
    refinement's targets (lam ~5e-13, orthogonality ~7e-14 floors sit at
    the dw representation, not the product error)."""
    ah, al = a_dw
    bh, bl = b_dw
    if exact:
        h, l = zl.matmul_ozaki_lite(ah, bh)
    else:
        h, l = zl._matmul_hp_real(ah, bh)
    cross = (jnp.matmul(ah, bl, precision=_HIGHEST)
             + jnp.matmul(al, bh, precision=_HIGHEST))
    hh, e = zl.two_sum(h, cross)
    return hh, l + e


def _dw_recip_real(w_dw):
    wh, wl = w_dw
    r0 = 1.0 / wh
    p, pe = zl.two_prod(wh, r0)
    e = (1.0 - p) - (pe + wl * r0)
    t, te = zl.two_sum(r0, r0 * e)
    return t, te


@lru_cache(maxsize=None)
def _build_device_basis_fn(has_overlap: bool, oa_steps: int,
                           cluster_tol: float, seeded: bool = False,
                           robust: bool = False):
    """Jitted device basis: (H_dw, [Sm12_dw]) -> (lam_dw, C_dw).

    f32 eigh seed (XLA QDWH on TPU, LAPACK on CPU) + Ogita-Aishima
    refinement with double-word residual matmuls:

        R = I - X^T X,  S = X^T A X        (dw products)
        lam_i = S_ii / (1 - R_ii)          (dw)
        E_ij  = (S_ij + lam_j R_ij) / (lam_j - lam_i)   separated pairs
        E_ij  = R_ij / 2                    clusters (orthonormalize only:
                                            any orthonormal cluster basis
                                            is equivalent for the RESOLVENT)
        X <- X + X E

    Prototype-measured: orthogonality ~7e-14, lam ~5e-13, resolvent ~7e-8
    after one step incl. exact 4-fold degeneracies -- below the mixed
    tier's floor, so the device basis serves fast/mixed without the host
    eigh (the host f64 basis remains the default and the high-accuracy
    option)."""

    def oa_step(A_dw, X_dw, refine_close=False):
        """One refinement step.  Returns (lam, X_new, err_lam, err_s):
        the errs are the acceptance-gauge quantities of the INPUT X
        (computed from the step's own S/R products, so a convergence
        loop gets them for free -- see _gauge for their meaning)."""
        Xt = (X_dw[0].T, X_dw[1].T)
        AX = _mm_dw_real(A_dw, X_dw)
        S = _mm_dw_real(Xt, AX)
        XtX = _mm_dw_real(Xt, X_dw)
        n = X_dw[0].shape[0]
        eye = jnp.eye(n, dtype=X_dw[0].dtype)
        Rh, re = zl.two_sum(eye, -XtX[0])
        Rl = re - XtX[1]
        # lam = diag(S) / (1 - diag(R)) in dw
        num = (jnp.diagonal(S[0]), jnp.diagonal(S[1]))
        dh, de = zl.two_sum(jnp.ones((n,), eye.dtype),
                            -jnp.diagonal(Rh))
        den = (dh, de - jnp.diagonal(Rl))
        rh, rl = _dw_recip_real(den)
        lh, le = zl.two_prod(num[0], rh)
        lam = (lh, le + num[0] * rl + num[1] * rh)
        # E from collapsed dw values (the corrections are ~1e-7-sized, so
        # the f32 collapse keeps ~1e-14 absolute accuracy)
        S32 = S[0] + S[1]
        R32 = Rh + Rl
        lam32 = lam[0] + lam[1]
        scale = jnp.max(jnp.abs(lam32))
        # gauge quantities of the input X (free: S/lam already in hand)
        s_abs = jnp.abs(S32) * (1.0 - eye)
        adl_g = jnp.abs((lam[0][None, :] - lam[0][:, None])
                        + (lam[1][None, :] - lam[1][:, None]))
        g_scale = jnp.maximum(scale, 1e-30)
        err_lam = jnp.max(jnp.minimum(
            s_abs * s_abs / jnp.maximum(adl_g, 1e-30), s_abs)) / g_scale
        err_s = jnp.max(s_abs) / g_scale
        if refine_close:
            # warm seeds carry within-cluster mixing from the Fock step
            # that the cold path never has (the f32 eigh resolves pairs
            # to eps32 ABSOLUTE, so sub-cluster_tol pairs are already
            # paired); refine pairing wherever the gap is representable.
            # dl from the dw halves: the hi difference of close values is
            # EXACT (Sterbenz), so dl is ~1e-14*scale accurate where the
            # collapsed-f32 difference would be pure cancellation noise.
            dl = ((lam[0][None, :] - lam[0][:, None])
                  + (lam[1][None, :] - lam[1][:, None]))
            sep = jnp.abs(dl) > _WARM_DEG_REL * scale
            # clamp the Jacobi-like update: a pair mixed harder than its
            # gap supports (|E| ~ s/dl > 0.5) must iterate, not explode
            E_rot = jnp.clip((S32 + lam32[None, :] * R32)
                             / jnp.where(sep, dl, 1.0), -0.5, 0.5)
        else:
            dl = lam32[None, :] - lam32[:, None]
            sep = jnp.abs(dl) > cluster_tol * scale
            E_rot = (S32 + lam32[None, :] * R32) / jnp.where(sep, dl, 1.0)
        E = jnp.where(sep, E_rot, R32 / 2.0)
        E = jnp.where(eye > 0, jnp.diag(jnp.diagonal(R32) / 2.0), E)
        XE = jnp.matmul(X_dw[0], E, precision=_HIGHEST)
        xh, xe = zl.two_sum(X_dw[0], XE)
        return lam, (xh, X_dw[1] + xe), err_lam, err_s

    def refine_loop(A_dw, X_seed, max_steps):
        """Clamped refinement to tolerance: iterate refine_close steps,
        each followed by a Newton-Schulz polar re-orthonormalization,
        until the input-X residual coupling passes _ROBUST_S_EXIT or the
        budget runs out.  On dense spectra a bf16-grade seed saturates
        the clamp on MANY pairs at once, so the raw update's norm is
        unbounded and the plain iteration DIVERGES (e58b at N=2000:
        NaN by step 10; the e58 N=1000 convergence was marginal).  The
        NS step X <- X (3I - X^T X)/2 keeps the iterate on the Stiefel
        manifold: the f64 prototype (e58c) then converges in 8 steps to
        err_s ~1e-15 at N=2000 from the exact e57-measured 5e-3 seed
        grade.  Warm SCF seeds exit in 2-4 steps.  The lam returned is
        the Rayleigh quotient of the last input X; the returned X is
        one step better (same convention as the fixed-count paths)."""
        def cond(carry):
            lam, X, err_lam, err_s, i = carry
            return jnp.logical_and(i < max_steps,
                                   err_s > _ROBUST_S_EXIT)

        def ns_polar(X):
            """X (3I - X^T X)/2 with the correction applied in dw: the
            residual R = I - X^T X is computed double-word and the
            f32-collapsed X @ (R/2) product added with TwoSum carry --
            the same precision pattern as oa_step's E update."""
            XtX = _mm_dw_real((X[0].T, X[1].T), X)
            n = X[0].shape[0]
            eye = jnp.eye(n, dtype=X[0].dtype)
            Rh, re = zl.two_sum(eye, -XtX[0])
            R32 = (Rh + (re - XtX[1])) * 0.5
            XR = jnp.matmul(X[0], R32, precision=_HIGHEST)
            xh, xe = zl.two_sum(X[0], XR)
            return xh, X[1] + xe

        def body(carry):
            _, X, _, _, i = carry
            lam, X_new, err_lam, err_s = oa_step(A_dw, X,
                                                 refine_close=True)
            X_new = ns_polar(X_new)
            return lam, X_new, err_lam, err_s, i + 1

        n = X_seed[0].shape[0]
        dt = X_seed[0].dtype
        init = ((jnp.zeros((n,), dt), jnp.zeros((n,), dt)), X_seed,
                jnp.asarray(jnp.inf, dt), jnp.asarray(jnp.inf, dt),
                jnp.asarray(0, jnp.int32))
        lam, X_dw, _, _, n_steps = jax.lax.while_loop(cond, body, init)
        return lam, X_dw, n_steps

    def _gauge(A_dw, X_dw, lam):
        """Warm-seed acceptance bounds from the refined residual couplings.

        s_ij = |X^T A X|_offdiag (ALL pairs, no cluster exclusion): per
        2x2 perturbation theory the eigenvalue error is min(s^2/|dl|, s)
        (the quadratic form saturates at s when s >~ dl), and s itself is
        the pair's A-invariance residual -- the quantity that drives the
        resolvent assembly's error.  The COLD basis (backward-stable f32
        eigh) ships s ~ eps32*scale on its tightest pairs and is
        device-validated at ~4e-7 end-to-end (e53), so a warm basis with
        s under that level is at-least-cold quality everywhere.
        Returns (err_lam, err_s), both relative to scale."""
        AX = _mm_dw_real(A_dw, X_dw)
        S = _mm_dw_real((X_dw[0].T, X_dw[1].T), AX)
        n = X_dw[0].shape[0]
        eye = jnp.eye(n, dtype=X_dw[0].dtype)
        s = jnp.abs(S[0] + S[1]) * (1.0 - eye)
        lam32 = lam[0] + lam[1]
        scale = jnp.maximum(jnp.max(jnp.abs(lam32)), 1e-30)
        adl = jnp.abs((lam[0][None, :] - lam[0][:, None])
                      + (lam[1][None, :] - lam[1][:, None]))
        err_lam = jnp.max(jnp.minimum(
            s * s / jnp.maximum(adl, 1e-30), s)) / scale
        err_s = jnp.max(s) / scale
        return err_lam, err_s

    if seeded:
        @jax.jit
        def f(H_dw, X_seed, Sm12_dw=None):
            A_dw = H_dw
            if has_overlap:
                A_dw = _mm_dw_real(Sm12_dw, _mm_dw_real(H_dw, Sm12_dw))
            # to-tolerance clamped loop: a warm SCF seed exits in 2-4
            # steps; a seed mixed O(1) on its tightest pairs (a large
            # Fock step) gets the full budget instead of bouncing off
            # the gauge after a fixed count (the session-6 warm-seed
            # rejections were exactly this)
            lam, X_dw, n_steps = refine_loop(A_dw, X_seed,
                                             _ROBUST_MAX_STEPS)
            err_lam, err_s = _gauge(A_dw, X_dw, lam)
            C_dw = _mm_dw_real(Sm12_dw, X_dw) if has_overlap else X_dw
            return lam, X_dw, C_dw, err_lam, err_s, n_steps
    elif robust:
        @jax.jit
        def f(H_dw, Sm12_dw=None):
            A_dw = H_dw
            if has_overlap:
                A_dw = _mm_dw_real(Sm12_dw, _mm_dw_real(H_dw, Sm12_dw))
            # The TPU f32 eigh (QDWH) has bf16-grade backward error
            # (e57: resid 4.9e-3, lam err 3e-4 at N=2000; its internal
            # matmuls IGNORE jax.default_matmul_precision), so treat it
            # as a SEED exactly like a stale warm basis: clamped
            # refinement to tolerance + the acceptance gauge.  e58: the
            # 5e-3-grade seed converges to err_s ~ 3e-7 in ~10 steps.
            lam32, X32 = jnp.linalg.eigh(A_dw[0])
            X_seed = (X32, jnp.zeros_like(X32))
            lam, X_dw, n_steps = refine_loop(A_dw, X_seed,
                                             _ROBUST_MAX_STEPS)
            err_lam, err_s = _gauge(A_dw, X_dw, lam)
            C_dw = _mm_dw_real(Sm12_dw, X_dw) if has_overlap else X_dw
            return lam, X_dw, C_dw, err_lam, err_s, n_steps
    else:
        @jax.jit
        def f(H_dw, Sm12_dw=None):
            A_dw = H_dw
            if has_overlap:
                A_dw = _mm_dw_real(Sm12_dw, _mm_dw_real(H_dw, Sm12_dw))
            # CAVEAT (e56/e57): the TPU eigh (QDWH) runs its internal
            # matmuls at one-pass bf16 and IGNORES
            # jax.default_matmul_precision (measured identical: lam err
            # 3e-4, resid 4.9e-3 at N=2000 under DEFAULT and HIGHEST).
            # With FIXED UNclamped steps the refinement cannot recover
            # pairs whose seed mixing exceeds their gap (e53: N=1000
            # chain end-to-end 4.3e-7; e57: N=2000 3.7e-4) -- the
            # robust=True variant above replaces this path.
            lam32, X32 = jnp.linalg.eigh(A_dw[0])
            lam = (lam32, jnp.zeros_like(lam32))
            X_dw = (X32, jnp.zeros_like(X32))
            for _ in range(oa_steps):
                lam, X_dw, _, _ = oa_step(A_dw, X_dw)
            C_dw = _mm_dw_real(Sm12_dw, X_dw) if has_overlap else X_dw
            return lam, X_dw, C_dw

    return f


@lru_cache(maxsize=None)
def _build_perm_fn():
    """Jitted column permutation of the basis triple (warm seeds refine in
    the PREVIOUS Fock's eigen-order; downstream bookkeeping -- `_defl_basis`'s
    rank-wise Ritz pairing -- assumes lam ascending)."""
    @jax.jit
    def f(lam_dw, X_dw, C_dw, perm):
        t = lambda v: jnp.take(v, perm, axis=-1)
        return (jax.tree_util.tree_map(t, lam_dw),
                jax.tree_util.tree_map(t, X_dw),
                jax.tree_util.tree_map(t, C_dw))
    return f


# warm-seed thresholds (see _build_device_basis_fn._gauge): the f32
# far-tier assembly needs eigenvalue errors <~ 1e-10*scale (error ~
# lam_err/dist at the dist_f32 floor); the residual coupling gate 3e-7
# ~ 2.5x eps32 is the level a backward-stable f32 eigh (the cold path)
# itself delivers on close pairs.  Pairs with gaps under
# _WARM_DEG_REL*scale are orthonormalize-only (their refined coupling is
# still bounded by the gauge, not excluded from it).
_WARM_LAM_TOL = 1e-10
_WARM_S_TOL = 3e-7
_WARM_DEG_REL = 1e-8
# robust-refinement loop (refine_loop): exit when the input-X residual
# coupling reaches _ROBUST_S_EXIT (the loop's floor is the dw product
# noise, well below _WARM_S_TOL; the margin buys the acceptance gauge
# headroom), bounded by _ROBUST_MAX_STEPS (e58: a bf16-grade 5e-3 seed
# needs ~10 clamped steps; each step is ~4 dw matmuls)
_ROBUST_S_EXIT = 1.0e-7
_ROBUST_MAX_STEPS = 16
# robust acceptance: err_s at the level a backward-stable f32 eigh
# itself delivers (the e53-validated cold-basis grade).  err_lam is
# NOT gated at _WARM_LAM_TOL here: the gauge's min(s^2/gap, s)
# saturates at s on sub-s-gapped clusters, where the eigenvalue error
# is harmless for the resolvent -- near points Ritz-refine the union
# in f64 (_defl_basis), and separated pairs sit at s^2/gap <= 1e-9.
_ROBUST_LAM_TOL = 3e-7
# (N, digest(S), oa_steps, cluster_tol) -> FIFO list of (H_hi f32 host
# snapshot, X_dw device pair).  Two slots per key: spin-unrestricted SCF
# builds TWO Focks per cycle against the same (N, S), and seeding one
# spin's refinement from the other spin's basis would either waste OA
# steps or bounce off the gauge every half-cycle.  Selection is
# nearest-H (Frobenius on the f32 hi parts, ~ms at N=2000); FIFO
# eviction keeps each spin's own predecessor resident.
_WARM_X_CACHE: dict = {}
_WARM_SLOTS = 2


def device_basis(H, S, oa_steps: int = 2, cluster_tol: float = 1e-3,
                 warm: bool = False, dev_put=None, robust: bool = True):
    """Device-side spectral basis: (lam64 host, basis-tree device arrays).

    Returns None when the pencil disqualifies (complex/asymmetric H,
    non-SPD S).  The eigh + refinement run in ONE jit dispatch; only the
    eigenvalues come back to the host (needed for the pole-distance
    partition) -- the O(N^2) eigenvector pair stays device-resident.

    ``warm=True`` seeds the Ogita-Aishima refinement with the previous
    accepted basis for the same (N, S) system (module cache): SCF cycles
    move the Fock slowly, so the seed usually needs only the refinement
    steps -- the f32 eigh (the dominant per-cycle cost at N >~ 2000)
    drops out.  Acceptance is gated on the refined separated-pair
    residual (`_sep_resid`); a rejected seed falls back to the cold path,
    so a large Fock step costs the refinement, never accuracy.

    ``dev_put`` (e.g. EnergyEngine._put_cached) uploads the H/S^{-1/2}
    double-word splits through a content-keyed device cache, so the
    unchanged overlap uploads once per process and the runner's later
    deflation-side ``_H_dw`` put is a cache hit instead of a second
    N^2 transfer."""
    H = np.asarray(H)
    if np.iscomplexobj(H):
        if np.abs(H.imag).max() > 0.0:
            return None
        H = H.real
    H = H.astype(np.float64)
    if np.abs(H - H.T).max() > 1e-10 * max(np.abs(H).max(), 1e-300):
        return None
    S = np.asarray(S, dtype=np.float64)
    has_overlap = not np.allclose(S, np.eye(S.shape[0]), atol=1e-14)
    H_dw = _dw_split_real(H)
    if dev_put is not None:
        H_dw = dev_put(H_dw)
    Sm12_dw = None
    if has_overlap:
        Sm12 = _s_m12_host(S)
        if Sm12 is None:
            return None
        Sm12_dw = _dw_split_real(Sm12)
        if dev_put is not None:
            Sm12_dw = dev_put(Sm12_dw)

    # acceptance thresholds: the robust pipeline gates err_lam at the
    # saturation level (see _ROBUST_LAM_TOL); the legacy fixed-step
    # paths keep the conservative 1e-10 (only passable on coarse
    # spectra -- their original validated regime)
    lam_tol = _ROBUST_LAM_TOL if robust else _WARM_LAM_TOL
    warm_key = None
    H_hi = None
    lam_dw = X_dw = C_dw = None
    device_basis.last_path = "cold"
    device_basis.last_err = None
    device_basis.last_steps = None
    if warm:
        warm_key = (H.shape[0], _digest(S), oa_steps, cluster_tol)
        H_hi = H.astype(np.float32)
        slots = _WARM_X_CACHE.get(warm_key, ())
        seed = None
        if slots:
            dists = [float(np.linalg.norm(H_hi - h)) for h, _ in slots]
            seed = slots[int(np.argmin(dists))][1]
        if seed is not None and seed[0].shape == H.shape:
            sfn = _build_device_basis_fn(has_overlap, max(oa_steps, 1),
                                         cluster_tol, seeded=True)
            args = (H_dw, seed) + ((Sm12_dw,) if has_overlap else ())
            lam_s, X_s, C_s, err_lam, err_s, n_steps = sfn(*args)
            device_basis.last_err = (float(np.asarray(err_lam)),
                                     float(np.asarray(err_s)))
            device_basis.last_steps = int(np.asarray(n_steps))
            if (float(np.asarray(err_lam)) <= lam_tol
                    and float(np.asarray(err_s)) <= _WARM_S_TOL):
                lam_dw, X_dw, C_dw = lam_s, X_s, C_s
                device_basis.last_path = "warm"
            else:
                device_basis.last_path = "rejected"
    if lam_dw is None and robust:
        fn = _build_device_basis_fn(has_overlap, oa_steps, cluster_tol,
                                    robust=True)
        args = (H_dw,) + ((Sm12_dw,) if has_overlap else ())
        lam_r, X_r, C_r, err_lam, err_s, n_steps = fn(*args)
        device_basis.last_err = (float(np.asarray(err_lam)),
                                 float(np.asarray(err_s)))
        device_basis.last_steps = int(np.asarray(n_steps))
        if (float(np.asarray(err_lam)) <= lam_tol
                and float(np.asarray(err_s)) <= _WARM_S_TOL):
            lam_dw, X_dw, C_dw = lam_r, X_r, C_r
        else:
            # gauge failure: this seed/spectrum combination is outside
            # the refinement's reach -- tell the caller (who falls back
            # to the host f64 basis) instead of shipping a bad basis
            device_basis.last_path = "gauge_failed"
            return None
    if lam_dw is None:
        fn = _build_device_basis_fn(has_overlap, oa_steps, cluster_tol)
        args = (H_dw,) + ((Sm12_dw,) if has_overlap else ())
        lam_dw, X_dw, C_dw = fn(*args)

    lam64 = (np.asarray(lam_dw[0], dtype=np.float64)
             + np.asarray(lam_dw[1], dtype=np.float64))
    perm = np.argsort(lam64, kind="stable")
    if not np.array_equal(perm, np.arange(perm.size)):
        lam_dw, X_dw, C_dw = _build_perm_fn()(
            lam_dw, X_dw, C_dw, jnp.asarray(perm.astype(np.int32)))
        lam64 = lam64[perm]
    if warm_key is not None:
        if len(_WARM_X_CACHE) >= 2 and warm_key not in _WARM_X_CACHE:
            _WARM_X_CACHE.pop(next(iter(_WARM_X_CACHE)))
        slots = _WARM_X_CACHE.setdefault(warm_key, [])
        slots.append((H_hi, X_dw))
        if len(slots) > _WARM_SLOTS:
            slots.pop(0)
    return lam64, lam_dw, C_dw


@lru_cache(maxsize=None)
def _build_union_ritz_fns(has_overlap: bool, c: tuple):
    """Jitted device halves of the near-union Rayleigh-Ritz refinement.

    The Ogita-Aishima device basis only ORTHONORMALIZES clusters (any
    orthonormal cluster basis is equivalent for the far resolvent), but
    the analytic pole deflation takes individual near-mode COLUMNS
    (`_k_chain_defl`'s u = Cc[:, idx]) -- cluster-mixed vectors there
    floor the deflated sum at ~4e-5 on device while the refined host
    basis reaches ~4e-7 (e51/e52, round-4 session 5: splicing exact f64
    eigenvalues changes nothing; rotating the union's vectors recovers
    the host floor).  Fix: project the pencil onto the near-mode union
    (plus its cluster padding) in double-word on device, eigh the tiny
    (u, u) block on the host in f64, and rotate the union's columns --
    O(N^2 u) device work + an O(u^3) host eigh, once per (Fock, union).

    `project`: (H_dw, S_dw|None, C_dw, idx) -> (B_dw, M_dw) with
    B = Cu^T H Cu and M = Cu^T S Cu (u x u real dw pairs, tiny D2H).
    `rotate`: (C_dw, Q_dw, idx) -> (C_hi, C_lo, Cc) with the union's
    columns replaced by Cu @ Q and the contact rows re-gathered."""

    @jax.jit
    def project(H_dw, S_dw, C_dw, idx):
        Cu = (jnp.take(C_dw[0], idx, axis=1),
              jnp.take(C_dw[1], idx, axis=1))
        CuT = (Cu[0].T, Cu[1].T)
        B = _mm_dw_real(CuT, _mm_dw_real(H_dw, Cu))
        if has_overlap:
            M = _mm_dw_real(CuT, _mm_dw_real(S_dw, Cu))
        else:
            M = _mm_dw_real(CuT, Cu)
        return B, M

    rows = jnp.asarray(np.asarray(c, dtype=np.int32))

    @jax.jit
    def rotate(C_dw, Q_dw, idx):
        Cu = (jnp.take(C_dw[0], idx, axis=1),
              jnp.take(C_dw[1], idx, axis=1))
        P = _mm_dw_real(Cu, Q_dw)
        Ch = C_dw[0].at[:, idx].set(P[0])
        Cl = C_dw[1].at[:, idx].set(P[1])
        Cc = jnp.take(Ch + Cl, rows, axis=0)
        return Ch, Cl, Cc

    return project, rotate


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

def _sigma_block(e, params, sig_tot_fn, sig_block_fn, c, bg_cc, cdt):
    """M(z) = Sigma_total[c, c] - c0*S[c, c], pinned to the TPU working
    dtype even when params arrive in c128 (x64 CPU test runs): the route's
    accuracy contract is the f32+dw pipeline on every backend."""
    if sig_block_fn is not None:
        M = sig_block_fn(params, e) - bg_cc
    else:
        sig = sig_tot_fn(params, e)
        cix = np.asarray(c, dtype=np.int64)
        M = sig[cix][:, cix] - bg_cc
    return M.astype(cdt)


def _exact_kind(mode):
    """Leading-product quality for zmatmul_dw by grid mode: 'dwl' (the
    default dw tier since round 4) uses reduced-slice Ozaki products
    (~1e-13, ~4x fewer MXU passes -- zlinalg.matmul_ozaki_lite); 'dw'
    keeps the full error-free products (~3.6e-15) for callers that ask
    for them via ExecutionConfig.spectral_dw='full'."""
    return {"f32": False, "dwl": "lite", "dw": True, "defl": False}[mode]


def _k_chain(e_dw, M, basis, mode):
    """The per-point spectral Woodbury chain, shared by every kernel.

    Returns (D, X_dw, Y_dw, G0, K): D = 1/(z'-lam) dw, X = D Cc^T (N, k),
    Y = Cc D (k, N), G0 = Cc D Cc^T, K = (I - M G0)^{-1} M.  The k x k
    chain always runs double-word: it is O(N k^2) and carries the
    near-pole Woodbury conditioning (f32 G0cc near a bare eigenvalue has
    O(|D| * eps) absolute error that a k x k inverse amplifies
    catastrophically -- measured 8e-5 vs 2.4e-6 end to end).  For
    mode='dw' the leading products are error-free (Ozaki) and the inverse
    gets exact-residual steps: |D|-sized intermediates cancel to ~eps^2
    (same lesson as surface_g_sancho_dw, models/chain1d.py)."""
    eh, el = e_dw
    lam_hi = basis["lam_hi"]
    lam_lo = basis["lam_lo"]
    Cc = basis["Cc"]                         # (k, N) real f32
    cdt = eh.dtype

    # D = 1/(z' - lam) in double-word (lam is the exact two-float split of
    # the f64 eigenvalues; z' arrives as a two-float split of the f64 grid)
    dh, de = zl.ctwo_sum(eh, (-lam_hi).astype(cdt))
    dl = el + de - lam_lo.astype(cdt)
    D = _cdw_recip((dh, dl))                 # (N,) dw

    X_dw = _cdw_scale_rows(D, Cc.T)          # (N, k) dw
    Y_dw = _cdw_scale_cols(Cc, D)            # (k, N) dw
    Cc_c = _as_cdw(Cc.astype(cdt))
    M_dw = _as_cdw(M)

    exact = _exact_kind(mode)
    G0 = zl.zmatmul_dw(Cc_c, X_dw, exact=exact)          # (k, k) dw
    MG = zl.zmatmul_dw(M_dw, G0, exact=exact)
    k = Cc.shape[0]
    eye = jnp.eye(k, dtype=cdt)
    A = zl.cdw_sub(_as_cdw(eye), MG)
    if exact:
        Ai = zl.zinv_dw(A[0], A[1], steps=3, exact_steps=2,
                        exact_kind=exact)
    else:
        Ai = zl.zinv_dw(A[0], A[1], steps=2)
    K = zl.zmatmul_dw(Ai, M_dw, exact=exact)             # (k, k) dw
    return D, X_dw, Y_dw, G0, K


def _k_chain_defl(e_dw, M, basis, idx):
    """The deflated Woodbury chain (mode='defl', round-4 session 4).

    The m modes in `idx` (the point's nearest eigenvalues) are removed
    from the bare resolvent and reintroduced ANALYTICALLY via a block
    Sherman-Morrison identity in which every 1/(z-lam_near) cancellation
    resolves in closed form: with delta = z' - lam_near computed in
    double-word, u = Cc[:, idx], A' = I - M G0' (G0' the deflated
    contact-block resolvent) and W = A'^-1 M u, L = u^T A'^-1 M,
    B = u^T W, the capacitance S_m = diag(delta) - B is O(1)-conditioned
    and

        A^-1          = A'^-1 + W S_m^-1 u^T A'^-1
        K u diag(1/d) = W S_m^-1            (no 1/d anywhere)
        diag(1/d) u^T K = S_m^-1 L
        near-near block of Ghat = S_m^-1    (Delta + Delta u^T K u Delta)

    so the f32 assembly serves ARBITRARY pole distances -- including
    exact real-axis hits -- without the dw segment or the LU fallback
    (measured: the round-4 N=1000 bench grid's dist-4.4e-7 point costs
    4.9e-2 through the dw tier but ~1e-7 here).  All products run the
    double-float tier: every intermediate is bounded by 1/gap(m+1), the
    distance to the nearest NON-deflated eigenvalue.

    Returns (Dp, Xp, Yp, G0p, Kf, W, L, Sinv, u_c, onehot): the masked
    bare diagonal, deflated factors, full SM-corrected K, and the
    deflation blocks the kernels assemble from."""
    eh, el = e_dw
    lam_hi = basis["lam_hi"]
    lam_lo = basis["lam_lo"]
    Cc = basis["Cc"]                         # (k, N) real f32
    cdt = eh.dtype
    N = Cc.shape[1]

    # full bare resolvent diagonal, then mask the deflated modes.  The
    # denominator is sanitized to 1 on the masked modes BEFORE the
    # reciprocal: a deflated mode may sit EXACTLY on the grid point
    # (delta = 0 -> 1/0 = inf -> inf * mask = nan)
    dh, de = zl.ctwo_sum(eh, (-lam_hi).astype(cdt))
    dl = el + de - lam_lo.astype(cdt)
    onehot = (lax.iota(jnp.int32, N)[None, :] == idx[:, None]).astype(
        Cc.dtype)                            # (m, N) real, exact
    far = 1.0 - jnp.sum(onehot, axis=0)      # (N,) real {0, 1}
    one = jnp.ones((), cdt)
    D = _cdw_recip((jnp.where(far > 0, dh, one),
                    jnp.where(far > 0, dl, 0.0 * one)))
    Dp = (D[0] * far, D[1] * far)            # (N,) dw, masked
    # delta = z' - lam_near in double-word (the only place the tiny
    # pole distance appears -- exact by construction)
    dlt_h = jnp.sum(onehot * dh[None, :], axis=1)
    dlt_l = jnp.sum(onehot * dl[None, :], axis=1)   # (m,) dw

    Xp = _cdw_scale_rows(Dp, Cc.T)           # (N, k) dw, bounded
    Yp = _cdw_scale_cols(Cc, Dp)             # (k, N) dw
    Cc_c = _as_cdw(Cc.astype(cdt))
    u = jnp.take(Cc, idx, axis=1)                        # (k, m)
    u_c = _as_cdw(u.astype(cdt))
    uT_c = _as_cdw(u.T.astype(cdt))
    M_dw = _as_cdw(M)

    # The k-chain runs LITE-exact leading products and exact-residual
    # inverse steps: S_m's relative error lands 1:1 on G wherever the
    # near-pole block dominates, and the double-float tier floors at
    # ~5e-7 (zinv_dw's hp-residual floor, bisected round-4 session 4:
    # Sinv at dwf cost 2.25e-3 on the bench's dist-4.4e-7 point).  All
    # of this is O(N k^2) or smaller -- the heavy O(N^2 k) assembly
    # stays on the double-float tier, whose ~8e-8 product error enters
    # G only at bounded magnitudes.
    G0p = zl.zmatmul_dw(Cc_c, Xp, exact="lite")          # (k, k) dw
    MG = zl.zmatmul_dw(M_dw, G0p, exact="lite")
    k = Cc.shape[0]
    eye = jnp.eye(k, dtype=cdt)
    Ap = zl.cdw_sub(_as_cdw(eye), MG)
    Ai = zl.zinv_dw(Ap[0], Ap[1], steps=2, exact_steps=1,
                    exact_kind="lite")
    Kp = zl.zmatmul_dw(Ai, M_dw, exact="lite")           # A'^-1 M
    W = zl.zmatmul_dw(Ai, zl.zmatmul_dw(M_dw, u_c, exact="lite"),
                      exact="lite")                      # (k, m)
    L = zl.zmatmul_dw(uT_c, Kp, exact="lite")            # (m, k)
    B = zl.zmatmul_dw(L, u_c, exact="lite")              # (m, m)
    S_m = zl.cdw_sub((jnp.diag(dlt_h), jnp.diag(dlt_l)), B)
    Sinv = zl.zinv_dw(S_m[0], S_m[1], steps=2, exact_steps=2,
                      exact_kind="lite")
    Kf = zl.cdw_add2(Kp, zl.zmatmul_dw(
        zl.zmatmul_dw(W, Sinv, exact="lite"), L, exact="lite"))
    return Dp, Xp, Yp, G0p, Kf, W, L, Sinv, u_c, onehot


def _point_factors_defl(e_dw, w, idx, params, sig_tot_fn, sig_block_fn,
                        c, bg_cc, basis):
    """One deflated retarded point -> (X_ext, Z_ext, D', w).

    Ghat - D' = [X', P] @ [K Y' + W S_m^-1 P^T ;
                           S_m^-1 L Y' + S_m^-1 P^T]
    with P the (N, m) near-mode selector, so the chunk stacks into ONE
    (N, ch*(k+m)) @ (ch*(k+m), N) matmul exactly like the plain modes."""
    eh, _ = e_dw
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc,
                     eh.dtype)
    Dp, Xp, Yp, _, Kf, W, L, Sinv, _, onehot = _k_chain_defl(
        e_dw, M, basis, idx)
    P_c = _as_cdw(onehot.astype(eh.dtype))               # (m, N)
    WS = zl.zmatmul_dw(W, Sinv)                          # (k, m)
    R1 = zl.cdw_add2(zl.zmatmul_dw(Kf, Yp), zl.zmatmul_dw(WS, P_c))
    R2 = zl.zmatmul_dw(Sinv, zl.cdw_add2(zl.zmatmul_dw(L, Yp), P_c))
    Z = (jnp.concatenate([R1[0], R2[0]], axis=0),
         jnp.concatenate([R1[1], R2[1]], axis=0))        # (k+m, N)
    Z = _cdw_smul_single(w, Z)
    Pt = onehot.T.astype(eh.dtype)
    X = (jnp.concatenate([Xp[0], Pt], axis=1),
         jnp.concatenate([Xp[1], jnp.zeros_like(Pt)], axis=1))
    return X[0] + X[1], Z[0] + Z[1], Dp, w


def _point_gless_factors_defl(e_dw, w, idx, params, sig_tot_fn,
                              sig_block_fn, gamma_fn, c, bg_cc, basis):
    """One deflated G< point -> (Xt, R), same contract as the plain
    kernel: Xt = G P_c in the eigenbasis, with the near modes folded in
    analytically:

        Xt = X' [I + K G0' + W S_m^-1 u^T] + P S_m^-1 [u^T + L G0']."""
    eh, _ = e_dw
    cdt = eh.dtype
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc, cdt)
    _, Xp, _, G0p, Kf, W, L, Sinv, u_c, onehot = _k_chain_defl(
        e_dw, M, basis, idx)
    uT_c = (u_c[0].T, u_c[1].T)
    k = len(c)
    eye = jnp.eye(k, dtype=cdt)
    T1 = zl.cdw_add2(
        zl.cdw_add2(_as_cdw(eye), zl.zmatmul_dw(Kf, G0p)),
        zl.zmatmul_dw(zl.zmatmul_dw(W, Sinv), uT_c))     # (k, k)
    T2 = zl.zmatmul_dw(Sinv, zl.cdw_add2(uT_c, zl.zmatmul_dw(L, G0p)))
    Xt = zl.cdw_add2(zl.zmatmul_dw(Xp, T1),
                     zl.zmatmul_dw((onehot.T.astype(cdt),
                                    jnp.zeros((onehot.shape[1],
                                               onehot.shape[0]), cdt)),
                                   T2))                  # (N, k) dw
    if gamma_fn is not None:
        sig_c = gamma_fn(params, eh)
        cix = np.asarray(c, dtype=np.int64)
        blk = sig_c[cix][:, cix].astype(cdt)
    else:
        blk = M
    gamma = (1j * (blk - jnp.conj(blk).T)).astype(cdt)
    R = zl.zmatmul_dw(_cdw_smul_single(w, _as_cdw(gamma)),
                      zl.cdw_conj_t(Xt))                 # (k, N) dw
    return Xt[0] + Xt[1], R[0] + R[1]


def _point_transmission_defl(e_dw, idx, params, sig_tot_fn, sig_block_fn,
                             g1_fn, g2_fn, c, c1, c2, bg_cc, basis):
    """Deflated T(E): the contact-block Green's function assembles as

        Gcc = G0' + G0' K G0' + (G0' W) S_m^-1 u^T
            + u S_m^-1 (L G0') + u S_m^-1 u^T

    -- every term O(1)-bounded, so near-pole grid points (where the
    plain G0cc overflows the Woodbury cancellation) are exact here."""
    eh, _ = e_dw
    cdt = eh.dtype
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc, cdt)
    _, _, _, G0p, Kf, W, L, Sinv, u_c, _ = _k_chain_defl(
        e_dw, M, basis, idx)
    uT_c = (u_c[0].T, u_c[1].T)
    Gcc = zl.cdw_add2(G0p, zl.zmatmul_dw(G0p, zl.zmatmul_dw(Kf, G0p)))
    Gcc = zl.cdw_add2(Gcc, zl.zmatmul_dw(
        zl.zmatmul_dw(G0p, W), zl.zmatmul_dw(Sinv, uT_c)))
    Gcc = zl.cdw_add2(Gcc, zl.zmatmul_dw(
        u_c, zl.zmatmul_dw(Sinv, zl.zmatmul_dw(L, G0p))))
    Gcc = zl.cdw_add2(Gcc, zl.zmatmul_dw(
        u_c, zl.zmatmul_dw(Sinv, uT_c)))
    G = Gcc[0] + Gcc[1]
    pos = {j: i for i, j in enumerate(c)}
    p1 = np.asarray([pos[int(j)] for j in c1], dtype=np.int64)
    p2 = np.asarray([pos[int(j)] for j in c2], dtype=np.int64)
    G12 = G[p1][:, p2]
    s1 = g1_fn(params, eh)
    s2 = g2_fn(params, eh)
    ix1 = np.ix_(np.asarray(c1), np.asarray(c1))
    ix2 = np.ix_(np.asarray(c2), np.asarray(c2))
    gamma1 = (1j * (s1[ix1] - jnp.conj(s1[ix1]).T)).astype(cdt)
    gamma2 = (1j * (s2[ix2] - jnp.conj(s2[ix2]).T)).astype(cdt)
    return jnp.real(jnp.trace(gamma1 @ G12 @ gamma2 @ jnp.conj(G12).T))


def _point_factors(e_dw, w, params, sig_tot_fn, sig_block_fn, c, bg_cc,
                   basis, mode):
    """One retarded-sum point -> (X, Z (or dw pairs), D, w).

    X = D Cc^T (N, k), Z = w * K (Cc D) (k, N); the caller stacks the
    chunk and performs sum_j X_j Z_j as ONE matmul."""
    eh, _ = e_dw
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc,
                     eh.dtype)
    D, X_dw, Y_dw, _, K = _k_chain(e_dw, M, basis, mode)
    exact = _exact_kind(mode)
    Z_dw = _cdw_smul_single(
        w, zl.zmatmul_dw(K, Y_dw, exact=exact))          # (k, N) dw
    if mode == "f32":
        return X_dw[0], Z_dw[0] + Z_dw[1], D, w
    return X_dw, Z_dw, D, w


def _point_gless_factors(e_dw, w, params, sig_tot_fn, sig_block_fn,
                         gamma_fn, c, bg_cc, basis, mode):
    """One G< point -> (Xt, R): G Gamma G^H = C [Xt (w Gamma) Xt^H] C^T.

    Xt = G P_c in the eigenbasis = D Cc^T (I + K G0cc) (N, k); Gamma is
    i(sig_c - sig_c^H) on the contact block (the broadening background's
    ~1e-9 Gamma is neglected, matching _point_gless_weighted_lowrank).
    R = (w Gamma) Xt^H so the chunk stacks into ONE (N, ch k)@(ch k, N)."""
    eh, _ = e_dw
    cdt = eh.dtype
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc, cdt)
    _, X_dw, _, G0, K = _k_chain(e_dw, M, basis, mode)
    exact = _exact_kind(mode)
    k = len(c)
    eye = jnp.eye(k, dtype=cdt)
    T_k = zl.cdw_add2(_as_cdw(eye),
                      zl.zmatmul_dw(K, G0, exact=exact))   # I + K G0cc
    Xt = zl.zmatmul_dw(X_dw, T_k, exact=exact)             # (N, k) dw
    if gamma_fn is not None:
        sig_c = gamma_fn(params, eh)
        cix = np.asarray(c, dtype=np.int64)
        blk = sig_c[cix][:, cix].astype(cdt)
    else:
        blk = M
    gamma = (1j * (blk - jnp.conj(blk).T)).astype(cdt)
    R = zl.zmatmul_dw(_cdw_smul_single(w, _as_cdw(gamma)),
                      zl.cdw_conj_t(Xt), exact=exact)      # (k, N) dw
    if mode == "f32":
        # collapse hi+lo: zmatmul_dwf's hi alone is the HALF-precision
        # Veltkamp partial (p1 of the split scheme, ~2^-12 relative) --
        # returning Xt[0] un-collapsed cost 3e-4 on every f32 G< point
        # (found round-4 session 3 via the controlled-dist error study)
        return Xt[0] + Xt[1], R[0] + R[1]
    return Xt, R


def _point_transmission_sp(e_dw, params, sig_tot_fn, sig_block_fn,
                           g1_fn, g2_fn, c, c1, c2, bg_cc, basis, mode):
    """T(E) entirely in the contact subspace: O(N k^2) per point.

    Gcc = G0cc + G0cc K G0cc; T = Re tr(Gamma1 Gcc[p1, p2] Gamma2
    Gcc[p1, p2]^H) with p1/p2 the positions of c1/c2 inside the union
    support (parity with _point_transmission_lowrank, which neglects the
    broadening background's Gamma).  The whole point is O(N k^2) -- there
    is no heavy term to protect, so the assembly always runs with
    exact-family leading products regardless of the grid mode (f32 Gcc
    assembly costs ~1e-5 on T via trace cancellation; the lite tier
    holds ~1e-7; mode='dw' keeps the full error-free products)."""
    eh, _ = e_dw
    cdt = eh.dtype
    M = _sigma_block(eh, params, sig_tot_fn, sig_block_fn, c, bg_cc, cdt)
    kind = "dw" if mode == "dw" else "dwl"
    ex = _exact_kind(kind)
    _, _, _, G0, K = _k_chain(e_dw, M, basis, kind)
    Gcc = zl.cdw_add2(G0, zl.zmatmul_dw(
        G0, zl.zmatmul_dw(K, G0, exact=ex), exact=ex))
    G = Gcc[0] + Gcc[1]
    pos = {j: i for i, j in enumerate(c)}
    p1 = np.asarray([pos[int(j)] for j in c1], dtype=np.int64)
    p2 = np.asarray([pos[int(j)] for j in c2], dtype=np.int64)
    G12 = G[p1][:, p2]
    s1 = g1_fn(params, eh)
    s2 = g2_fn(params, eh)
    ix1 = np.ix_(np.asarray(c1), np.asarray(c1))
    ix2 = np.ix_(np.asarray(c2), np.asarray(c2))
    gamma1 = (1j * (s1[ix1] - jnp.conj(s1[ix1]).T)).astype(cdt)
    gamma2 = (1j * (s2[ix2] - jnp.conj(s2[ix2]).T)).astype(cdt)
    return jnp.real(jnp.trace(gamma1 @ G12 @ gamma2 @ jnp.conj(G12).T))


def _chunk_corr(Xs, Zs, mode):
    """sum_j X_j Z_j over the chunk as one stacked matmul -> (N, N) (dw)."""
    if mode in ("f32", "defl"):
        corr = jnp.einsum("cnk,ckm->nm", Xs, Zs, precision=_HIGHEST)
        return _as_cdw(corr)
    (Xh, Xl), (Zh, Zl) = Xs, Zs
    ch, N, k = Xh.shape
    Xh = jnp.moveaxis(Xh, 0, 1).reshape(N, ch * k)
    Xl = jnp.moveaxis(Xl, 0, 1).reshape(N, ch * k)
    Zh = Zh.reshape(ch * k, -1)
    Zl = Zl.reshape(ch * k, -1)
    # exact-family leading term: the near-pole diagonal of this product
    # cancels against D to ~|result|/|D| -- a dwf leading term's
    # f32-accumulation floor re-breaks what the exact k-chain above just
    # preserved.  'dwl' uses the lite products (~1e-13 * |D| <= 1e-8 over
    # the dw range dist >= dist_lu) at ~4x fewer MXU passes.
    return zl.zmatmul_dw((Xh, Xl), (Zh, Zl), exact=_exact_kind(mode))


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
    if mode in ("f32", "defl"):
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
def _build_spectral_sum_engine(kind: str, sig_tot_fn, sig_block_fn,
                               gamma_fn, c: tuple,
                               exec_cfg: ExecutionConfig,
                               mesh: Optional[Mesh], modes: tuple,
                               epilog=None):
    """Jitted sum engine over one or more MODE SEGMENTS:
    (params_s, basis, bg_cc_s, segs_s) -> split, where segs_s is a tuple
    of per-segment ((E_hi, E_lo), w) grids, one per entry of `modes`.

    kind='gr': sum_j w_j G(E_j) (bare-resolvent diagonal + rank-k
    corrections); kind='gless': sum_j w_j [G Gamma G^H](E_j) (sandwich
    only, no diagonal term).  Each segment is laid out (nd, nch, ch) as
    a two-float split of the f64 grid and scanned with its own product
    tier; all segments accumulate into ONE shared double-word carry, so
    a real-axis grid pays the dw machinery only for its near-pole points
    (host-partitioned by pole distance) in a single dispatch/transfer.
    The output collapses hi+lo into one split-complex array (or its
    imaginary part for epilog='im', halving the transfer: the
    single-word tiers cannot represent the lo part anyway)."""

    def point(mode, e_dw, w, idx, params, bg_cc, basis):
        if kind == "gr":
            if mode == "defl":
                return _point_factors_defl(e_dw, w, idx, params,
                                           sig_tot_fn, sig_block_fn, c,
                                           bg_cc, basis)
            return _point_factors(e_dw, w, params, sig_tot_fn,
                                  sig_block_fn, c, bg_cc, basis, mode)
        if mode == "defl":
            Xt, R = _point_gless_factors_defl(e_dw, w, idx, params,
                                              sig_tot_fn, sig_block_fn,
                                              gamma_fn, c, bg_cc, basis)
        else:
            Xt, R = _point_gless_factors(e_dw, w, params, sig_tot_fn,
                                         sig_block_fn, gamma_fn, c, bg_cc,
                                         basis, mode)
        return Xt, R, None, None

    def device_body(params, basis, bg_cc, segs, varying=False):
        N = basis["C_hi"].shape[0]
        cdt = segs[0][0][0].dtype

        def scan_fn_for(mode, has_idx):
            def scan_fn(carry, inputs):
                if has_idx:
                    eh, el, wb, ixb = inputs
                else:
                    eh, el, wb = inputs
                    ixb = None
                Xs, Zs, Ds, _ = jax.vmap(
                    lambda a, b, ww, ix: point(mode, (a, b), ww, ix,
                                               params, bg_cc, basis)
                )(eh, el, wb, ixb) if has_idx else jax.vmap(
                    lambda a, b, ww: point(mode, (a, b), ww, None,
                                           params, bg_cc, basis)
                )(eh, el, wb)
                corr = _chunk_corr(Xs, Zs, mode)
                (Sh, Sl), (gh, gl) = carry
                Sh2, e = zl.ctwo_sum(Sh, corr[0])
                Sl2 = Sl + corr[1] + e
                if kind == "gr":
                    dsum = _chunk_diag(Ds, wb, mode)
                    gh2, eg = zl.ctwo_sum(gh, dsum[0])
                    gl2 = gl + dsum[1] + eg
                else:
                    gh2, gl2 = gh, gl
                return ((Sh2, Sl2), (gh2, gl2)), None
            return scan_fn

        z2 = (jnp.zeros((N, N), cdt), jnp.zeros((N, N), cdt))
        zd = (jnp.zeros((N,), cdt), jnp.zeros((N,), cdt))
        carry = (z2, zd)
        if varying:
            carry = jax.tree_util.tree_map(
                lambda x: _pvary(x, (ENERGY_AXIS,)), carry)
        for mode, seg in zip(modes, segs):
            (Eh, El), w = seg[0], seg[1]
            if len(seg) > 2:
                xs = (Eh, El, w, seg[2])
            else:
                xs = (Eh, El, w)
            carry, _ = lax.scan(scan_fn_for(mode, len(seg) > 2), carry, xs)
        return carry

    def finalize(basis, Shat, diag):
        Ph, Pl = _rotate(basis, Shat, diag, modes[-1])
        out = Ph + Pl
        return split_traced(jnp.imag(out) if epilog == "im" else out)

    def _merge_segs(segs_s):
        segs = merge_tree(segs_s)
        out = []
        for seg in segs:
            (Eh, El), w = seg[0], seg[1]
            if len(seg) > 2:
                out.append(((Eh[0], El[0]), w[0], seg[2][0]))
            else:
                out.append(((Eh[0], El[0]), w[0]))
        return tuple(out)

    if mesh is None:
        @jax.jit
        def engine(params_s, basis, bg_cc_s, segs_s):
            params, bg_cc = merge_tree((params_s, bg_cc_s))
            Shat, diag = device_body(params, basis, bg_cc,
                                     _merge_segs(segs_s))
            return finalize(basis, Shat, diag)
        return engine

    @jax.jit
    def engine(params_s, basis, bg_cc_s, segs_s):
        def per_device(params_s, basis, bg_cc_s, segs_s):
            params, bg_cc = merge_tree((params_s, bg_cc_s))
            Shat, diag = device_body(params, basis, bg_cc,
                                     _merge_segs(segs_s), varying=True)
            Shat = lax.psum(Shat, ENERGY_AXIS)
            diag = lax.psum(diag, ENERGY_AXIS)
            return finalize(basis, Shat, diag)

        seg_spec = jax.tree_util.tree_map(lambda _: P(ENERGY_AXIS),
                                          segs_s)
        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), seg_spec),
            out_specs=P(),
        )(params_s, basis, bg_cc_s, segs_s)

    return engine


@lru_cache(maxsize=None)
def _build_spectral_trans_engine(sig_tot_fn, sig_block_fn, g1_fn, g2_fn,
                                 c: tuple, c1: tuple, c2: tuple,
                                 exec_cfg: ExecutionConfig,
                                 mesh: Optional[Mesh], mode: str):
    """Jitted map engine: per-point T(E) with O(N k^2) work per point."""

    def device_body(params, basis, bg_cc, E_dw, idx):
        Eh, El = E_dw

        if mode == "defl":
            def scan_fn(_, inputs):
                eh, el, ixb = inputs
                vals = jax.vmap(
                    lambda a, b, ix: _point_transmission_defl(
                        (a, b), ix, params, sig_tot_fn, sig_block_fn,
                        g1_fn, g2_fn, c, c1, c2, bg_cc, basis))(eh, el,
                                                                ixb)
                return None, vals
            xs = (Eh, El, idx)
        else:
            def scan_fn(_, inputs):
                eh, el = inputs
                vals = jax.vmap(
                    lambda a, b: _point_transmission_sp(
                        (a, b), params, sig_tot_fn, sig_block_fn, g1_fn,
                        g2_fn, c, c1, c2, bg_cc, basis, mode))(eh, el)
                return None, vals
            xs = (Eh, El)

        _, vals = lax.scan(scan_fn, None, xs)
        return vals                          # (nch, ch) real

    def _unpack(E_s):
        if mode == "defl":
            (Eh, El), idx = E_s
            return (Eh[0], El[0]), idx[0]
        Eh, El = E_s
        return (Eh[0], El[0]), None

    if mesh is None:
        @jax.jit
        def engine(params_s, basis, bg_cc_s, E_s):
            params, bg_cc, E_m = merge_tree((params_s, bg_cc_s, E_s))
            E_dw, idx = _unpack(E_m)
            return device_body(params, basis, bg_cc, E_dw, idx)[None]
        return engine

    @jax.jit
    def engine(params_s, basis, bg_cc_s, E_s):
        def per_device(params_s, basis, bg_cc_s, E_s):
            params, bg_cc, E_m = merge_tree((params_s, bg_cc_s, E_s))
            E_dw, idx = _unpack(E_m)
            return device_body(params, basis, bg_cc, E_dw, idx)[None]

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS)),
            out_specs=P(ENERGY_AXIS),
        )(params_s, basis, bg_cc_s, E_s)

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
                 mesh: Optional[Mesh], put_fn=None, chunk_auto=False):
        self.exec_cfg = exec_cfg
        self.mesh = mesh
        self.available = False
        struct = detect_structure(provider, S)
        if struct is None:
            return
        if chunk_auto:
            # spectral-specific auto chunk: the engine's live per-lane
            # buffers are the stacked (N, ch*k) factor pairs (~64*k*N B
            # per lane), NOT the LU's 72 N^2 -- the LU heuristic picks
            # chunk 4 at N=4096 and starves the stacked matmuls (e37:
            # 1.14 pts/s).  Largest power of two with 64*ch*k*N <= 2 GB,
            # clamped to [8, 32]
            import dataclasses
            k = max(len(struct.c), 1)
            N = np.asarray(H).shape[-1]
            ch = 8
            while ch * 2 <= 32 and 64 * (ch * 2) * k * N <= 2e9:
                ch *= 2
            exec_cfg = dataclasses.replace(exec_cfg, energy_chunk=ch)
            self.exec_cfg = exec_cfg
        basis_mode = exec_cfg.spectral_basis
        if basis_mode == "auto":
            # 'auto' = the ROBUST device basis on accelerator backends
            # for N >= spectral_basis_device_min_n, host f64 eigh
            # otherwise.  The robust pipeline (clamped refine_close +
            # Newton-Schulz polar re-orthonormalization in a
            # to-tolerance while_loop, commit 9b49482) closed the
            # round-4 accuracy recall on device (e60: N=2000 lam err
            # 2.1e-11, end-to-end truth 5.59e-07 == host exactly); the
            # size gate is a setup-cost race, not accuracy: grids run
            # identically on either basis (both trees device-resident,
            # e61), host evd eigh is 1.8 s at N=2000 but 13.3 s at
            # N=4096 and O(N^3) beyond, while the device pipeline's
            # warm wall stays ~flat -- and the same-window SCF A/B
            # (e63) showed host-basis cycles faster at N=2000.  See
            # BASELINE.md round-5.  A refused robust gauge still falls
            # back to the host basis below, so accuracy never depends
            # on the resolution.
            try:
                on_accel = jax.default_backend() != "cpu"
            except Exception:
                on_accel = False
            min_n = int(getattr(exec_cfg, "spectral_basis_device_min_n",
                                3072) or 0)
            N_pencil = int(np.asarray(H).shape[-1])
            basis_mode = ("device" if (on_accel and N_pencil >= min_n)
                          else "host")
        self._ritz_cache: dict = {}
        out = None
        if basis_mode == "device":
            out = device_basis(
                H, S,
                warm=bool(getattr(exec_cfg, "spectral_warm_basis", False)),
                dev_put=put_fn)
            if out is None:
                # robust gauge refused (or the pencil disqualifies):
                # fall back to the host f64 basis rather than losing the
                # spectral route -- the host path re-checks eligibility
                basis_mode = "host"
        self._basis_is_device = basis_mode == "device"
        if basis_mode == "device":
            lam64, lam_dw, C_dw = out
            self.lam64 = lam64
            basis_tree = {
                "lam_hi": lam_dw[0], "lam_lo": lam_dw[1],
                "C_hi": C_dw[0], "C_lo": C_dw[1],
                "Cc": (C_dw[0] + C_dw[1])[np.asarray(struct.c), :],
            }
            if self._deflate_m() > 0:
                # the deflation's near-union Rayleigh-Ritz refinement
                # (see _build_union_ritz_fns) projects the pencil onto
                # the union on device: keep H (and S when not identity)
                # device-resident as dw pairs (2 f32 N x N each)
                H64 = np.asarray(H)
                H64 = (H64.real if np.iscomplexobj(H64) else H64).astype(
                    np.float64)
                S64 = np.asarray(S, dtype=np.float64)
                self._has_overlap = not np.allclose(
                    S64, np.eye(S64.shape[0]), atol=1e-14)
                self._H_dw = _dw_split_real(H64)
                self._S_dw = (_dw_split_real(S64) if self._has_overlap
                              else None)
                if put_fn is not None:
                    # content-keyed device cache: the H split is the one
                    # device_basis just uploaded (hit), S uploads once
                    self._H_dw = put_fn(self._H_dw)
                    if self._S_dw is not None:
                        self._S_dw = put_fn(self._S_dw)
                elif mesh is not None:
                    from jax.sharding import NamedSharding
                    repl = NamedSharding(mesh, P())
                    self._H_dw = jax.device_put(self._H_dw, repl)
                    if self._S_dw is not None:
                        self._S_dw = jax.device_put(self._S_dw, repl)
            if mesh is not None:
                from jax.sharding import NamedSharding
                basis_tree = jax.device_put(
                    basis_tree, NamedSharding(mesh, P()))
        else:
            basis = spectral_basis(H, S)
            if basis is None:
                return
            lam, C = basis
            self.lam64 = lam
            lam_hi = lam.astype(np.float32)
            C_hi = C.astype(np.float32)
            basis_tree = {
                "lam_hi": lam_hi,
                "lam_lo": (lam - lam_hi.astype(np.float64)).astype(
                    np.float32),
                "C_hi": C_hi,
                "C_lo": (C - C_hi.astype(np.float64)).astype(np.float32),
                "Cc": C[np.asarray(struct.c), :].astype(np.float32),
            }
            if put_fn is not None:
                basis_tree = put_fn(basis_tree)
        self.c0 = struct.c0
        self.c = struct.c
        self.bg_cc_s = split_tree(struct.bg_cc, np.complex64)
        if put_fn is not None:
            self.bg_cc_s = put_fn(self.bg_cc_s)
        self.basis = basis_tree
        self.available = True

    # -- host helpers ----------------------------------------------------

    def _dists(self, E):
        zp = np.asarray(E, dtype=np.complex128) - self.c0
        out = np.empty(zp.size, dtype=np.float64)
        step = max(1, int(4e6 // max(self.lam64.size, 1)))  # bound temp mem
        for i in range(0, zp.size, step):
            blk = zp[i:i + step]
            out[i:i + step] = np.abs(
                blk[:, None] - self.lam64[None, :]).min(axis=1)
        return out

    def _deflate_m(self):
        """Deflated-mode count (0 disables the analytic deflation)."""
        m = int(getattr(self.exec_cfg, "spectral_deflate", 0) or 0)
        return min(m, self.lam64.size) if m > 0 else 0

    def _near_idx(self, E, m):
        """(n, m) int32 nearest-eigenvalue indices per shifted point."""
        zp = np.asarray(E, dtype=np.complex128) - self.c0
        lam = self.lam64
        out = np.empty((zp.size, m), dtype=np.int32)
        step = max(1, int(4e6 // max(lam.size, 1)))
        for i in range(0, zp.size, step):
            blk = np.abs(zp[i:i + step, None] - lam[None, :])
            out[i:i + step] = np.argpartition(
                blk, min(m, lam.size) - 1, axis=1)[:, :m]
        return out

    def _defl_basis(self, idx):
        """Basis for a dispatch that contains a deflated segment.

        Host basis: already f64-exact, returned as-is.  Device basis:
        the near-mode union's columns are only cluster-orthonormalized
        by the Ogita-Aishima refinement, which floors the deflated
        assembly at ~4e-5 on device (e51; splicing exact f64
        eigenvalues changes nothing -- the error is in the VECTORS);
        Rayleigh-Ritz-refine the union plus its cluster padding (e52:
        recovers the host basis's ~4e-7).  Cached per padded union; the
        union is bucket-padded to a multiple of 32 with the nearest
        remaining modes so repeated grids reuse one compiled (u,)-shaped
        kernel pair."""
        if not self._basis_is_device:
            return self.basis
        lam = self.lam64
        union = np.unique(np.asarray(idx, dtype=np.int64).ravel())
        scale = max(np.abs(lam).max(), 1e-300)
        ctol = 1e-3 * scale          # match device_basis's cluster_tol
        dmin = np.abs(lam[:, None] - lam[union][None, :]).min(axis=1)
        mask = dmin < ctol
        mask[union] = True
        u = np.nonzero(mask)[0]
        target = min(lam.size, ((u.size + 31) // 32) * 32)
        if target > u.size:
            rest = np.nonzero(~mask)[0]
            order = np.argsort(dmin[rest], kind="stable")
            u = np.sort(np.concatenate(
                [u, rest[order[:target - u.size]]]))
        key = u.tobytes()
        hit = self._ritz_cache.get(key)
        if hit is not None:
            return hit
        import scipy.linalg as sla
        project, rotate = _build_union_ritz_fns(self._has_overlap, self.c)
        C_dw = (self.basis["C_hi"], self.basis["C_lo"])
        idx_dev = jnp.asarray(u.astype(np.int32))
        B_dw, M_dw = project(self._H_dw, self._S_dw, C_dw, idx_dev)
        B = (np.asarray(B_dw[0], np.float64)
             + np.asarray(B_dw[1], np.float64))
        M = (np.asarray(M_dw[0], np.float64)
             + np.asarray(M_dw[1], np.float64))
        mu, Q = sla.eigh(0.5 * (B + B.T), 0.5 * (M + M.T))
        Ch, Cl, Cc = rotate(C_dw, _dw_split_real(Q), idx_dev)
        lam2 = lam.copy()
        lam2[u] = mu                 # rank-wise pairing: both ascending
        lam_hi = lam2.astype(np.float32)
        tree = dict(self.basis)
        tree.update(
            C_hi=Ch, C_lo=Cl, Cc=Cc, lam_hi=lam_hi,
            lam_lo=(lam2 - lam_hi.astype(np.float64)).astype(np.float32))
        if self.mesh is not None:
            from jax.sharding import NamedSharding
            tree = jax.device_put(tree, NamedSharding(self.mesh, P()))
        if len(self._ritz_cache) >= 8:
            self._ritz_cache.pop(next(iter(self._ritz_cache)))
        self._ritz_cache[key] = tree
        return tree

    def _layout_idx(self, idx):
        """Lay a (n, m) host index array out as (nd, nch, ch, m)."""
        idx = np.asarray(idx, dtype=np.int32)
        n_dev = 1 if self.mesh is None else self.mesh.shape[ENERGY_AXIS]
        chunk = self.exec_cfg.energy_chunk
        per = n_dev * chunk
        n_pad = (-idx.shape[0]) % per
        idx_p = np.concatenate(
            [idx, np.repeat(idx[:1], n_pad, axis=0)], axis=0)
        nch = idx_p.shape[0] // per
        return idx_p.reshape(nch, n_dev, chunk, -1).transpose(1, 0, 2, 3)

    def _mode(self, E):
        """'f32' when every shifted grid point stays dist_f32 away from the
        bare spectrum (|D| bounded => no Woodbury cancellation); 'defl'
        when analytic pole deflation is on and any point is nearer
        (deflation serves arbitrary distances, so there is no 'too close'
        once it is enabled); else the dw tier.

        Without deflation, callers are expected to have split away
        sub-dist_lu points already (split_grid); called on a raw grid this
        returns the mode the spectral part would use, or None when NO
        point qualifies."""
        d = self._dists(E)
        if self._deflate_m() > 0:
            if d.min() >= self.exec_cfg.spectral_dist_f32:
                return "f32"
            return "defl"
        ok = d >= self.exec_cfg.spectral_dist_lu
        if not ok.any():
            return None
        dmin = d[ok].min()
        if dmin >= self.exec_cfg.spectral_dist_f32:
            return "f32"
        return "dw" if self.exec_cfg.spectral_dw == "full" else "dwl"

    def bad_mask(self, E):
        """Per-point mask of grid points the spectral route must NOT serve.

        Empty when analytic deflation is enabled (spectral_deflate > 0):
        the deflated assembly is stable at arbitrary pole distances.
        Otherwise: points closer than dist_lu to a bare eigenvalue (the
        dw Woodbury assembly floors at ~eps_dw * |D| there, while the LU
        engines are well-conditioned -- the contact coupling regularizes
        A) go to the exact-tier LU sibling."""
        d = self._dists(E)
        if self._deflate_m() > 0:
            return np.zeros(d.shape, dtype=bool)
        return d < self.exec_cfg.spectral_dist_lu

    def split_grid(self, E, w):
        """Partition (E, w) into the spectral part and the LU-fallback part.

        Returns ((E_sp, w_sp), (E_lu, w_lu)); E_sp may be empty."""
        E = np.asarray(E, dtype=np.complex128)
        w = np.asarray(w, dtype=np.complex128)
        bad = self.bad_mask(E)
        return (E[~bad], w[~bad]), (E[bad], w[bad])

    def _dw_split_grid(self, E_lay):
        hi = E_lay.astype(np.complex64)
        lo = (E_lay - hi.astype(np.complex128)).astype(np.complex64)
        return (split_tree(hi, np.complex64), split_tree(lo, np.complex64))

    def _fns(self, provider):
        fn, params = provider.total_apply()
        block = getattr(provider, "total_block_apply", None)
        block_fn = block(self.c) if block is not None else None
        return fn, block_fn, params

    def _sum(self, kind, provider, params_split_fn, E, w, contact=None,
             epilog=None):
        from gaunegf_tpu.ops.complexio import merge_host
        from gaunegf_tpu.ops.greens import _layout

        fn, block_fn, params = self._fns(provider)
        gamma_fn = None
        if kind == "gless" and contact is not None:
            gamma_fn, params = provider.contact_apply(contact)
        E = np.asarray(E, dtype=np.complex128)
        if E.size == 0:
            return None
        w = np.asarray(w, dtype=np.complex128)
        # per-point partition by pole distance (sub-dist_lu points were
        # split away by the caller): far points run the cheap f32
        # assembly, near points the dw tier -- both segments scan into
        # ONE shared accumulator in ONE dispatch (f32 first; the last
        # mode picks the rotation flavor, so dw-family must come last).
        # gless partitions 3x more conservatively: the G Gamma G^H
        # sandwich hits the f32 floor earlier (measured 6.1e-6 at 1e-4
        # vs gr's 3.5e-6; 1.4e-6 at 3e-4 -- controlled-dist study,
        # round-4 session 3)
        d = self._dists(E)
        thresh = self.exec_cfg.spectral_dist_f32 * (
            3.0 if kind == "gless" else 1.0)
        far = d >= thresh
        m_defl = self._deflate_m()
        near_mode = ("defl" if m_defl > 0 else
                     ("dw" if self.exec_cfg.spectral_dw == "full"
                      else "dwl"))
        segments = []
        basis = self.basis
        if far.any():
            segments.append(("f32", E[far], w[far], None))
        if (~far).any():
            idx = self._near_idx(E[~far], m_defl) if m_defl > 0 else None
            segments.append((near_mode, E[~far], w[~far], idx))
            if near_mode == "defl":
                basis = self._defl_basis(idx)
        modes = tuple(m for m, _, _, _ in segments)
        segs_s = []
        for _, Es, ws, idx in segments:
            E_lay, w_lay, _, _ = _layout(Es - self.c0, ws, self.mesh,
                                         self.exec_cfg.energy_chunk)
            seg = (self._dw_split_grid(E_lay),
                   split_tree(w_lay.astype(np.complex64), np.complex64))
            if idx is not None:
                seg = seg + (self._layout_idx(idx),)
            segs_s.append(seg)
        eng = _build_spectral_sum_engine(kind, fn, block_fn, gamma_fn,
                                         self.c, self.exec_cfg, self.mesh,
                                         modes, epilog)
        out = merge_host(eng(params_split_fn(params), basis,
                             self.bg_cc_s, tuple(segs_s)))
        return out.astype(np.float64 if epilog == "im" else np.complex128)

    def gr_sum(self, provider, params_split_fn, E, w, epilog=None):
        """sum_j w_j G(E_j) -> (N, N) host array (imag part for 'im')."""
        return self._sum("gr", provider, params_split_fn, E, w,
                         epilog=epilog)

    def gless_sum(self, provider, params_split_fn, E, w, contact=None):
        """sum_j w_j [G Gamma_c G^H](E_j) -> (N, N) complex128."""
        return self._sum("gless", provider, params_split_fn, E, w,
                         contact=contact)

    def transmission(self, provider, params_split_fn, E):
        """Per-point T(E) -> (len(E),) float64, or None if ineligible.

        The caller must have removed bad_mask points already (T is a map,
        not a sum: pathological points cannot be folded into a second
        dispatch here)."""
        from gaunegf_tpu.ops.complexio import merge_host
        from gaunegf_tpu.ops.greens import _layout, _unlayout

        try:
            c1 = tuple(int(j) for j in provider.contact_inds(0))
            c2 = tuple(int(j) for j in provider.contact_inds(-1))
        except Exception:
            return None
        if not (c1 and c2 and set(c1) <= set(self.c)
                and set(c2) <= set(self.c)):
            return None
        fn, block_fn, params = self._fns(provider)
        g1, _ = provider.contact_apply(0)
        g2, _ = provider.contact_apply(-1)
        E = np.asarray(E, dtype=np.complex128)
        mode = self._mode(E)
        if mode is None:
            return None
        E_lay, _, n, _ = _layout(E - self.c0, None, self.mesh,
                                 self.exec_cfg.energy_chunk)
        eng = _build_spectral_trans_engine(fn, block_fn, g1, g2, self.c,
                                           c1, c2, self.exec_cfg,
                                           self.mesh, mode)
        E_s = self._dw_split_grid(E_lay)
        basis = self.basis
        if mode == "defl":
            idx = self._near_idx(E, self._deflate_m())
            E_s = (E_s, self._layout_idx(idx))
            basis = self._defl_basis(idx)
        out = merge_host(eng(params_split_fn(params), basis,
                             self.bg_cc_s, E_s))
        return _unlayout(np.asarray(out), n).astype(np.float64)
