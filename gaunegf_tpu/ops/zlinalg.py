"""Batched complex dense linear algebra for TPU.

Why this module exists
----------------------
The whole NEGF workload is "invert (E*S - H - Sigma(E)) for thousands of E".
The reference does ``jnp.linalg.solve`` per energy (gauNEGF/integrate.py:71,78)
which lowers to a LAPACK/custom LU call.  On TPU:

* complex LU / solve is UNIMPLEMENTED in the backend (as are complex
  host<->device transfers, see ops/complexio.py), and
* the real f32 LU custom call lowers to an unblocked sequential loop that is
  ~1000x slower than the machine's matmul throughput.

So the hot path is a hand-written *blocked* LU solve with partial pivoting,
engineered for XLA:TPU's execution model:

* panel factorization: ONE fused lax.fori_loop per panel doing pivot
  search + swap + rank-1 update, with the permutation composed in-register;
* pivoting applied to the rest of the matrix as a single gather per panel
  (not a swap loop);
* triangular solves and trailing updates as complex matmuls on the MXU;
* diagonal-block triangular inverses by batched block-doubling (one short
  vmapped base loop + log2(bs) matmul levels).

Total sequential-step count per solve is ~N + O(log) instead of the ~5N of
a naive formulation -- the difference between VPU-loop-bound and
MXU-throughput-bound on real hardware.

Precision strategy (TPU has no native f64):
* 'fast'   : complex64 blocked LU.
* 'mixed'  : complex64 blocked LU + Newton iterative refinement of the
             inverse, with residuals computed by double-float ("two-float
             split") matmuls -> typical forward error ~1e-6.
* 'strict' : complex128 via LAPACK (CPU / x64 platforms).

Reference parity: utils.py:12-62 (inv/eig/eigh/fractional_matrix_power).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "zsolve", "zinv", "zinv_refined", "zinv_refined_cols",
    "zinv_dw_cols", "zsolve_dist", "zlu_factor", "zlu_solve",
    "inv", "solve", "eigh", "eig", "fractional_matrix_power",
    "matmul_hp", "matmul_hp3", "supports_lapack_complex",
]

_HI = jax.lax.Precision.HIGHEST
_TRI_BASE = 32          # base block for triangular inversion


def _mm(a, b):
    """Complex/real matmul at full f32 accuracy on the MXU."""
    return jnp.matmul(a, b, precision=_HI)


def _mm_bf3_real(a, b):
    """Real matmul from THREE one-pass bf16 products (~2^-15 relative):
    the i+j<=1 slice terms of _matmul_res_bf16.  Bit-masked splits (see
    _bf_trunc) so XLA cannot elide them."""
    d = lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.DEFAULT)
    a1 = _bf_trunc(a)
    b1 = _bf_trunc(b)
    return d(a1, b1) + (d(a1, b - b1) + d(a - a1, b1))


def _mm_trail(a, b, trail: str):
    """Trailing-update / substitution matmul at the configured budget.

    The blocked LU's FLOP bulk is the trailing updates and the
    substitution products; the factorization only needs them to ~a few
    * 2^-15 (the mixed tier's Newton polish squares the seed error, and
    partial pivoting is insensitive to 1e-4-level perturbations -- the
    round-2 pivot corruption came from ONE-pass bf16 at 2^-8, not from
    split products).  Modes:
      'hi'   -- f32 HIGHEST (6 MXU passes / real product; round-3 default)
      'high' -- lax.Precision.HIGH (3 fused passes, same i+j<=1 algebra)
      'bf3'  -- three explicit one-pass bf16 products (bit-masked splits)
      'kar'  -- 3-multiply Karatsuba complex product at HIGHEST (25%
                fewer real products than the naive 4-product lowering;
                the ~1-digit cancellation loss is far above this floor)
      'kar_high' -- Karatsuba at HIGH (3 products x 3 passes = 9 bf16
                passes vs the naive HIGHEST 24)
    Measured ladder on the tunnel chip at N=2048 (CLAUDE.md): DEFAULT
    18.3 / HIGH 15.1 / HIGHEST 10.4 TFLOP/s."""
    if trail == "hi" or a.dtype in (jnp.complex128, jnp.float64):
        return _mm(a, b)
    if trail == "high":
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGH)
    if trail in ("kar", "kar_high"):
        prec = _HI if trail == "kar" else jax.lax.Precision.HIGH
        if not jnp.iscomplexobj(a):
            return jnp.matmul(a, b, precision=prec)
        ar, ai = jnp.real(a), jnp.imag(a)
        br, bi = jnp.real(b), jnp.imag(b)
        p1 = jnp.matmul(ar, br, precision=prec)
        p2 = jnp.matmul(ai, bi, precision=prec)
        p3 = jnp.matmul(ar + ai, br + bi, precision=prec)
        return (p1 - p2) + 1j * (p3 - (p1 + p2))
    if trail != "bf3":
        raise ValueError(f"unknown trail mode {trail!r}")
    if jnp.iscomplexobj(a):
        ar, ai = jnp.real(a), jnp.imag(a)
        br, bi = jnp.real(b), jnp.imag(b)
        return (_mm_bf3_real(ar, br) - _mm_bf3_real(ai, bi)) \
            + 1j * (_mm_bf3_real(ar, bi) + _mm_bf3_real(ai, br))
    return _mm_bf3_real(a, b)


def _mm_corr(a, b):
    """Newton-correction product X @ R at one-pass-bf16 DEFAULT precision.

    R is already small (~1e-5 of |X|), so the correction tolerates ~3e-3
    relative error (absolute ~1e-8, far below every tier floor) -- and on
    TPU a DEFAULT matmul costs 1 MXU pass vs HIGHEST's 6.  Measured
    round 3 (same-session A/B, N=2000 mixed): 18.2 -> 21.1 pts/s from
    this change alone; accuracy probe unchanged at the digit level.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.DEFAULT)


def _tie_vma(x, ref):
    """Tie x's shard_map varying-ness to ref's (no-op outside shard_map).

    Loop carries initialized from constants (masks, permutations) must not
    mix unvaried inits with data-derived (varying) loop outputs under
    shard_map's vma checking; adding a data-derived zero makes the init
    inherit ref's manual axes without axis names leaking into this module.
    """
    z = jnp.real(ref).ravel()[0] * 0
    if x.dtype == jnp.bool_:
        return x ^ (z != 0)
    return x + z.astype(x.dtype)


def supports_lapack_complex() -> bool:
    """True when the backend has a working complex LU (CPU/GPU LAPACK)."""
    return jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")


# ---------------------------------------------------------------------------
# Triangular inverses: fori base case + batched block-doubling
# ---------------------------------------------------------------------------

def _tri_inv_lower_unit(L):
    """Inverse of a unit-lower-triangular (..., n, n) block, forward subst.

    Row-at-a-time; used only at the _TRI_BASE size (vmapped over blocks).
    A loop-free Neumann-doubling variant (inv(T) = sum (I-T)^i via
    log-doubling products) was built and A/B'd on device round 3: the
    'while' profile bucket barely moved (640 -> 587 ms at N=2000 mixed,
    so these base cases were never the loop cost) AND the intermediate
    powers OVERFLOW f32 for ill-conditioned blocks (a 1e-6 pivot sends
    (I-W)^(2^k) entries past 3e38 -> all-NaN device results at
    near-resonance energies, reproduced on CPU f32).  Substitution keeps
    every intermediate at ~|inv| magnitude; do not revisit."""
    n = L.shape[-1]
    rows = jnp.arange(n)

    def body(j, X):
        lrow = jnp.where(rows < j, L[..., j, :], 0.0)
        xrow = -jnp.einsum("...k,...kn->...n", lrow, X)
        xrow = xrow.at[..., j].add(1.0)
        return X.at[..., j, :].set(xrow)

    X0 = jnp.zeros_like(L)
    return lax.fori_loop(0, n, body, X0)


def _tri_inv_upper(U):
    """Inverse of an upper-triangular (..., n, n) block, back substitution.

    See _tri_inv_lower_unit for why this stays a substitution loop."""
    n = U.shape[-1]
    rows = jnp.arange(n)

    def body(i, X):
        j = n - 1 - i
        urow = jnp.where(rows > j, U[..., j, :], 0.0)
        xrow = -jnp.einsum("...k,...kn->...n", urow, X)
        xrow = xrow.at[..., j].add(1.0)
        xrow = xrow / U[..., j, j][..., None]
        return X.at[..., j, :].set(xrow)

    X0 = jnp.zeros_like(U)
    return lax.fori_loop(0, n, body, X0)


def _tri_inv_fast(T, lower: bool, unit: bool):
    """Inverse of a triangular (..., n, n) matrix by block doubling.

    Level 0: all n/_TRI_BASE diagonal base blocks inverted together (one
    short fori loop, batched).  Each subsequent level merges pairs
    (s -> 2s) with two batched matmuls:
        lower: X21 = -X22 @ T21 @ X11
        upper: X12 = -X11 @ T12 @ X22
    Requires n to be a power-of-two multiple of _TRI_BASE (callers pad).
    """
    n = T.shape[-1]
    if n <= _TRI_BASE:
        return _tri_inv_lower_unit(T) if lower else _tri_inv_upper(T)
    base = _TRI_BASE
    k0 = n // base
    D = _stack_diag(T, base)                      # (..., k0, base, base)
    Xd = _tri_inv_lower_unit(D) if lower else _tri_inv_upper(D)
    X = _scatter_diag(jnp.zeros_like(T), Xd, base)
    s = base
    while s < n:
        # pair combine at size s -> 2s
        Td = _stack_diag_pairs_off(T, s, lower)   # (..., k/2, s, s) off block
        X11 = _stack_diag(X, s)[..., 0::2, :, :]
        X22 = _stack_diag(X, s)[..., 1::2, :, :]
        if lower:
            Xoff = -_mm(X22, _mm(Td, X11))
        else:
            Xoff = -_mm(X11, _mm(Td, X22))
        X = _scatter_pairs_off(X, Xoff, s, lower)
        s *= 2
    return X


def _stack_diag(X, s):
    n = X.shape[-1]
    k = n // s
    Xr = X.reshape(X.shape[:-2] + (k, s, k, s))
    # diagonal over block axes: use einsum-style take via moveaxis+diagonal
    Xd = jnp.diagonal(Xr, axis1=-4, axis2=-2)     # (..., s, s, k)
    return jnp.moveaxis(Xd, -1, -3)               # (..., k, s, s)


def _scatter_diag(X, Xd, s):
    """Add the stacked blocks Xd onto X's (s x s) block diagonal.

    Loop-free one-hot broadcast (the fori `.at[].set` version showed up
    in the round-3 N=2000 profile's while bucket).  Contract: callers
    pass X with ZERO diagonal blocks (the only call site passes zeros),
    so add == set."""
    n = X.shape[-1]
    k = n // s
    eye = jnp.eye(k, dtype=X.dtype)
    term = Xd[..., :, :, None, :] * eye[:, None, :, None]   # (...,k,s,k,s)
    return X + term.reshape(X.shape)


def _stack_diag_pairs_off(X, s, lower: bool):
    """Off-diagonal block of each (2s x 2s) diagonal pair: T21 (lower) or
    T12 (upper) -> (..., k/2, s, s)."""
    n = X.shape[-1]
    k = n // s

    Xr = X.reshape(X.shape[:-2] + (k, s, k, s))
    if lower:
        rows, cols = jnp.arange(1, k, 2), jnp.arange(0, k, 2)
    else:
        rows, cols = jnp.arange(0, k, 2), jnp.arange(1, k, 2)
    # gather (row, col) block pairs
    Xm = jnp.moveaxis(jnp.moveaxis(Xr, -4, 0), -2, 1)  # (k, k, ..., s, s)
    out = Xm[rows, cols]                               # (k/2, ..., s, s)
    return jnp.moveaxis(out, 0, -3)


def _scatter_pairs_off(X, Xoff, s, lower: bool):
    """Add Xoff[i] into the off-diagonal (s x s) block of each (2s x 2s)
    diagonal pair: position (2i+1, 2i) for lower, (2i, 2i+1) for upper.

    Loop-free: place each block at its intra-pair position with a static
    update, then broadcast onto the pair diagonal with a one-hot factor.
    Contract: the target blocks of X are zero at this point of the
    doubling recursion (X holds only finer-level diagonal structure), so
    add == set."""
    n = X.shape[-1]
    k2 = (n // s) // 2
    Xr = X.reshape(X.shape[:-2] + (k2, 2, s, k2, 2, s))
    pairblk = jnp.zeros(X.shape[:-2] + (k2, 2, s, 2, s), X.dtype)
    r2, c2 = (1, 0) if lower else (0, 1)
    pairblk = pairblk.at[..., :, r2, :, c2, :].set(Xoff)   # static indices
    eye = jnp.eye(k2, dtype=X.dtype)
    term = (pairblk[..., :, :, :, None, :, :]
            * eye[:, None, None, :, None, None])
    return (Xr + term).reshape(X.shape)


# ---------------------------------------------------------------------------
# Panel factorization (partial pivoting) - VPU work, one fused loop
# ---------------------------------------------------------------------------

import os

PANEL_UNROLL = int(os.environ.get("GAUNEGF_PANEL_UNROLL", "8"))
# column eliminations fused per loop iteration (bandwidth/dispatch tradeoff)


def _factor_panel(panel, perm0, unroll: int = PANEL_UNROLL):
    """LU-factor an (m, bs) panel with partial pivoting in ONE fused loop.

    Carries (panel, perm).  Each loop iteration eliminates `unroll`
    consecutive columns while the panel stays live in registers/VMEM, so
    the HBM traffic of the sequential phase drops by the unroll factor --
    the panel loop is bandwidth-bound, not flop-bound, on TPU.
    """
    m, bs = panel.shape
    rows = jnp.arange(m)
    cols = jnp.arange(bs)
    while bs % unroll:
        unroll //= 2

    def eliminate(j, panel, perm):
        col = lax.dynamic_index_in_dim(panel, j, axis=1, keepdims=False)
        mag = jnp.where(rows >= j, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag)
        row_j = panel[j, :]
        row_p = panel[p, :]
        panel = panel.at[j, :].set(row_p)
        panel = panel.at[p, :].set(row_j)
        pj, pp = perm[j], perm[p]
        perm = perm.at[j].set(pp)
        perm = perm.at[p].set(pj)
        col = lax.dynamic_index_in_dim(panel, j, axis=1, keepdims=False)
        pivval = col[j]
        safe = jnp.where(pivval == 0, 1.0, pivval)   # padded/singular guard
        l = jnp.where(rows > j, col / safe, 0.0)
        urow = jnp.where(cols > j, panel[j, :], 0.0)
        panel = panel - jnp.outer(l, urow)
        panel = panel.at[:, j].set(jnp.where(rows > j, l, col))
        return panel, perm

    def body(i, state):
        panel, perm = state
        j0 = i * unroll
        for u in range(unroll):
            panel, perm = eliminate(j0 + u, panel, perm)
        return panel, perm

    return lax.fori_loop(0, bs // unroll, body,
                         (panel, _tie_vma(perm0, panel)))


def _factor_panel_virtual(panel, unroll: int = PANEL_UNROLL):
    """Virtually-pivoted panel factorization on a transposed layout.

    Profiling showed the swap-based loop is dominated by lane-dimension
    dynamic indexing (column reads/writes on the last axis force relayout
    passes).  Here the panel lives transposed as (bs, m): column access is
    a cheap sublane-dynamic row read, and instead of physically swapping
    rows we track pivot rows with an availability mask ("virtual
    pivoting").  Per elimination: one narrow row read, one masked-reduce
    pass (pivot-row extraction), one rank-1 pass, one narrow row write.

    The pivot SEQUENCE matches partial pivoting exactly (same argmax over
    the same candidate values); only the row bookkeeping differs.  Returns
    (packed panel in pivoted row order (m, bs), perm) with the same
    contract as _factor_panel.
    """
    m, bs = panel.shape
    pt = panel.T                                   # (bs, m)
    lanes = jnp.arange(m)
    colidx = jnp.arange(bs)
    while bs % unroll:
        unroll //= 2

    def eliminate(j, pt, avail, pivrows):
        col = pt[j, :]                             # (m,) sublane row read
        mag = jnp.where(avail, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag)
        piv = col[p]
        safe = jnp.where(piv == 0, 1.0, piv)       # padded/singular guard
        l = jnp.where(avail & (lanes != p), col / safe, 0.0)
        # full logical row p via one masked reduction over lanes
        urow = jnp.sum(jnp.where((lanes == p)[None, :], pt, 0.0), axis=1)
        u = jnp.where(colidx > j, urow, 0.0)
        pt = pt - jnp.outer(u, l)
        # column j: keep U values on pivoted rows, multipliers elsewhere
        pt = pt.at[j, :].set(jnp.where(avail & (lanes != p), l, col))
        avail = avail & (lanes != p)
        pivrows = pivrows.at[j].set(p.astype(jnp.int32))
        return pt, avail, pivrows

    def body(i, state):
        pt, avail, pivrows = state
        j0 = i * unroll
        for u_ in range(unroll):
            pt, avail, pivrows = eliminate(j0 + u_, pt, avail, pivrows)
        return pt, avail, pivrows

    init = (pt, _tie_vma(jnp.ones((m,), bool), pt),
            _tie_vma(jnp.zeros((bs,), jnp.int32), pt))
    pt, avail, pivrows = lax.fori_loop(0, bs // unroll, body, init)

    # compose the permutation: pivot rows first (in elimination order),
    # then the untouched rows in ascending original order
    rest = jnp.where(avail, size=m - bs)[0].astype(jnp.int32) \
        if m > bs else jnp.zeros((0,), jnp.int32)
    perm = jnp.concatenate([pivrows, rest])
    packed = pt.T[perm, :]
    return packed, perm


PANEL_SPLIT_BASE = int(os.environ.get("GAUNEGF_PANEL_BASE", "32"))
# sub-panel width at which the recursive split bottoms out

_PSTRIP_M_BUCKET = 256
# lane-count rounding for the Pallas strip base case: caps the number of
# distinct (strip, m) kernel shapes Mosaic must compile at N/256 instead
# of one per recursion leaf (the padded lanes are masked out via avail)


def _factor_panel_base_pallas(panel):
    """Pallas strip base case for the split recursion.

    Same contract and pivot sequence as _factor_panel_virtual: the whole
    (m, bs<=32ish) strip is eliminated by ONE VPU-only Pallas program
    (ops/pallas/strip_elim.py) instead of bs XLA fori iterations -- the
    round-3 profile showed the split solve's 'while' bucket is dominated
    by per-iteration sequencing of exactly these rank-1 steps.  Lanes are
    padded to _PSTRIP_M_BUCKET multiples (masked via avail) so the
    recursion's shrinking leaf shapes reuse a few kernel specializations.
    """
    from gaunegf_tpu.ops.pallas.strip_elim import (
        eliminate_strip, pallas_interpret_default)
    if panel.dtype == jnp.complex128:
        # the kernel computes in f32; silently losing ~11 digits on the
        # x64/goldens path is unacceptable -- use the XLA strips there
        return _factor_panel_virtual(panel)
    m, bs = panel.shape
    mp = max(_PSTRIP_M_BUCKET, -(-m // _PSTRIP_M_BUCKET) * _PSTRIP_M_BUCKET)
    pt = panel.T
    if mp != m:
        pt = jnp.pad(pt, ((0, 0), (0, mp - m)))
    avail = _tie_vma(jnp.arange(mp) < m, pt)
    sb, pivrows, avail = eliminate_strip(
        pt, avail, interpret=pallas_interpret_default())
    rest = jnp.where(avail[:m], size=m - bs)[0].astype(jnp.int32) \
        if m > bs else jnp.zeros((0,), jnp.int32)
    perm = jnp.concatenate([pivrows, rest])
    # gather lanes before transposing (transpose-of-gather tickled an XLA
    # CPU RET_CHECK in the transpose-folding pass under vmap+interpret)
    packed = sb[:, perm].T.astype(panel.dtype)
    return packed, perm


def _factor_panel_split(panel, unroll: int = PANEL_UNROLL,
                        base: int = PANEL_SPLIT_BASE,
                        strip_impl: str = "xla"):
    """Recursively split panel factorization: rank-1 work on narrow strips.

    The sequential elimination loop's VPU/bandwidth cost is proportional
    to the width of the strip each rank-1 update touches.  Splitting the
    (m, bs) panel into halves -- factor left, apply the pivots + a block
    update (MXU matmul) to the right, factor right -- bottoms out in
    ``base``-wide virtual-pivot strips, cutting the per-elimination touch
    from bs columns to ``base`` while the deferred inter-strip updates run
    as matmuls.  Same contract as _factor_panel: (packed rows in pivoted
    order, perm).  strip_impl='pallas' (lu_panel='psplit') runs each base
    strip as one Pallas program instead of a fori loop.
    """
    m, bs = panel.shape
    if bs <= base or bs % 2 or (bs // 2) % _TRI_BASE:
        if strip_impl == "pallas":
            return _factor_panel_base_pallas(panel)
        return _factor_panel_virtual(panel, unroll)
    h = bs // 2
    left, permL = _factor_panel_split(panel[:, :h], unroll, base, strip_impl)
    right = panel[:, h:][permL, :]                 # pivots as one gather
    L11 = jnp.tril(left[:h, :], -1) + jnp.eye(h, dtype=panel.dtype)
    U12 = _mm(_tri_inv_fast(L11, lower=True, unit=True), right[:h, :])
    low = right[h:, :] - _mm(left[h:, :], U12)     # deferred block update
    br, permR = _factor_panel_split(low, unroll, base, strip_impl)
    idx = jnp.concatenate(
        [_tie_vma(jnp.arange(h, dtype=permR.dtype), panel), h + permR])
    packed = jnp.concatenate(
        [jnp.concatenate([left[:h, :], left[h:, :][permR, :]], axis=0),
         jnp.concatenate([U12, br], axis=0)], axis=1)
    return packed, permL[idx]


def _cinv_unit_upper(U):
    """Inverse of a unit-upper-triangular complex (n, n) block by
    log-doubling Neumann series (N = U - I nilpotent): 2*ceil(log2 n)
    matmuls, no row loops."""
    n = U.shape[-1]
    eye = jnp.eye(n, dtype=U.dtype)
    Nn = eye - U
    X = eye + Nn
    P = Nn
    steps = int(np.ceil(np.log2(max(n, 2))))
    for _ in range(steps - 1):
        P = _mm(P, P)
        X = X + _mm(X, P)
    return X


def _factor_panel_scan(panel, base: int = PANEL_SPLIT_BASE,
                       strip_impl: str = "xla"):
    """Strip-scanned panel factorization: ONE lax.scan body in the graph.

    Same algorithm as the fused Pallas kernel (virtual pivoting on the
    transposed (bs, m) layout, per-strip rank-1 eliminations, deferred
    inter-strip updates via one-hot MXU contractions) but expressed in
    XLA with fixed shapes: every strip is a dynamic (base, m) slice and
    the deferred update masks to the not-yet-factored rows.  The graph
    holds one strip body instead of _factor_panel_split's recursion tree
    (8 leaves + 7 combine levels at bs=256), which is what made N=2000
    cold compiles take minutes (VERDICT r2 item 2).  Pivot sequence
    matches partial pivoting exactly; extra flops vs 'split' are the
    masked full-width deferred updates (~3% of a solve's total).

    strip_impl='pallas' replaces the inner elimination fori_loop with ONE
    Pallas program per strip (ops/pallas/strip_elim.py): the round-3
    profile put 53% of N=2000 device time in per-iteration while-loop
    overhead, which the in-kernel VMEM-resident loop removes.  No MXU
    work moves into the kernel -- the deferred updates stay here in XLA.
    """
    m, bs = panel.shape
    ns = bs // base
    if bs % base or ns < 2:
        return _factor_panel_virtual(panel)
    pt = panel.T                                    # (bs, m)
    lanes = jnp.arange(m)
    rows_b = jnp.arange(base)
    rows_bs = jnp.arange(bs)

    def eliminate(j, st):
        sb, avail, piv32 = st
        col = lax.dynamic_index_in_dim(sb, j, axis=0, keepdims=False)
        mag = jnp.where(avail, jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag)
        onehot = lanes == p
        pivval = jnp.sum(jnp.where(onehot, col, 0.0))
        safe = jnp.where(pivval == 0, 1.0, pivval)  # padded/singular guard
        keep = avail & ~onehot
        l = jnp.where(keep, col / safe, 0.0)
        u = jnp.sum(jnp.where(onehot[None, :], sb, 0.0), axis=1)
        u = jnp.where(rows_b > j, u, 0.0)
        sb = sb - jnp.outer(u, l)
        rowj = jnp.where(keep, l, col)
        sb = jnp.where((rows_b == j)[:, None], rowj[None, :], sb)
        avail = avail & ~onehot
        piv32 = piv32.at[j].set(p.astype(jnp.int32))
        return sb, avail, piv32

    if strip_impl == "pallas" and panel.dtype == jnp.complex128:
        strip_impl = "xla"           # kernel is f32-only (see strip_elim)
    if strip_impl == "pallas":
        from gaunegf_tpu.ops.pallas.strip_elim import (
            eliminate_strip, pallas_interpret_default)
        _interp = pallas_interpret_default()

    def strip(carry, s):
        pt, avail, pivrows = carry
        s0 = s * base
        sb = lax.dynamic_slice(pt, (s0, 0 * s), (base, m))
        if strip_impl == "pallas":
            sb, piv32, avail = eliminate_strip(sb, avail, interpret=_interp)
        else:
            sb, avail, piv32 = lax.fori_loop(
                0, base, eliminate,
                (sb, avail, _tie_vma(jnp.zeros((base,), jnp.int32), pt)))
        pt = lax.dynamic_update_slice(pt, sb, (s0, 0 * s))
        pivrows = lax.dynamic_update_slice(pivrows, piv32, (s0,))

        # deferred update of the not-yet-factored rows (one-hot MXU
        # contractions over the lane dim; see panel_fused._make_kernel)
        onehotP = (lanes[None, :] == piv32[:, None]).astype(pt.dtype)
        dg = lambda a, b: lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                          precision=_HI)
        Lm = jnp.where(avail[None, :], sb, 0.0)       # (base, m) multipliers
        G = dg(sb, onehotP)                           # strip vals at pivots
        upper = jnp.triu(jnp.ones((base, base), bool), 1)
        L11T = jnp.where(upper, G, 0.0) + jnp.eye(base, dtype=pt.dtype)
        XT = _cinv_unit_upper(L11T)
        U_raw = dg(pt, onehotP)                       # (bs, base)
        W = _mm(U_raw, XT)
        upd = _mm(W, Lm) - _mm(W - U_raw, onehotP)    # update - scatter-in
        later = (rows_bs >= s0 + base)[:, None]
        pt = jnp.where(later, pt - upd, pt)
        return (pt, avail, pivrows), None

    init = (pt, _tie_vma(jnp.ones((m,), bool), pt),
            _tie_vma(jnp.zeros((bs,), jnp.int32), pt))
    (pt, avail, pivrows), _ = lax.scan(strip, init,
                                       jnp.arange(ns, dtype=jnp.int32))
    rest = jnp.where(avail, size=m - bs)[0].astype(jnp.int32) \
        if m > bs else jnp.zeros((0,), jnp.int32)
    perm = jnp.concatenate([pivrows, rest])
    packed = pt.T[perm, :]
    return packed, perm


# ---------------------------------------------------------------------------
# Blocked solve: right-looking LU fused with forward substitution
# ---------------------------------------------------------------------------

def _pick_block(N: int, bs: int | None) -> int:
    """Largest power of two <= min(requested, ~N), floor 8.

    bs None/0 = auto: 256 for N >= 1536 else 128 (measured crossover of
    panel-count amortization vs trailing-update granularity on TPU v5e).
    Small matrices (surface-GF blocks, 9x9 Bethe) get small panels so the
    sequential loops don't run on padding.
    """
    if bs is None:
        from gaunegf_tpu.config import LU_BLOCK_SIZE
        bs = LU_BLOCK_SIZE
    if not bs:
        bs = 256 if N >= 1536 else 128
    cap = min(bs, max(N, 8))
    b = 8
    while b * 2 <= cap:
        b *= 2
    return b


def _pick_panel(N: int, panel_impl: str | None) -> str:
    """Resolve panel_impl 'auto': 'scan' below N=1536, 'split' above.

    Measured round 3 (same session, fresh compile caches): at N=1000 the
    strip-scanned panel wins the headline config (222 vs 197 pts/s) and
    compiles 2.6x faster; at N=2000 the split recursion keeps the lead
    (18.2-18.5 vs scan's best 15.9).  The crossover tracks the lu_block
    auto boundary."""
    if panel_impl in (None, "auto"):
        return "scan" if N < 1536 else "split"
    return panel_impl


def _pad_to(A, Np):
    """Pad A -> block-diag(A, I); padding factors trivially."""
    N = A.shape[-1]
    if Np == N:
        return A
    out = jnp.zeros(A.shape[:-2] + (Np, Np), dtype=A.dtype)
    out = out.at[..., :N, :N].set(A)
    idx = jnp.arange(N, Np)
    return out.at[..., idx, idx].set(1.0)



def _dispatch_panel(panel, panel_impl: str):
    """Shared panel-factorization dispatch for _zsolve_single /
    _zlu_factor_single / zsolve_dist (one place to add an impl)."""
    if panel_impl == "pallas":
        from gaunegf_tpu.ops.pallas.panel_lu import factor_panel_pallas
        return factor_panel_pallas(panel)
    if panel_impl == "fused":
        from gaunegf_tpu.ops.pallas.panel_fused import factor_panel_fused
        return factor_panel_fused(panel)
    if panel_impl == "fused3":
        from gaunegf_tpu.ops.pallas.panel_fused import factor_panel_fused
        return factor_panel_fused(panel, mode="bf16x3")
    if panel_impl == "virtual":
        return _factor_panel_virtual(panel)
    if panel_impl == "split":
        return _factor_panel_split(panel)
    if panel_impl == "scan":
        return _factor_panel_scan(panel)
    if panel_impl == "pstrip":
        return _factor_panel_scan(panel, strip_impl="pallas")
    if panel_impl == "psplit":
        return _factor_panel_split(panel, strip_impl="pallas")
    perm0 = jnp.arange(panel.shape[0], dtype=jnp.int32)
    return _factor_panel(panel, perm0)


def _zsolve_single(A, B, bs: int, panel_impl: str = "split",
                   trail: str = "hi"):
    """Solve A X = B for one (N, N) complex matrix, (N, k) RHS.

    Pure-dataflow right-looking LU fused with forward substitution: the
    working matrix [A | B] shrinks panel by panel (each iteration consumes
    `work` and produces the smaller trailing block), so XLA never has to
    alias-analyze updates into one large buffer -- profiling showed the
    at[].set formulation spent ~25% of device time in copies.  Per panel:
    fused pivoted factorization, ONE permutation gather, L11^-1
    (block-doubling) turning the panel solve + forward substitution into
    matmuls, and the trailing MXU update.  Backward substitution uses
    batched block-doubling inverses of the saved U diagonal blocks.
    """
    N = A.shape[-1]
    k = B.shape[-1]
    n_pad = (-N) % bs
    Np = N + n_pad
    A = _pad_to(A, Np)
    nb = Np // bs

    work = jnp.concatenate(
        [A, jnp.concatenate([B, jnp.zeros((n_pad, k), B.dtype)], axis=0)],
        axis=1)                                     # (Np, Np + k)

    u_rows = []                                     # per panel: (bs, rest+k)
    u_diag = []                                     # per panel: (bs, bs)
    for kb in range(nb):
        panel = work[:, :bs]
        panel, perm = _dispatch_panel(panel, panel_impl)
        rest = work[:, bs:][perm, :]                # one permutation gather
        L11 = jnp.tril(panel[:bs, :], -1) + jnp.eye(bs, dtype=A.dtype)
        Linv = _tri_inv_fast(L11, lower=True, unit=True)
        U12R = _mm_trail(Linv, rest[:bs, :], trail)
        u_diag.append(jnp.triu(panel[:bs, :]))
        u_rows.append(U12R)
        if kb < nb - 1:
            L21 = panel[bs:, :]
            # shrunk trailing block (the LU's FLOP bulk -> trail budget)
            work = rest[bs:, :] - _mm_trail(L21, U12R, trail)

    # backward substitution: X = U^-1 Y with batched diagonal inverses
    Uinv = _tri_inv_fast(jnp.stack(u_diag), lower=False, unit=False)
    X = jnp.zeros((0, k), dtype=B.dtype)
    for ib in range(nb - 1, -1, -1):
        row = u_rows[ib]                            # (bs, rest_ib + k)
        acc = row[:, -k:]
        if X.shape[0] > 0:
            acc = acc - _mm_trail(row[:, :X.shape[0]], X, trail)
        X = jnp.concatenate([_mm(Uinv[ib], acc), X], axis=0)
    return X[:N, :]


def _zlu_factor_single(A, bs: int, panel_impl: str = "split",
                       trail: str = "hi"):
    """Factor one (N, N) complex matrix into reusable blocked-LU pieces.

    Same right-looking panel sweep as _zsolve_single but WITHOUT a fused
    RHS: returns per-panel (perm, Linv, L21, U12 rows) plus the batched
    Uinv diagonal inverses, so any number of later RHS can be solved at
    O(N^2 k) without repaying the O(N^3/3) factorization -- the mixed
    tier's _gr_cols refinement previously refactored A for its second
    solve (2 LUs per energy on the transmission hot path).
    """
    N = A.shape[-1]
    n_pad = (-N) % bs
    Np = N + n_pad
    A = _pad_to(A, Np)
    nb = Np // bs

    perms, linvs, l21s, u_rows, u_diag = [], [], [], [], []
    work = A
    for kb in range(nb):
        panel = work[:, :bs]
        panel, perm = _dispatch_panel(panel, panel_impl)
        rest = work[:, bs:][perm, :]
        L11 = jnp.tril(panel[:bs, :], -1) + jnp.eye(bs, dtype=A.dtype)
        Linv = _tri_inv_fast(L11, lower=True, unit=True)
        U12 = _mm_trail(Linv, rest[:bs, :], trail)
        L21 = panel[bs:, :]
        perms.append(perm)
        linvs.append(Linv)
        l21s.append(L21)
        u_rows.append(U12)
        u_diag.append(jnp.triu(panel[:bs, :]))
        if kb < nb - 1:
            work = rest[bs:, :] - _mm_trail(L21, U12, trail)
    Uinv = _tri_inv_fast(jnp.stack(u_diag), lower=False, unit=False)
    return {"perms": tuple(perms), "linvs": tuple(linvs),
            "l21s": tuple(l21s), "u_rows": tuple(u_rows), "uinv": Uinv}


def _zlu_solve_single(data, B, N: int, bs: int):
    """Solve with saved factors: forward substitution panel by panel, then
    the batched-Uinv backward pass (mirrors _zsolve_single's epilog)."""
    k = B.shape[-1]
    nb = len(data["perms"])
    Np = nb * bs
    if Np != N:
        B = jnp.concatenate([B, jnp.zeros((Np - N, k), B.dtype)], axis=0)
    ys = []
    work = B
    for kb in range(nb):
        rest = work[data["perms"][kb], :]
        y = _mm(data["linvs"][kb], rest[:bs, :])
        ys.append(y)
        if kb < nb - 1:
            work = rest[bs:, :] - _mm(data["l21s"][kb], y)
    X = jnp.zeros((0, k), dtype=B.dtype)
    for ib in range(nb - 1, -1, -1):
        acc = ys[ib]
        if X.shape[0] > 0:
            # U12 rows hold [A-trailing | nothing]: slice the columns that
            # multiply the already-solved rows
            acc = acc - _mm(data["u_rows"][ib][:, :X.shape[0]], X)
        X = jnp.concatenate([_mm(data["uinv"][ib], acc), X], axis=0)
    return X[:N, :]


def zlu_factor(A, *, bs: int | None = None, panel_impl: str = "auto",
               trail: str = "hi"):
    """Blocked-LU factorization with reusable factors (see
    _zlu_factor_single); batched over leading dims.  Returns
    {"data": array pytree (batched like A), "N", "bs"}."""
    N = A.shape[-1]
    bs = _pick_block(N, bs)
    panel_impl = _pick_panel(N, panel_impl)
    fn = lambda a: _zlu_factor_single(a, bs, panel_impl, trail)
    for _ in range(A.ndim - 2):
        fn = jax.vmap(fn)
    return {"data": fn(A), "N": N, "bs": bs}


def zlu_solve(factors, B):
    """Solve A X = B from zlu_factor output; batched like the factors."""
    N, bs = factors["N"], factors["bs"]
    ndim = factors["data"]["uinv"].ndim - 3
    fn = lambda d, b: _zlu_solve_single(d, b, N, bs)
    for _ in range(ndim):
        fn = jax.vmap(fn)
    return fn(factors["data"], B)


@functools.partial(jax.jit, static_argnames=("bs", "panel_impl", "trail"))
def _zsolve_batched(A, B, bs: int, panel_impl: str = "split",
                    trail: str = "hi"):
    fn = lambda a, b: _zsolve_single(a, b, bs, panel_impl, trail)
    for _ in range(A.ndim - 2):
        fn = jax.vmap(fn)
    return fn(A, B)


def zsolve(A, B, *, method: str | None = None, bs: int | None = None,
           panel_impl: str = "auto", trail: str = "hi"):
    """Solve A X = B for batched complex A.

    method: None (auto), 'lapack' or 'blocked'.
    Auto picks LAPACK on CPU/GPU and the blocked MXU kernel on TPU.
    panel_impl: 'xla' (fused fori loop) or 'pallas' (VMEM-resident kernel).
    trail: trailing-update matmul budget (see _mm_trail).
    """
    if method is None:
        method = "lapack" if supports_lapack_complex() else "blocked"
    if method == "lapack":
        return jnp.linalg.solve(A, B)
    bs = _pick_block(A.shape[-1], bs)
    panel_impl = _pick_panel(A.shape[-1], panel_impl)
    return _zsolve_batched(A, B, bs, panel_impl, trail)


def zinv(A, *, method: str | None = None, bs: int | None = None,
         panel_impl: str = "auto", trail: str = "hi"):
    """Batched complex inverse (reference utils.py:52-54 ``inv``)."""
    N = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(N, dtype=A.dtype), A.shape)
    return zsolve(A, eye, method=method, bs=bs, panel_impl=panel_impl,
                  trail=trail)


# ---------------------------------------------------------------------------
# High-precision residual matmul (double-float split) and refinement
# ---------------------------------------------------------------------------

def _split_hi(x):
    """Split an f32 array into a high part with 12-bit mantissa (exact
    products of two high parts fit in f32)."""
    xi = lax.bitcast_convert_type(x, jnp.uint32)
    hi = lax.bitcast_convert_type(xi & np.uint32(0xFFFFF000), jnp.float32)
    return hi, x - hi


def _matmul_hp_real(a, b):
    """f32 matmul with double-float error compensation: returns (hi, lo)
    such that hi + lo ~= a @ b to near the f32-accumulation floor."""
    a_hi, a_lo = _split_hi(a)
    b_hi, b_lo = _split_hi(b)
    p1 = jnp.matmul(a_hi, b_hi, precision=_HI)
    p2 = jnp.matmul(a_hi, b_lo, precision=_HI)
    p3 = jnp.matmul(a_lo, b_hi, precision=_HI)
    p4 = jnp.matmul(a_lo, b_lo, precision=_HI)
    return p1, (p2 + p3) + p4


def _bf_trunc(x):
    """Truncate an f32 array to bf16-representable values via BIT MASKING.

    The obvious ``x.astype(bf16).astype(f32)`` is ELIDED by XLA's
    convert-pair simplification around matmuls (caught on device round 3:
    the 'split' degenerated to a single one-pass-bf16 product, 1.5e-2
    residual error); the mask survives every pass.  Truncation (not
    round-to-nearest) keeps x - _bf_trunc(x) exactly representable."""
    xi = lax.bitcast_convert_type(x, jnp.uint32)
    return lax.bitcast_convert_type(xi & np.uint32(0xFFFF0000), jnp.float32)


def _matmul_res_bf16(a, b):
    """~f32-accurate real matmul from SIX one-pass bf16 MXU products.

    Each operand splits into three bf16-exact slices (8 mantissa bits
    each, bit-masked so XLA cannot elide the split); the six slice
    products with i+j <= 2 reconstruct the product to ~2^-24 relative
    (dropped i+j >= 3 terms are <= 2^-24), each accumulating in f32 on
    the MXU.  Versus three HIGHEST (6-pass) products this is 6 passes
    instead of 18 for the same residual quality: measured +31% on the
    N=2000 mixed density sum and +6% at N=1000 (same-session A/B,
    accuracy probe unchanged at 3.6e-6)."""
    d = lambda x, y: jnp.matmul(x, y, precision=jax.lax.Precision.DEFAULT)
    a1 = _bf_trunc(a)
    ra = a - a1
    a2 = _bf_trunc(ra)
    a3 = ra - a2
    b1 = _bf_trunc(b)
    rb = b - b1
    b2 = _bf_trunc(rb)
    b3 = rb - b2
    return d(a1, b1) + (d(a1, b2) + d(a2, b1)) \
        + (d(a1, b3) + d(a2, b2) + d(a3, b1))


def matmul_hp3(a, b):
    """Complex residual-quality matmul: bf16-sliced six-pass real products
    (see _matmul_res_bf16) -- the mixed tier's I - A X primitive."""
    if a.dtype in (jnp.complex128, jnp.float64):
        return jnp.matmul(a, b, precision=_HI)
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    return (_matmul_res_bf16(ar, br) - _matmul_res_bf16(ai, bi)) \
        + 1j * (_matmul_res_bf16(ar, bi) + _matmul_res_bf16(ai, br))


def matmul_hp(a, b):
    """Complex matmul with improved accuracy (double-float partials).

    Used for iterative-refinement residuals where plain f32 product
    rounding would cap the attainable accuracy.  Note the remaining floor
    is the f32 accumulation over the contraction dimension (~sqrt(K)*eps);
    a Karatsuba variant was tried and rejected -- its hi-level
    cancellation costs a decimal digit.
    """
    if a.dtype in (jnp.complex128, jnp.float64):
        # Already double precision (CPU x64 path) - plain matmul suffices.
        return jnp.matmul(a, b, precision=_HI)
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr_h, rr_l = _matmul_hp_real(ar, br)
    ii_h, ii_l = _matmul_hp_real(ai, bi)
    ri_h, ri_l = _matmul_hp_real(ar, bi)
    ir_h, ir_l = _matmul_hp_real(ai, br)
    re = (rr_h - ii_h) + (rr_l - ii_l)
    im = (ri_h + ir_h) + (ri_l + ir_l)
    return re + 1j * im


# ---------------------------------------------------------------------------
# Error-free sliced matmul (Ozaki scheme) for the 'exact' precision tier
# ---------------------------------------------------------------------------

def _exp_ceil(x_absmax):
    """Smallest integer e with |x| <= 2**e, from the f32 exponent field.

    Exact integer bit manipulation -- no log2 rounding concerns."""
    bits = lax.bitcast_convert_type(x_absmax, jnp.uint32)
    e = (bits >> np.uint32(23)).astype(jnp.int32) - 127 + 1
    return jnp.clip(e, -100, 100)


def _pow2(e):
    """Exact 2**e for integer e in [-126, 127] via exponent-field assembly."""
    bits = ((e + 127).astype(jnp.uint32)) << np.uint32(23)
    return lax.bitcast_convert_type(bits, jnp.float32)


def _ozaki_slices(x, axis, s_bits, n_slices):
    """Split x (f32) into n_slices arrays whose elements are integer
    multiples of per-row (or per-column) power-of-two scales, each with at
    most ``s_bits`` significant bits, plus a remainder.

    Alignment is along ``axis`` (the contraction axis): every element in a
    row of A / column of B shares the slice scales, so products of slice i
    of A with slice j of B are integer multiples of a common power of two
    and their K-term dot products accumulate EXACTLY in f32 provided
    2*s_bits + ceil(log2 K) <= 24.
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    e = _exp_ceil(amax)
    slices = []
    rem = x
    for k in range(n_slices):
        # slice k holds bits [k*s, (k+1)*s) below the row exponent e:
        # adding sigma = 2^(e - s*(k+1) + 23) rounds rem to multiples of
        # 2^(e - s*(k+1)), an integer of <= s_bits (+1 for round-up) bits.
        sigma = _pow2(e - s_bits * (k + 1) + 23)
        hi = (rem + sigma) - sigma
        slices.append(hi)
        rem = rem - hi
    return slices, rem


def matmul_ozaki_real(a, b, *, s_bits=None, n_slices=4, slice_prec=None,
                      rem_prec=None):
    """Error-free f32 matmul: returns double-word (hi, lo) with
    hi + lo = a @ b up to ~2^-47 of the row/column dynamic-range scale.

    Ozaki scheme (Ozaki et al., Numer. Algorithms 59, 2012): slice both
    operands into exponent-aligned pieces small enough that every pairwise
    slice product accumulates exactly on the MXU in f32, then combine the
    exact partial products with TwoSum double-word accumulation.  The
    leftover remainders (below 2^-24 of each row/column scale) contribute
    through two ordinary f32 matmuls, keeping the overall error ~1e-13 for
    O(1) operands.  Cost: n_slices^2 + 2 f32 matmuls.

    slice_prec/rem_prec override the matmul precision of the slice
    products / remainder correction (default HIGHEST for both).  The
    slice products are EXACT at one-pass-bf16 DEFAULT too provided
    s_bits <= 7: each slice then has <= 8 significant bits (bf16's
    mantissa), the bf16 conversion is lossless, and the MXU accumulates
    in f32 -- see matmul_ozaki_lite.
    """
    K = a.shape[-1]
    if s_bits is None:
        # exact accumulation condition: 2*s + ceil(log2 K) <= 24 (one bit
        # of slack for the round-to-nearest slice overflow case)
        s_bits = max(1, (23 - int(np.ceil(np.log2(max(K, 2))))) // 2)
        n_slices = int(np.ceil(24 / s_bits)) + 1
    slice_prec = _HI if slice_prec is None else slice_prec
    rem_prec = _HI if rem_prec is None else rem_prec
    sa, ra = _ozaki_slices(a, -1, s_bits, n_slices)
    sb, rb = _ozaki_slices(b, -2, s_bits, n_slices)
    hi = jnp.zeros(a.shape[:-1] + b.shape[-1:], jnp.float32)
    lo = jnp.zeros_like(hi)
    # accumulate exact products in decreasing-magnitude order (i + j)
    for t in range(2 * n_slices - 1):
        for i in range(n_slices):
            j = t - i
            if 0 <= j < n_slices:
                p = jnp.matmul(sa[i], sb[j], precision=slice_prec)
                hi, e = two_sum(hi, p)
                lo = lo + e
    # remainder cross terms (below 2^(-s_bits*n_slices) relative)
    corr = jnp.matmul(ra, b, precision=rem_prec) \
        + jnp.matmul(a - ra, rb, precision=rem_prec)
    hi, e = two_sum(hi, corr)
    lo = lo + e
    return hi, lo


def matmul_ozaki_lite(a, b, *, n_slices=3):
    """Reduced-cost Ozaki matmul: (hi, lo) with relative error
    ~eps_f32 * 2^(-s_bits*n_slices) (~1e-13 at the default 3 slices).

    Two cost reductions versus matmul_ozaki_real's full-exact defaults
    (27 HIGHEST matmuls -> 9 DEFAULT + 2 HIGH):

    * slice products run at one-pass-bf16 DEFAULT: s_bits is capped at 7
      so every slice value has <= 8 significant bits (bf16-lossless) and
      the slice dot products still accumulate exactly in the MXU's f32
      accumulator (2*s + ceil(log2 K) <= 24 is enforced by the cap).
    * only the top n_slices slices are kept; the dropped tail goes
      through the HIGH (3-pass) remainder correction, whose own rounding
      is ~eps_f32 RELATIVE TO THE TAIL, i.e. ~eps * 2^(-s*n) of the
      result scale.

    This is the spectral engine's near-pole product primitive: the
    Woodbury assembly there needs product error << target / |D| with
    |D| <= 1/spectral_dist_lu = 1e5, and 1e-13 * 1e5 = 1e-8 clears the
    mixed tier's 2e-6 contract with two decades of margin while the full
    exact product (3.6e-15) over-delivers at ~4x the MXU passes.
    """
    K = a.shape[-1]
    s_bits = max(1, min(7, (23 - int(np.ceil(np.log2(max(K, 2))))) // 2))
    return matmul_ozaki_real(a, b, s_bits=s_bits, n_slices=n_slices,
                             slice_prec=jax.lax.Precision.DEFAULT,
                             rem_prec=jax.lax.Precision.HIGH)


def zmatmul_exact(a, b):
    """Complex error-free matmul: double-word (hi, lo) complex pair with
    hi + lo ~= a @ b to ~1e-13 absolute (for O(1) operands).

    Used by the 'exact' precision tier's final Newton residual, where the
    double-float path's f32-accumulation floor (~1e-7) would otherwise cap
    the attainable inverse accuracy."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr = matmul_ozaki_real(ar, br)
    ii = matmul_ozaki_real(ai, bi)
    ri = matmul_ozaki_real(ar, bi)
    ir = matmul_ozaki_real(ai, br)
    re_h, e1 = two_sum(rr[0], -ii[0])
    re_l = rr[1] - ii[1] + e1
    im_h, e2 = two_sum(ri[0], ir[0])
    im_l = ri[1] + ir[1] + e2
    return re_h + 1j * im_h, re_l + 1j * im_l


def zmatmul_exact_lite(a, b, *, n_slices=3):
    """Complex reduced-cost Ozaki matmul: double-word (hi, lo) pair with
    hi + lo ~= a @ b to ~1e-13 relative (see matmul_ozaki_lite)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr = matmul_ozaki_lite(ar, br, n_slices=n_slices)
    ii = matmul_ozaki_lite(ai, bi, n_slices=n_slices)
    ri = matmul_ozaki_lite(ar, bi, n_slices=n_slices)
    ir = matmul_ozaki_lite(ai, br, n_slices=n_slices)
    re_h, e1 = two_sum(rr[0], -ii[0])
    re_l = rr[1] - ii[1] + e1
    im_h, e2 = two_sum(ri[0], ir[0])
    im_l = ri[1] + ir[1] + e2
    return re_h + 1j * im_h, re_l + 1j * im_l


def zmatmul_dwf(a, b):
    """Complex matmul with double-word OUTPUT from double-float partials.

    Same split-product scheme as matmul_hp but the (hi, lo) information is
    kept instead of collapsed into one f32 value: hi + lo ~= a @ b down to
    the f32-accumulation floor of each partial product (~sqrt(K)*eps).
    Cheaper than zmatmul_exact (4x4 vs ~18x18 f32 matmuls); the 'high'
    tier's product primitive.
    """
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    rr_h, rr_l = _matmul_hp_real(ar, br)
    ii_h, ii_l = _matmul_hp_real(ai, bi)
    ri_h, ri_l = _matmul_hp_real(ar, bi)
    ir_h, ir_l = _matmul_hp_real(ai, br)
    re_h, e1 = two_sum(rr_h, -ii_h)
    re_l = (rr_l - ii_l) + e1
    im_h, e2 = two_sum(ri_h, ir_h)
    im_l = (ri_l + ir_l) + e2
    return re_h + 1j * im_h, re_l + 1j * im_l


def zmatmul_dw(a_dw, b_dw, exact=False):
    """Double-word complex matmul: (a_hi+a_lo) @ (b_hi+b_lo) as (hi, lo).

    The leading hi x hi product uses double-float partials (exact=False),
    reduced-slice Ozaki (exact='lite', ~1e-13 -- see matmul_ozaki_lite)
    or full error-free Ozaki slicing (exact=True, ~3.6e-15); the cross
    terms are ~eps-relative and their own rounding ~eps^2, so 'lite'
    runs them at HIGH (3-pass: eps * eps_f32-ish, below the lite leading
    term) instead of HIGHEST.
    """
    a_hi, a_lo = a_dw
    b_hi, b_lo = b_dw
    if exact == "lite":
        lead_hi, lead_lo = zmatmul_exact_lite(a_hi, b_hi)
        mmx = lambda x, y: jnp.matmul(x, y,
                                      precision=jax.lax.Precision.HIGH)
    elif exact:
        lead_hi, lead_lo = zmatmul_exact(a_hi, b_hi)
        mmx = _mm
    else:
        lead_hi, lead_lo = zmatmul_dwf(a_hi, b_hi)
        mmx = _mm
    cross = mmx(a_hi, b_lo) + mmx(a_lo, b_hi)
    hi, e = ctwo_sum(lead_hi, cross)
    return hi, lead_lo + e


def cdw_reduce(x_hi, x_lo):
    """Reduce complex (hi, lo) arrays to one double-word scalar.

    Pairwise halving with ctwo_sum at every level: the summation error is
    captured exactly into lo at each step, so the result is accurate to
    ~eps^2 of the element scale regardless of element count (a plain f32
    tree-sum would lose ~eps*log2(n)).  log2(n) vectorized passes.
    """
    h = x_hi.reshape(-1)
    l = x_lo.reshape(-1)
    n = h.shape[0]
    m = 1 << max(0, (n - 1).bit_length())
    if m != n:
        h = jnp.concatenate([h, jnp.zeros(m - n, h.dtype)])
        l = jnp.concatenate([l, jnp.zeros(m - n, l.dtype)])
    while m > 1:
        m //= 2
        s, e = ctwo_sum(h[:m], h[m:2 * m])
        h = s
        l = l[:m] + l[m:2 * m] + e
    return h[0], l[0]


def two_sum(a, b):
    """Knuth TwoSum: exact error of a floating-point addition (per part)."""
    t = a + b
    bb = t - a
    err = (a - (t - bb)) + (b - bb)
    return t, err


def two_prod(a, b):
    """Dekker TwoProd via 12-bit splits: a*b = p + e (nearly exactly)."""
    p = a * b
    a1, a2 = _split_hi(a)
    b1, b2 = _split_hi(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def ctwo_sum(a, b):
    """Complex TwoSum: returns (hi, lo) with hi+lo = a+b (per component)."""
    tr, er = two_sum(jnp.real(a), jnp.real(b))
    ti, ei = two_sum(jnp.imag(a), jnp.imag(b))
    return tr + 1j * ti, er + 1j * ei


def ctwo_prod(a, b):
    """Complex TwoProd: (hi, lo) with hi+lo ~= a*b to double-float."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    p1, e1 = two_prod(ar, br)
    p2, e2 = two_prod(ai, bi)
    re, es = two_sum(p1, -p2)
    re_lo = es + (e1 - e2)
    p3, e3 = two_prod(ar, bi)
    p4, e4 = two_prod(ai, br)
    im, es2 = two_sum(p3, p4)
    im_lo = es2 + (e3 + e4)
    return re + 1j * im, re_lo + 1j * im_lo


def cdw_add2(X, Y):
    """Double-word complex matrix add: (hi, lo) + (hi, lo) -> (hi, lo)."""
    hi, e = ctwo_sum(X[0], Y[0])
    return hi, X[1] + Y[1] + e


def cdw_sub(X, Y):
    return cdw_add2(X, (-Y[0], -Y[1]))


def cdw_smul(z, M):
    """Double-word scalar (hi, lo) times double-word matrix (hi, lo)."""
    p_hi, p_lo = ctwo_prod(z[0], M[0])
    return p_hi, p_lo + z[0] * M[1] + z[1] * M[0]


def cdw_conj_t(M):
    return jnp.conj(M[0]).T, jnp.conj(M[1]).T


def dw_add(s, x):
    """Double-word accumulate: s=(hi,lo) += x=(hi,lo) with error capture."""
    s_hi, s_lo = s
    x_hi, x_lo = x
    t, e = two_sum(s_hi, x_hi)
    return t, s_lo + x_lo + e


def dw_from(x):
    return x, jnp.zeros_like(x)


def zinv_dw(A_hi, A_lo, *, steps: int = 2, exact_steps: int = 0,
            bs: int | None = None, exact_kind=True,
            panel_impl: str = "auto", method: str | None = None):
    """Double-word inverse: X_hi + X_lo ~= (A_hi + A_lo)^-1 to ~1e-9.

    A is carried as an exact two-float split (A = A_hi + A_lo with A_hi the
    f32 rounding of the f64 operator).  The complex64 blocked LU gives X0;
    Newton steps refine against the *double-word* operator with double-float
    residual matmuls, and the correction is folded in with TwoSum so X keeps
    ~1e-9 information despite f32 storage.  This is the 'high' precision
    tier: on-TPU densities beyond the f32 representation floor (complexio
    ships hi/lo pairs separately).

    exact_steps > 0 appends final Newton steps whose residual is evaluated
    with error-free Ozaki-sliced matmuls (zmatmul_exact), removing the
    double-float path's f32-accumulation floor: the 'exact' precision tier,
    ~1e-12 forward error -- f64-class accuracy from an f32-only MXU.
    """
    N = A_hi.shape[-1]
    eye = jnp.eye(N, dtype=A_hi.dtype)
    X_hi = zinv(A_hi, method=method, bs=bs, panel_impl=panel_impl)
    X_lo = jnp.zeros_like(X_hi)

    def _update(X_hi, X_lo, R_hi, R_lo):
        ok = jnp.max(jnp.abs(R_hi)) < 0.5   # near-singular safeguard
        # D = X R in double-word: X_hi R_hi needs double-float care (its
        # rounding is the floor once R is exact), the rest is tiny.
        D_hi = matmul_hp(X_hi, R_hi)
        D_lo = _mm(X_lo, R_hi) + _mm(X_hi, R_lo)
        D_hi = jnp.where(ok, D_hi, 0.0)
        D_lo = jnp.where(ok, D_lo, 0.0)
        tr, er = two_sum(jnp.real(X_hi), jnp.real(D_hi))
        ti, ei = two_sum(jnp.imag(X_hi), jnp.imag(D_hi))
        return tr + 1j * ti, X_lo + D_lo + (er + 1j * ei)

    for _ in range(steps):
        # R = I - A_hi X_hi - (A_hi X_lo + A_lo X_hi); the leading product
        # in double-float precision, small cross terms in plain f32
        R = (eye - matmul_hp(A_hi, X_hi)) \
            - (_mm(A_hi, X_lo) + _mm(A_lo, X_hi))
        X_hi, X_lo = _update(X_hi, X_lo, R, jnp.zeros_like(R))
    for _ in range(exact_steps):
        # error-free residual: every term double-word, leading product via
        # Ozaki slicing (exact on the MXU; exact_kind='lite' trades the
        # last ~2 digits for ~4x fewer MXU passes, see matmul_ozaki_lite)
        P_hi, P_lo = (zmatmul_exact_lite(A_hi, X_hi)
                      if exact_kind == "lite"
                      else zmatmul_exact(A_hi, X_hi))
        cross = _mm(A_hi, X_lo) + _mm(A_lo, X_hi) + _mm(A_lo, X_lo)
        R_hi, e = ctwo_sum(eye - P_hi, -cross)
        R_lo = -P_lo + e
        X_hi, X_lo = _update(X_hi, X_lo, R_hi, R_lo)
    return X_hi, X_lo


def zinv_refined(A, *, steps: int = 2, method: str | None = None,
                 bs: int | None = None, panel_impl: str = "auto",
                 trail: str = "hi"):
    """Inverse with Newton refinement: X <- X + X (I - A X).

    Residual I - A X is evaluated with double-float matmuls, so each step
    roughly squares the error until the residual precision (~1e-10) is hit.
    """
    X = zinv(A, method=method, bs=bs, panel_impl=panel_impl, trail=trail)
    N = A.shape[-1]
    eye = jnp.eye(N, dtype=A.dtype)
    for _ in range(steps):
        R = eye - matmul_hp3(A, X)
        # safeguard: near-singular systems (kappa ~ 1/eps32) have ||R|| >~ 1
        # and a Newton step would amplify noise -- keep X there
        ok = jnp.max(jnp.abs(R)) < 0.5
        X = jnp.where(ok, X + _mm_corr(X, R), X)
    return X


def zinv_refined_cols(A, n_shards: int, *, steps: int = 2,
                      axis_name: str = "m", bs: int | None = None,
                      panel_impl: str = "auto", distribute_lu: bool = False,
                      trail: str = "hi"):
    """Column-sharded refined inverse for the model ('m') mesh axis.

    Must run inside shard_map over ``axis_name`` with ``n_shards`` ranks.
    Each rank solves and refines only its N/n_shards identity columns, so
    the dominant solve + residual + correction work divides across the
    axis.  The factorization itself is replicated by default (lowest
    latency at single-chip-fitting sizes); ``distribute_lu=True`` routes
    through ``zsolve_dist`` so the O(N^3/3) trailing updates divide too
    (the N >~ 8k path; any N, padded internally).  Newton's
    correction needs the full current iterate: ONE all_gather of X per
    refinement step (~N^2 * 8 B over ICI); with steps=0 ('fast' tier) the
    only collective is the caller's final gather of the result.

    Returns the rank's (N, N/n_shards) column block of A^-1; callers
    reassemble with lax.all_gather(..., axis=1, tiled=True).
    """
    N = A.shape[-1]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by m-axis size {n_shards}")
    w = N // n_shards
    rank = lax.axis_index(axis_name)
    rows = lax.broadcasted_iota(jnp.int32, (N, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (N, w), 1)
    I_cols = (rows == cols + rank * w).astype(A.dtype)
    if distribute_lu:
        X = zsolve_dist(A, I_cols, n_shards, axis_name=axis_name, bs=bs,
                        panel_impl=panel_impl, trail=trail)
    else:
        X = zsolve(A, I_cols, method="blocked", bs=bs,
                   panel_impl=panel_impl, trail=trail)
    for _ in range(steps):
        R = I_cols - matmul_hp3(A, X)
        rmax = lax.pmax(jnp.max(jnp.abs(R)), axis_name)
        Xf = lax.all_gather(X, axis_name, axis=1, tiled=True)
        X = jnp.where(rmax < 0.5, X + _mm_corr(Xf, R), X)
    return X


def zinv_dw_cols(A_hi, A_lo, n_shards: int, *, steps: int = 2,
                 exact_steps: int = 0, axis_name: str = "m",
                 bs: int | None = None, panel_impl: str = "auto",
                 distribute_lu: bool = False):
    """Column-sharded double-word inverse for the 'm' mesh axis.

    The model-parallel analog of ``zinv_dw``: each rank solves and Newton-
    refines only its N/n_shards identity columns against the double-word
    operator (A_hi + A_lo), with the residual matmuls (the dominant cost)
    dividing across the axis.  The correction X <- X + X R needs the full
    current iterate: TWO all_gathers (hi, lo) per refinement step.
    ``exact_steps`` appends Ozaki-sliced error-free residual steps (the
    'exact' tier; zmatmul_exact works on the rank's (N, w) column block).

    Returns the rank's (N, w) double-word column pair of (A_hi+A_lo)^-1;
    callers reassemble with lax.all_gather(..., axis=1, tiled=True).
    """
    N = A_hi.shape[-1]
    if N % n_shards:
        raise ValueError(f"N={N} not divisible by m-axis size {n_shards}")
    w = N // n_shards
    rank = lax.axis_index(axis_name)
    rows = lax.broadcasted_iota(jnp.int32, (N, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (N, w), 1)
    I_cols = (rows == cols + rank * w).astype(A_hi.dtype)
    if distribute_lu:
        X_hi = zsolve_dist(A_hi, I_cols, n_shards, axis_name=axis_name,
                           bs=bs, panel_impl=panel_impl)
    else:
        X_hi = zsolve(A_hi, I_cols, method="blocked", bs=bs,
                      panel_impl=panel_impl)
    X_lo = jnp.zeros_like(X_hi)

    def _update(X_hi, X_lo, R_hi, R_lo):
        rmax = lax.pmax(jnp.max(jnp.abs(R_hi)), axis_name)
        ok = rmax < 0.5                    # near-singular safeguard
        Xf_hi = lax.all_gather(X_hi, axis_name, axis=1, tiled=True)
        Xf_lo = lax.all_gather(X_lo, axis_name, axis=1, tiled=True)
        D_hi = matmul_hp(Xf_hi, R_hi)
        D_lo = _mm(Xf_lo, R_hi) + _mm(Xf_hi, R_lo)
        D_hi = jnp.where(ok, D_hi, 0.0)
        D_lo = jnp.where(ok, D_lo, 0.0)
        tr, er = two_sum(jnp.real(X_hi), jnp.real(D_hi))
        ti, ei = two_sum(jnp.imag(X_hi), jnp.imag(D_hi))
        return tr + 1j * ti, X_lo + D_lo + (er + 1j * ei)

    for _ in range(steps):
        R = (I_cols - matmul_hp(A_hi, X_hi)) \
            - (_mm(A_hi, X_lo) + _mm(A_lo, X_hi))
        X_hi, X_lo = _update(X_hi, X_lo, R, jnp.zeros_like(R))
    for _ in range(exact_steps):
        P_hi, P_lo = zmatmul_exact(A_hi, X_hi)
        cross = _mm(A_hi, X_lo) + _mm(A_lo, X_hi) + _mm(A_lo, X_lo)
        R_hi, e = ctwo_sum(I_cols - P_hi, -cross)
        R_lo = -P_lo + e
        X_hi, X_lo = _update(X_hi, X_lo, R_hi, R_lo)
    return X_hi, X_lo


def zsolve_dist(A, B_cols, n_shards: int, *, axis_name: str = "m",
                bs: int | None = None, panel_impl: str = "auto",
                trail: str = "hi"):
    """Distributed blocked solve over the model axis: the O(N^3) trailing
    updates shard across ranks; panels stay serial (the ScaLAPACK
    right-looking shape).  Must run inside shard_map over ``axis_name``.

    Layout: A arrives replicated; each rank slices out the PANEL-CYCLIC
    column blocks it owns (panel kb belongs to rank kb % M, so the
    triangular update volume balances).  Per panel: every rank factors
    its own local panel slot redundantly (the sequential panel work is
    the cheap part), ONE psum-broadcast selects the owner's valid
    factorization, and each rank eliminates only its ~W/M local columns.
    The U12 row blocks are psum-assembled into replicated (bs, N) rows so
    the back substitution of the rank-local RHS runs without further
    collectives.  Total communication ~1.5 N^2 * 8 B per factorization.

    B_cols is the rank's local RHS slice; returns the rank's (N, k)
    solution block of A X = B.  This is the N >~ 8k scaling path --
    unlike zinv_refined_cols (which replicates the LU), the
    factorization flops divide by M here, at the price of per-panel
    broadcast latency on the critical path.
    """
    N0 = A.shape[-1]
    k = B_cols.shape[-1]
    bs = _pick_block(N0, bs)
    panel_impl = _pick_panel(N0, panel_impl)
    M = n_shards
    # pad A -> block-diag(A, I) up to the next multiple of bs*M so the
    # panel-cyclic layout always divides evenly (the padded rows of B are
    # zero, so the appended identity block contributes X_pad = 0 rows)
    N = -(-N0 // (bs * M)) * (bs * M)
    if N != N0:
        A = _pad_to(A, N)
        B_cols = jnp.concatenate(
            [B_cols, jnp.zeros((N - N0, k), B_cols.dtype)], axis=0)
    nb = N // bs
    nbl = nb // M
    rank = lax.axis_index(axis_name)

    # rank-local panel-cyclic columns: local block j <-> global panel
    # g(j) = rank + j*M
    zero = jnp.zeros((), rank.dtype)
    blocks = [lax.dynamic_slice(A, (zero, (rank + j * M) * bs), (N, bs))
              for j in range(nbl)]
    A_loc = jnp.concatenate(blocks, axis=1)            # (N, nbl*bs)
    workB = B_cols

    def bcast(x, owner):
        sel = (rank == owner)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return lax.psum(jnp.where(sel, x, 0), axis_name)
        return lax.psum(jnp.where(sel, x, jnp.zeros_like(x)), axis_name)

    u_diags = []
    u12_rows = []
    for kb in range(nb):
        r0 = kb * bs
        owner, lj = kb % M, kb // M
        pan = A_loc[r0:, lj * bs:(lj + 1) * bs]
        if panel_impl not in ("virtual", "split", "scan", "pstrip",
                              "psplit"):
            raise ValueError(
                f"zsolve_dist supports panel_impl 'split'/'virtual'/'scan'"
                f"/'pstrip'/'psplit', got {panel_impl!r}")
        packed_l, perm_l = _dispatch_panel(pan, panel_impl)
        packed = bcast(packed_l, owner)
        perm = bcast(perm_l.astype(jnp.int32), owner)
        L11 = jnp.tril(packed[:bs, :], -1) + jnp.eye(bs, dtype=A.dtype)
        Linv = _tri_inv_fast(L11, lower=True, unit=True)
        L21 = packed[bs:, :]
        u_diags.append(jnp.triu(packed[:bs, :]))

        # RHS forward substitution (local columns, every panel)
        restB = workB[r0:, :][perm, :]
        U12B = _mm_trail(Linv, restB[:bs, :], trail)
        workB = jnp.concatenate(
            [workB[:r0, :], U12B,
             restB[bs:, :] - _mm_trail(L21, U12B, trail)], axis=0)

        if kb == nb - 1:        # no trailing columns left
            u12_rows.append(None)
            break

        # eliminate the rank's local columns belonging to LATER panels
        # (the LU's FLOP bulk -> trail budget, as in _zsolve_single)
        rest = A_loc[r0:, :][perm, :]
        U12 = _mm_trail(Linv, rest[:bs, :], trail)
        tail = rest[bs:, :] - _mm_trail(L21, U12, trail)
        upd = jnp.concatenate([A_loc[:r0, :], U12, tail], axis=0)
        lcol = lax.broadcasted_iota(jnp.int32, (1, nbl * bs), 1)
        gpanel = rank + (lcol // bs) * M
        A_loc = jnp.where(gpanel > kb, upd, A_loc)

        # assemble this panel's replicated (bs, N) U12 row block
        Z = jnp.zeros((bs, N), dtype=A.dtype)
        for j in range(nbl):
            piece = jnp.where(rank + j * M > kb,
                              upd[r0:r0 + bs, j * bs:(j + 1) * bs], 0.0)
            Z = lax.dynamic_update_slice(Z, piece,
                                         (zero, (rank + j * M) * bs))
        u12_rows.append(lax.psum(Z, axis_name))

    # back substitution on the local RHS columns (factors replicated)
    Uinv = _tri_inv_fast(jnp.stack(u_diags), lower=False, unit=False)
    X = jnp.zeros((0, k), dtype=B_cols.dtype)
    for ib in range(nb - 1, -1, -1):
        acc = workB[ib * bs:(ib + 1) * bs, :]
        if X.shape[0] > 0:
            acc = acc - _mm_trail(u12_rows[ib][:, (ib + 1) * bs:], X, trail)
        X = jnp.concatenate([_mm(Uinv[ib], acc), X], axis=0)
    return X[:N0, :]


# ---------------------------------------------------------------------------
# Reference-parity helpers (gauNEGF/utils.py)
# ---------------------------------------------------------------------------

@jax.jit
def inv(A):
    """Single-matrix inverse; parity with utils.py:52-54."""
    return zinv(A)


def eigh(A):
    """Hermitian eigendecomposition (utils.py:60-62)."""
    return jnp.linalg.eigh(A)


def _np_eig(a):
    w, v = np.linalg.eig(np.asarray(a))
    return w.astype(np.complex128 if a.dtype == np.complex128 else np.complex64), \
        v.astype(np.complex128 if a.dtype == np.complex128 else np.complex64)


def eig(A):
    """General (non-Hermitian) eigendecomposition.

    XLA has no TPU lowering for general eig (SURVEY.md section 7.4 item 6), so
    off-CPU this runs on the host via pure_callback.  It is only used once
    per SCF cycle (analytic density route), never in the energy hot loop.
    """
    if jax.default_backend() == "cpu":
        return jnp.linalg.eig(A)
    cdtype = jnp.complex128 if A.dtype == jnp.complex128 else jnp.complex64
    A = A.astype(cdtype)
    out_shape = (
        jax.ShapeDtypeStruct(A.shape[:-1], cdtype),
        jax.ShapeDtypeStruct(A.shape, cdtype),
    )
    return jax.pure_callback(_np_eig, out_shape, A, vmap_method="sequential")


@jax.jit
def fractional_matrix_power(S, power):
    """S^power by Hermitian eigendecomposition; parity with utils.py:12-48.

    Eigenvalues are clamped at 1e-16 exactly as the reference does.
    """
    eigenvalues, eigenvectors = jnp.linalg.eigh(S)
    eigenvalues = jnp.maximum(eigenvalues, 1e-16)
    powered = jnp.power(eigenvalues, power)
    return (eigenvectors * powered[..., None, :]) @ jnp.swapaxes(
        jnp.conj(eigenvectors), -1, -2)


def solve(A, B, **kw):
    return zsolve(A, B, **kw)
