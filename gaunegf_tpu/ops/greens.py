"""Energy-batched Green's-function engines (the throughput core).

This replaces the reference's ``_GInt`` dispatcher (integrate.py:84-142):
instead of "vmap if it fits in 5 GB else scan batches", every call is

    complex-safe boundary (split re/im f32 -- the TPU backend cannot
    transfer complex arrays; ops/complexio.py)
    -> shard_map over the energy axis of the mesh
      -> lax.scan over fixed-size chunks          (memory-bounded)
        -> vmap over the chunk                    (batched MXU solves)
          -> blocked complex LU inverse           (ops/zlinalg.py)
      -> Kahan-compensated weighted accumulation
    -> psum of the partial sums across devices    (the only collective)

All engines are built once per (provider-fn identity, shapes, execution
config) via lru_cache, so SCF iterations and Fermi-search probes reuse the
compiled executable (the reference retraces and even clears jit caches per
voltage step, scfE.py:208).

Public entry points:
* ``weighted_gr_sum``    -- sum_k w_k G(E_k)                (GrInt parity)
* ``weighted_gless_sum`` -- sum_k w_k G Gamma_i G^+         (GrLessInt parity)
* ``transmission_map``   -- T(E) = Re tr(G1 Gr G2 Ga)       (transport kernels)
* ``dos_map``            -- per-site DOS(E)
* ``gr_diag_map``        -- diag of Gr over the grid
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

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
from gaunegf_tpu.ops.complexio import (
    merge_host, merge_tree, split_traced, split_tree)
from gaunegf_tpu.parallel.mesh import ENERGY_AXIS, MODEL_AXIS

__all__ = [
    "weighted_gr_sum", "weighted_gless_sum",
    "transmission_map", "dos_map", "gr_diag_map", "EnergyEngine",
]

_DEFAULT_EXEC = ExecutionConfig()


def _pvary(x, axes):
    """Cast invariant values to device-varying over manual mesh axes.

    jax<=0.8 spelled this ``lax.pvary``; jax 0.9 removed it in favour of
    ``lax.pcast(..., to='varying')``, which additionally REJECTS axes the
    value is already varying over -- so filter per leaf via the aval's vma
    set to keep the old idempotent semantics."""
    pcast = getattr(lax, "pcast", None)
    if pcast is None:                               # jax <= 0.8
        return jax.tree_util.tree_map(lambda v: lax.pvary(v, axes), x)

    def one(leaf):
        need = tuple(a for a in axes if a not in jax.typeof(leaf).vma)
        return pcast(leaf, need, to="varying") if need else leaf

    return jax.tree_util.tree_map(one, x)


def _gr_point(E, H, S, sigma, exec_cfg: ExecutionConfig):
    """G(E) = (E*S - H - Sigma)^-1 with the configured precision policy."""
    A = (E * S - H - sigma).astype(H.dtype)
    if exec_cfg.precision == "mixed" and A.dtype == jnp.complex64:
        return zl.zinv_refined(A, steps=exec_cfg.refine_steps,
                               bs=exec_cfg.lu_block,
                               panel_impl=exec_cfg.lu_panel,
                               trail=exec_cfg.lu_trail)
    return zl.zinv(A, bs=exec_cfg.lu_block, panel_impl=exec_cfg.lu_panel,
                   trail=exec_cfg.lu_trail)


def _assemble_A_dw(E_dw, H_dw, S_dw, sigma_dw):
    """Double-word operator A = E*S - H - Sigma: the E*S product and the
    additions carry their rounding errors into A_lo (TwoProd/TwoSum), so
    the operator is accurate to ~1e-12 despite f32 storage.  Sigma enters
    as a (hi, lo) pair (zero lo for providers without a double-word
    evaluation, whose own f32 floor then dominates)."""
    E_hi, E_lo = E_dw
    H_hi, H_lo = H_dw
    S_hi, S_lo = S_dw
    sig_hi, sig_lo = sigma_dw
    p_hi, p_lo = zl.ctwo_prod(E_hi, S_hi)
    a1, e1 = zl.ctwo_sum(p_hi, -H_hi)
    a2, e2 = zl.ctwo_sum(a1, -sig_hi)
    A_lo = (p_lo + E_hi * S_lo + E_lo * S_hi - H_lo - sig_lo) + (e1 + e2)
    return a2, A_lo


def _point_gr_weighted_dw(E_dw, w_dw, H_dw, S_dw, params, sig_tot_fn,
                          _unused, exec_cfg):
    """'high'/'exact' tiers: w * G(E) as a double-word (hi, lo) pair.

    sig_tot_fn returns a (hi, lo) sigma pair (see EnergyEngine._dw_total
    / _dw_contact / _dw_wrap)."""
    sigma_dw = _cast_dw(sig_tot_fn(params, E_dw), H_dw[0].dtype)
    return _dw_scale(w_dw, _gr_dw(E_dw, H_dw, S_dw, sigma_dw, exec_cfg))


def _cast_dw(x_dw, dtype):
    return x_dw[0].astype(dtype), x_dw[1].astype(dtype)


def _gamma_dw(sig_dw):
    """Gamma = 1j (sigma - sigma^+) per double-word component (exact)."""
    s_hi, s_lo = sig_dw
    return (1j * (s_hi - jnp.conj(s_hi).T), 1j * (s_lo - jnp.conj(s_lo).T))


def _gr_dw(E_dw, H_dw, S_dw, sigma_dw, exec_cfg):
    """Double-word G(E) shared by the high/exact point kernels."""
    A_hi, A_lo = _assemble_A_dw(E_dw, H_dw, S_dw, sigma_dw)
    exact = 1 if exec_cfg.precision == "exact" else 0
    return zl.zinv_dw(A_hi, A_lo, steps=exec_cfg.refine_steps + 1,
                      exact_steps=exact, bs=exec_cfg.lu_block,
                      panel_impl=exec_cfg.lu_panel)


def _dw_scale(w_dw, X_dw):
    """w * X in double-word (w scalar dw, X matrix dw)."""
    w_hi, w_lo = w_dw
    X_hi, X_lo = X_dw
    c_hi, c_p = zl.ctwo_prod(w_hi, X_hi)
    return c_hi, c_p + w_hi * X_lo + w_lo * X_hi


def _point_gless_weighted_dw(E_dw, w_dw, H_dw, S_dw, params, sig_tot_fn,
                             sig_c_fn, exec_cfg):
    """'high'/'exact' tiers: w * Gr Gamma_i Ga as a double-word pair.

    Sigma and Gamma enter as double-word pairs (exact for providers with a
    dw evaluation, zero-lo otherwise); the Gr/Ga products keep double-word
    precision via zmatmul_dw (Ozaki-exact leading products on 'exact')."""
    dt = H_dw[0].dtype
    sig_tot = _cast_dw(sig_tot_fn(params, E_dw), dt)
    sig_c = (_cast_dw(sig_c_fn(params, E_dw), dt)
             if sig_c_fn is not None else sig_tot)
    exact = exec_cfg.precision == "exact"
    G_hi, G_lo = _gr_dw(E_dw, H_dw, S_dw, sig_tot, exec_cfg)
    Ga_dw = (jnp.conj(G_hi).T, jnp.conj(G_lo).T)
    Y_dw = zl.zmatmul_dw((G_hi, G_lo), _gamma_dw(sig_c), exact=exact)
    Z_dw = zl.zmatmul_dw(Y_dw, Ga_dw, exact=exact)
    return _dw_scale(w_dw, Z_dw)


def _point_transmission_dw(E_dw, H_dw, S_dw, params, sig_tot_fn, g1_fn,
                           g2_fn, exec_cfg):
    """T(E) = Re tr(G1 Gr G2 Ga) with double-word products and an exactly
    compensated pairwise trace reduction; returns a (hi, lo) real pair."""
    dt = H_dw[0].dtype
    sig_tot = _cast_dw(sig_tot_fn(params, E_dw), dt)
    exact = exec_cfg.precision == "exact"
    G_dw = _gr_dw(E_dw, H_dw, S_dw, sig_tot, exec_cfg)
    Ga_dw = (jnp.conj(G_dw[0]).T, jnp.conj(G_dw[1]).T)
    gamma1 = _gamma_dw(_cast_dw(g1_fn(params, E_dw), dt))
    gamma2 = _gamma_dw(_cast_dw(g2_fn(params, E_dw), dt))
    M1 = zl.zmatmul_dw(gamma1, G_dw, exact=exact)     # Gamma1 Gr
    M2 = zl.zmatmul_dw(gamma2, Ga_dw, exact=exact)    # Gamma2 Ga
    # tr(M1 M2) = sum_ij M1_ij * (M2^T)_ij, elementwise double-word
    M2T = (M2[0].T, M2[1].T)
    p_hi, p_e = zl.ctwo_prod(M1[0], M2T[0])
    p_lo = p_e + M1[0] * M2T[1] + M1[1] * M2T[0]
    t_hi, t_lo = zl.cdw_reduce(p_hi, p_lo)
    return jnp.real(t_hi), jnp.real(t_lo)


def _point_gr_diag_dw(E_dw, H_dw, S_dw, params, sig_tot_fn, exec_cfg):
    """diag G(E) as a double-word pair (DOS building block)."""
    sigma_dw = _cast_dw(sig_tot_fn(params, E_dw), H_dw[0].dtype)
    G_hi, G_lo = _gr_dw(E_dw, H_dw, S_dw, sigma_dw, exec_cfg)
    return jnp.diagonal(G_hi), jnp.diagonal(G_lo)


def _kahan_add(carry, x):
    s, c = carry
    y = x - c
    t = s + y
    c = (t - s) - y
    return t, c


# ---------------------------------------------------------------------------
# Per-energy observables
# ---------------------------------------------------------------------------

def _point_gr_weighted(E, w, H, S, params, sig_tot_fn, _unused, exec_cfg):
    sigma = sig_tot_fn(params, E)
    return (w * _gr_point(E, H, S, sigma, exec_cfg)).astype(H.dtype)


def _point_gless_weighted(E, w, H, S, params, sig_tot_fn, sig_c_fn, exec_cfg):
    sig_tot = sig_tot_fn(params, E)
    sig_c = sig_c_fn(params, E) if sig_c_fn is not None else sig_tot
    Gr = _gr_point(E, H, S, sig_tot, exec_cfg)
    Ga = jnp.conj(Gr).T
    gamma = (1j * (sig_c - jnp.conj(sig_c).T)).astype(H.dtype)
    return (w * zl._mm(zl._mm(Gr, gamma), Ga)).astype(H.dtype)


def _point_transmission(E, H, S, params, sig_tot_fn, g1_fn, g2_fn, exec_cfg):
    sig_tot = sig_tot_fn(params, E)
    Gr = _gr_point(E, H, S, sig_tot, exec_cfg)
    Ga = jnp.conj(Gr).T
    s1 = g1_fn(params, E)
    s2 = g2_fn(params, E)
    gamma1 = 1j * (s1 - jnp.conj(s1).T)
    gamma2 = 1j * (s2 - jnp.conj(s2).T)
    return jnp.real(jnp.trace(
        zl._mm(zl._mm(zl._mm(gamma1, Gr), gamma2), Ga)))


def _gr_cols(E, H, S, sigma, cols, exec_cfg):
    """Selected columns of G(E): solve with nc unit-column RHS instead of
    the full inverse -- the low-rank contact fast path (the LU cost stays,
    the N x N triangular solves shrink to N x nc).

    The blocked path factors ONCE and reuses the factors for the mixed
    tier's refinement solve (zlu_factor/zlu_solve) -- previously the
    refinement repaid the whole O(N^3/3) factorization, doubling the
    dominant cost of every mixed low-rank transmission/G< point."""
    A = (E * S - H - sigma).astype(H.dtype)
    B = jnp.zeros((H.shape[0], len(cols)), dtype=H.dtype)
    B = B.at[np.asarray(cols), jnp.arange(len(cols))].set(1.0)
    mixed = exec_cfg.precision == "mixed" and A.dtype == jnp.complex64
    if zl.supports_lapack_complex():
        X = zl.zsolve(A, B)
        if mixed:
            R = B - zl.matmul_hp(A, X)
            X = X + zl.zsolve(A, R)
        return X
    factors = zl.zlu_factor(A, bs=exec_cfg.lu_block,
                            panel_impl=exec_cfg.lu_panel,
                            trail=exec_cfg.lu_trail)
    X = zl.zlu_solve(factors, B)
    if mixed:
        R = B - zl.matmul_hp3(A, X)
        X = X + zl.zlu_solve(factors, R)
    return X


def _point_transmission_lowrank(E, H, S, params, sig_tot_fn, g1_fn, g2_fn,
                                c1, c2, exec_cfg):
    """T(E) from contact-column solves: T = tr(G1 Gr[c1,c2] G2 Gr[c1,c2]+)
    with the Gamma blocks restricted to their contact support.  Neglects
    the -1j*1e-9*S broadening background's contribution to Gamma
    (~1e-9 relative)."""
    sig_tot = sig_tot_fn(params, E)
    X = _gr_cols(E, H, S, sig_tot, c2, exec_cfg)      # (N, nc2)
    G12 = X[np.asarray(c1), :]                         # (nc1, nc2)
    s1 = g1_fn(params, E)
    s2 = g2_fn(params, E)
    ix1 = np.ix_(np.asarray(c1), np.asarray(c1))
    ix2 = np.ix_(np.asarray(c2), np.asarray(c2))
    gamma1 = 1j * (s1[ix1] - jnp.conj(s1[ix1]).T)
    gamma2 = 1j * (s2[ix2] - jnp.conj(s2[ix2]).T)
    return jnp.real(jnp.trace(zl._mm(
        zl._mm(zl._mm(gamma1, G12), gamma2), jnp.conj(G12).T)))


def _point_gless_weighted_lowrank(E, w, H, S, params, sig_tot_fn, sig_c_fn,
                                  c, exec_cfg):
    """w * G Gamma_c G+ from contact-column solves: Y = G[:, c],
    result = w * Y Gamma_cc Y+."""
    sig_tot = sig_tot_fn(params, E)
    Y = _gr_cols(E, H, S, sig_tot, c, exec_cfg)        # (N, nc)
    sig_c = sig_c_fn(params, E) if sig_c_fn is not None else sig_tot
    ix = np.ix_(np.asarray(c), np.asarray(c))
    gamma = (1j * (sig_c[ix] - jnp.conj(sig_c[ix]).T)).astype(H.dtype)
    return (w * zl._mm(zl._mm(Y, gamma),
                       jnp.conj(Y).T)).astype(H.dtype)


def _point_gr_diag(E, H, S, params, sig_tot_fn, exec_cfg):
    sigma = sig_tot_fn(params, E)
    return jnp.diagonal(_gr_point(E, H, S, sigma, exec_cfg))


def _point_gr_weighted_cols(E, w, H, S, params, sig_tot_fn, n_shards,
                            exec_cfg):
    """w * G(E)[:, cols_of_this_m_rank]: the model-axis sharded point.

    Runs inside shard_map over the ('e', 'm') mesh; each 'm' rank solves
    and refines only its N/n_shards columns of the inverse (the LU
    factorization is replicated -- see zlinalg.zinv_refined_cols)."""
    sigma = sig_tot_fn(params, E)
    A = (E * S - H - sigma).astype(H.dtype)
    steps = exec_cfg.refine_steps \
        if (exec_cfg.precision == "mixed" and A.dtype == jnp.complex64) else 0
    X = zl.zinv_refined_cols(A, n_shards, steps=steps, axis_name=MODEL_AXIS,
                             bs=exec_cfg.lu_block,
                             panel_impl=exec_cfg.lu_panel,
                             distribute_lu=exec_cfg.distribute_lu,
                             trail=exec_cfg.lu_trail)
    return (w * X).astype(H.dtype)


def _assemble_A(E, H, S, sigma):
    return (E * S - H - sigma).astype(H.dtype)


def _mp_steps(exec_cfg, dtype):
    return exec_cfg.refine_steps \
        if (exec_cfg.precision == "mixed" and dtype == jnp.complex64) else 0


def _rank_cols(N, n_shards):
    """(rank, per-rank column width) inside shard_map over the 'm' axis."""
    return lax.axis_index(MODEL_AXIS), N // n_shards


def _point_gless_weighted_full_cols(E, w, H, S, params, sig_tot_fn,
                                    sig_c_fn, n_shards, exec_cfg):
    """Model-sharded w * Gr Gamma Ga: each rank refines its column block
    of Gr (zinv_refined_cols), ONE all_gather reassembles Gr, and the
    O(N^3) Gamma products divide by computing only the rank's output
    columns: out[:, cols_r] = Gr (Gamma (Gr^H)[:, cols_r])."""
    sig_tot = sig_tot_fn(params, E)
    sig_c = sig_c_fn(params, E) if sig_c_fn is not None else sig_tot
    A = _assemble_A(E, H, S, sig_tot)
    N = H.shape[-1]
    rank, wq = _rank_cols(N, n_shards)
    X = zl.zinv_refined_cols(A, n_shards, steps=_mp_steps(exec_cfg, A.dtype),
                             axis_name=MODEL_AXIS, bs=exec_cfg.lu_block,
                             panel_impl=exec_cfg.lu_panel,
                             distribute_lu=exec_cfg.distribute_lu,
                             trail=exec_cfg.lu_trail)
    Gr = lax.all_gather(X, MODEL_AXIS, axis=1, tiled=True)       # (N, N)
    gamma = (1j * (sig_c - jnp.conj(sig_c).T)).astype(H.dtype)
    rows_r = lax.dynamic_slice(Gr, (rank * wq, 0 * rank), (wq, N))
    GaH_cols = jnp.conj(rows_r).T                                # (N, wq)
    out = zl._mm(Gr, zl._mm(gamma, GaH_cols))
    return (w * out).astype(H.dtype)


def _contact_rhs_cols(c, N, n_shards, dtype):
    """The rank's slice of the nc contact unit columns, padded so every
    rank owns the same count (padding columns have an out-of-range target
    row and stay identically zero through the solve)."""
    nc = len(c)
    ncl = -(-nc // n_shards)
    targets = np.full(ncl * n_shards, -1, np.int32)
    targets[:nc] = np.asarray(c, np.int32)
    rank = lax.axis_index(MODEL_AXIS)
    tgt = lax.dynamic_slice(jnp.asarray(targets), (rank * ncl,), (ncl,))
    B = (lax.broadcasted_iota(jnp.int32, (N, ncl), 0)
         == tgt[None, :]).astype(dtype)
    return B, nc, ncl


def _solve_cols_sharded(A, B, n_shards, exec_cfg):
    """Rank-local solve of A Y = B with the configured LU distribution and
    (mixed tier) one refinement solve -- the sharded twin of _gr_cols."""
    if exec_cfg.distribute_lu:
        solve = lambda b: zl.zsolve_dist(A, b, n_shards,
                                         axis_name=MODEL_AXIS,
                                         bs=exec_cfg.lu_block,
                                         panel_impl=exec_cfg.lu_panel,
                                         trail=exec_cfg.lu_trail)
    else:
        solve = lambda b: zl.zsolve(A, b, method="blocked",
                                    bs=exec_cfg.lu_block,
                                    panel_impl=exec_cfg.lu_panel,
                                    trail=exec_cfg.lu_trail)
    Y = solve(B)
    if _mp_steps(exec_cfg, A.dtype):
        R = B - zl.matmul_hp3(A, Y)
        Y = Y + solve(R)
    return Y


def _point_gless_weighted_lowrank_cols(E, w, H, S, params, sig_tot_fn,
                                       sig_c_fn, c, n_shards, exec_cfg):
    """Model-sharded low-rank G< point: the nc contact columns of Gr split
    across ranks (each solves nc/m RHS columns; the LU divides too under
    distribute_lu), ONE small (N, nc) all_gather, and the O(N^2 nc) outer
    product divides over the rank's output columns."""
    sig_tot = sig_tot_fn(params, E)
    A = _assemble_A(E, H, S, sig_tot)
    N = H.shape[-1]
    B, nc, ncl = _contact_rhs_cols(c, N, n_shards, H.dtype)
    Y = _solve_cols_sharded(A, B, n_shards, exec_cfg)
    Yf = lax.all_gather(Y, MODEL_AXIS, axis=1, tiled=True)[:, :nc]
    sig_c = sig_c_fn(params, E) if sig_c_fn is not None else sig_tot
    ix = np.ix_(np.asarray(c), np.asarray(c))
    gamma = (1j * (sig_c[ix] - jnp.conj(sig_c[ix]).T)).astype(H.dtype)
    rank, wq = _rank_cols(N, n_shards)
    rows_r = lax.dynamic_slice(Yf, (rank * wq, 0 * rank), (wq, nc))
    out = zl._mm(Yf, zl._mm(gamma, jnp.conj(rows_r).T))          # (N, wq)
    return (w * out).astype(H.dtype)


def _pick_psum(x, axis_name):
    """Replicated-but-varying -> invariant, exactly: psum of the value
    masked to rank 0 (zeros elsewhere) adds exact zeros."""
    pick = jnp.where(lax.axis_index(axis_name) == 0,
                     jnp.ones((), jnp.real(x).dtype), 0.0)
    return lax.psum(x * pick, axis_name)


def _point_transmission_lowrank_cols(E, H, S, params, sig_tot_fn, g1_fn,
                                     g2_fn, c1, c2, n_shards, exec_cfg):
    """Model-sharded low-rank T(E): the c2 contact columns of Gr split
    across ranks; after ONE tiny (nc1, nc2) gather of G12 the trace work
    is O(nc^3) and runs replicated."""
    sig_tot = sig_tot_fn(params, E)
    A = _assemble_A(E, H, S, sig_tot)
    N = H.shape[-1]
    B, nc2, _ = _contact_rhs_cols(c2, N, n_shards, H.dtype)
    Y = _solve_cols_sharded(A, B, n_shards, exec_cfg)
    G12_loc = Y[np.asarray(c1), :]                       # (nc1, ncl)
    G12 = lax.all_gather(G12_loc, MODEL_AXIS, axis=1, tiled=True)[:, :nc2]
    s1 = g1_fn(params, E)
    s2 = g2_fn(params, E)
    ix1 = np.ix_(np.asarray(c1), np.asarray(c1))
    ix2 = np.ix_(np.asarray(c2), np.asarray(c2))
    gamma1 = 1j * (s1[ix1] - jnp.conj(s1[ix1]).T)
    gamma2 = 1j * (s2[ix2] - jnp.conj(s2[ix2]).T)
    t = jnp.real(jnp.trace(zl._mm(
        zl._mm(zl._mm(gamma1, G12), gamma2), jnp.conj(G12).T)))
    return _pick_psum(t, MODEL_AXIS)


def _point_transmission_full_cols(E, H, S, params, sig_tot_fn, g1_fn,
                                  g2_fn, n_shards, exec_cfg):
    """Model-sharded full T(E) = Re tr(G1 Gr G2 Ga): Gr columns sharded +
    gathered, then each rank contributes the trace over its own diagonal
    block (3 N^2 w flops per rank instead of 3 N^3)."""
    sig_tot = sig_tot_fn(params, E)
    A = _assemble_A(E, H, S, sig_tot)
    N = H.shape[-1]
    rank, wq = _rank_cols(N, n_shards)
    X = zl.zinv_refined_cols(A, n_shards, steps=_mp_steps(exec_cfg, A.dtype),
                             axis_name=MODEL_AXIS, bs=exec_cfg.lu_block,
                             panel_impl=exec_cfg.lu_panel,
                             distribute_lu=exec_cfg.distribute_lu,
                             trail=exec_cfg.lu_trail)
    Gr = lax.all_gather(X, MODEL_AXIS, axis=1, tiled=True)
    s1 = g1_fn(params, E)
    s2 = g2_fn(params, E)
    gamma1 = (1j * (s1 - jnp.conj(s1).T)).astype(H.dtype)
    gamma2 = (1j * (s2 - jnp.conj(s2).T)).astype(H.dtype)
    rows_r = lax.dynamic_slice(Gr, (rank * wq, 0 * rank), (wq, N))
    M_cols = zl._mm(gamma1, zl._mm(Gr, zl._mm(gamma2,
                                              jnp.conj(rows_r).T)))
    diag_blk = lax.dynamic_slice(M_cols, (rank * wq, 0 * rank), (wq, wq))
    t_loc = jnp.real(jnp.trace(diag_blk))
    return lax.psum(t_loc, MODEL_AXIS)


def _point_gr_weighted_dw_cols(E_dw, w_dw, H_dw, S_dw, params, sig_tot_fn,
                               _unused, n_shards, exec_cfg):
    """'high'/'exact' tiers over the 'm' axis: the rank's double-word
    column block of w * G(E) (zlinalg.zinv_dw_cols)."""
    sigma_dw = _cast_dw(sig_tot_fn(params, E_dw), H_dw[0].dtype)
    A_hi, A_lo = _assemble_A_dw(E_dw, H_dw, S_dw, sigma_dw)
    exact = 1 if exec_cfg.precision == "exact" else 0
    X_dw = zl.zinv_dw_cols(A_hi, A_lo, n_shards,
                           steps=exec_cfg.refine_steps + 1,
                           exact_steps=exact, axis_name=MODEL_AXIS,
                           bs=exec_cfg.lu_block,
                           panel_impl=exec_cfg.lu_panel,
                           distribute_lu=exec_cfg.distribute_lu)
    return _dw_scale(w_dw, X_dw)


# ---------------------------------------------------------------------------
# Engine builders (cached on function identities + static config)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _build_sum_engine(point_fn, sig_tot_fn, sig_c_fn, exec_cfg: ExecutionConfig,
                      mesh: Optional[Mesh], extra=(), epilog=None):
    """Jitted engine: split(params, H, S, E(nd,nc,ch), w) -> split((N, N)).

    epilog='im' applies Im() on device before returning: retarded density
    sums are real-valued after Im/pi, so this HALVES the device->host
    transfer (one real array instead of a split complex pair) and the
    cross-device psum bytes -- the transfer is the per-cycle bottleneck
    through slow links (Im is linear, so Im-then-psum == psum-then-Im)."""

    def device_body(params, H, S, E, w, varying=False):
        def scan_fn(carry, inputs):
            Eb, wb = inputs
            vals = jax.vmap(
                lambda e, ww: point_fn(e, ww, H, S, params, sig_tot_fn,
                                       sig_c_fn, *extra, exec_cfg))(Eb, wb)
            return _kahan_add(carry, jnp.sum(vals, axis=0)), None

        N = H.shape[-1]
        dt = H.dtype
        init = (jnp.zeros((N, N), dt), jnp.zeros((N, N), dt))
        if varying:
            init = _pvary(init, (ENERGY_AXIS,))
        (s, c), _ = lax.scan(scan_fn, init, (E, w))
        out = s + c
        return jnp.imag(out) if epilog == "im" else out

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s, w_s):
            params, H, S, E, w = merge_tree((params_s, H_s, S_s, E_s, w_s))
            return split_traced(device_body(params, H, S, E[0], w[0]))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s):
        def per_device(params_s, H_s, S_s, E_s, w_s):
            params, H, S, E, w = merge_tree((params_s, H_s, S_s, E_s, w_s))
            partial_sum = device_body(params, H, S, E[0], w[0], varying=True)
            return split_traced(lax.psum(partial_sum, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, H_s, S_s, E_s, w_s)

    return engine


@lru_cache(maxsize=None)
def _build_density_neq_engine(sig_tot_fn, sig_c_fn, c_inds,
                              exec_cfg: ExecutionConfig,
                              mesh: Optional[Mesh]):
    """ONE dispatch per biased SCF cycle: equilibrium + G< window fused.

    Two scans in the same compiled program -- the equilibrium grid through
    the retarded kernel accumulating Im(w G) (real), and the bias-window
    grid through the G< kernel (low-rank contact columns when available) --
    combined on device into one complex density contribution.  Replaces
    two engine dispatches + two device->host transfers per biased cycle
    (each ~1.1 s through slow links at N=1000) with one of each.
    Physics scales (1/pi, 1/2pi) are folded into the weights by the
    caller, so this engine stays a plain weighted sum like its siblings.
    """
    if c_inds is not None:
        point_gl = lambda e, ww, H, S, params: _point_gless_weighted_lowrank(
            e, ww, H, S, params, sig_tot_fn, sig_c_fn, c_inds, exec_cfg)
    else:
        point_gl = lambda e, ww, H, S, params: _point_gless_weighted(
            e, ww, H, S, params, sig_tot_fn, sig_c_fn, exec_cfg)

    def device_body(params, H, S, Eq, wq, En, wn, varying=False):
        N = H.shape[-1]

        def scan_eq(carry, inputs):
            Eb, wb = inputs
            vals = jax.vmap(
                lambda e, ww: jnp.imag(_point_gr_weighted(
                    e, ww, H, S, params, sig_tot_fn, None,
                    exec_cfg)))(Eb, wb)
            return _kahan_add(carry, jnp.sum(vals, axis=0)), None

        def scan_gl(carry, inputs):
            Eb, wb = inputs
            vals = jax.vmap(
                lambda e, ww: point_gl(e, ww, H, S, params))(Eb, wb)
            return _kahan_add(carry, jnp.sum(vals, axis=0)), None

        rdt = jnp.real(H).dtype
        init_eq = (jnp.zeros((N, N), rdt), jnp.zeros((N, N), rdt))
        init_gl = (jnp.zeros((N, N), H.dtype), jnp.zeros((N, N), H.dtype))
        if varying:
            init_eq, init_gl = _pvary((init_eq, init_gl), (ENERGY_AXIS,))
        (se, ce), _ = lax.scan(scan_eq, init_eq, (Eq, wq))
        (sg, cg), _ = lax.scan(scan_gl, init_gl, (En, wn))
        return (se + ce) + (sg + cg)

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s):
            params, H, S, Eq, wq, En, wn = merge_tree(
                (params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s))
            return split_traced(
                device_body(params, H, S, Eq[0], wq[0], En[0], wn[0]))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s):
        def per_device(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s):
            params, H, S, Eq, wq, En, wn = merge_tree(
                (params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s))
            partial = device_body(params, H, S, Eq[0], wq[0], En[0], wn[0],
                                  varying=True)
            return split_traced(lax.psum(partial, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS),
                      P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s)

    return engine


@lru_cache(maxsize=None)
def _build_sum_engine_mp(point_fn, sig_tot_fn, sig_c_fn,
                         exec_cfg: ExecutionConfig, mesh: Mesh,
                         extra=(), epilog=None):
    """Model-parallel weighted-sum engine over an ('e', 'm') mesh.

    Energies shard over 'e' as usual; within each energy the point kernel
    (a *_cols variant) computes only the rank's (N, N/m) output column
    block, so the solve/residual/product flops divide across the model
    axis.  psum over 'e' reduces the quadrature, and shard_map's
    out_specs P(None, 'm') reassembles the full (N, N) sum from the
    column blocks -- no explicit gather of the per-point results happens
    outside the kernels' own internal all_gathers.
    """
    m_size = mesh.shape[MODEL_AXIS]

    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s):
        def per_device(params_s, H_s, S_s, E_s, w_s):
            params, H, S, E, w = merge_tree((params_s, H_s, S_s, E_s, w_s))
            N = H.shape[-1]
            dt = H.dtype

            def scan_fn(carry, inputs):
                Eb, wb = inputs
                vals = jax.vmap(
                    lambda e, ww: point_fn(
                        e, ww, H, S, params, sig_tot_fn, sig_c_fn, *extra,
                        m_size, exec_cfg))(Eb, wb)
                return _kahan_add(carry, jnp.sum(vals, axis=0)), None

            init = (jnp.zeros((N, N // m_size), dt),
                    jnp.zeros((N, N // m_size), dt))
            init = _pvary(init, (ENERGY_AXIS, MODEL_AXIS))
            (s, c), _ = lax.scan(scan_fn, init, (E[0], w[0]))
            out = s + c
            if epilog == "im":
                out = jnp.imag(out)
            return split_traced(lax.psum(out, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(None, MODEL_AXIS),
        )(params_s, H_s, S_s, E_s, w_s)

    return engine


def _point_gr_weighted_cols_mp(e, ww, H, S, params, sig_tot_fn, _sig_c_fn,
                               m_size, exec_cfg):
    """Adapter giving _point_gr_weighted_cols the generic mp signature."""
    return _point_gr_weighted_cols(e, ww, H, S, params, sig_tot_fn,
                                   m_size, exec_cfg)


@lru_cache(maxsize=None)
def _build_map_engine_mp(point_fn, fns, exec_cfg: ExecutionConfig,
                         mesh: Mesh):
    """Model-parallel per-energy observable map over an ('e', 'm') mesh.

    The point kernel (a *_cols variant) returns a scalar already reduced
    or replicated over 'm' (psum / _pick_psum inside), so the output is
    'm'-invariant and shards over 'e' only."""
    m_size = mesh.shape[MODEL_AXIS]

    @jax.jit
    def engine(params_s, H_s, S_s, E_s):
        def per_device(params_s, H_s, S_s, E_s):
            params, H, S, E = merge_tree((params_s, H_s, S_s, E_s))

            def scan_fn(_, Eb):
                vals = jax.vmap(
                    lambda e: point_fn(e, H, S, params, *fns, m_size,
                                       exec_cfg))(Eb)
                return None, vals

            _, out = lax.scan(scan_fn, None, E[0])
            return split_traced(out[None])

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS)),
            out_specs=P(ENERGY_AXIS),
        )(params_s, H_s, S_s, E_s)

    return engine


@lru_cache(maxsize=None)
def _build_density_neq_engine_mp(sig_tot_fn, sig_c_fn, c_inds,
                                 exec_cfg: ExecutionConfig, mesh: Mesh):
    """Fused biased-SCF dispatch over an ('e', 'm') mesh: the equilibrium
    grid through the column-sharded retarded kernel (Im accumulation) and
    the bias window through the column-sharded G< kernel, combined into
    the rank's (N, N/m) density column block -- ONE dispatch per biased
    cycle WITH tensor parallelism (the single-'m' fused engine's sibling).
    """
    m_size = mesh.shape[MODEL_AXIS]

    if c_inds is not None:
        point_gl = lambda e, ww, H, S, params: \
            _point_gless_weighted_lowrank_cols(
                e, ww, H, S, params, sig_tot_fn, sig_c_fn, c_inds, m_size,
                exec_cfg)
    else:
        point_gl = lambda e, ww, H, S, params: \
            _point_gless_weighted_full_cols(
                e, ww, H, S, params, sig_tot_fn, sig_c_fn, m_size,
                exec_cfg)

    @jax.jit
    def engine(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s):
        def per_device(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s):
            params, H, S, Eq, wq, En, wn = merge_tree(
                (params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s))
            N = H.shape[-1]
            wcol = N // m_size

            def scan_eq(carry, inputs):
                Eb, wb = inputs
                vals = jax.vmap(
                    lambda e, ww: jnp.imag(_point_gr_weighted_cols(
                        e, ww, H, S, params, sig_tot_fn, m_size,
                        exec_cfg)))(Eb, wb)
                return _kahan_add(carry, jnp.sum(vals, axis=0)), None

            def scan_gl(carry, inputs):
                Eb, wb = inputs
                vals = jax.vmap(
                    lambda e, ww: point_gl(e, ww, H, S, params))(Eb, wb)
                return _kahan_add(carry, jnp.sum(vals, axis=0)), None

            rdt = jnp.real(H).dtype
            init_eq = (jnp.zeros((N, wcol), rdt), jnp.zeros((N, wcol), rdt))
            init_gl = (jnp.zeros((N, wcol), H.dtype),
                       jnp.zeros((N, wcol), H.dtype))
            init_eq, init_gl = _pvary((init_eq, init_gl),
                                      (ENERGY_AXIS, MODEL_AXIS))
            (se, ce), _ = lax.scan(scan_eq, init_eq, (Eq[0], wq[0]))
            (sg, cg), _ = lax.scan(scan_gl, init_gl, (En[0], wn[0]))
            partial = (se + ce) + (sg + cg)
            return split_traced(lax.psum(partial, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS),
                      P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(None, MODEL_AXIS),
        )(params_s, H_s, S_s, Eq_s, wq_s, En_s, wn_s)

    return engine


@lru_cache(maxsize=None)
def _build_sum_engine_dw_mp(point_fn, sig_tot_fn, sig_c_fn,
                            exec_cfg: ExecutionConfig, mesh: Mesh):
    """'high'/'exact'-tier weighted sum over an ('e', 'm') mesh: the point
    kernel returns the rank's double-word (hi, lo) column block; chunk and
    cross-'e' reductions use the same compensated double-word combines as
    _build_sum_engine_dw (the 'e' psum replaced by the exact gather +
    TwoSum + masked-psum pattern), with out_specs P(None, 'm')."""
    m_size = mesh.shape[MODEL_AXIS]

    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s):
        def per_device(params_s, H_s, S_s, E_s, w_s):
            params, H_dw, S_dw, E_dw, w_dw = merge_tree(
                (params_s, H_s, S_s, E_s, w_s))
            E_dw = (E_dw[0][0], E_dw[1][0])
            w_dw = (w_dw[0][0], w_dw[1][0])
            N = H_dw[0].shape[-1]
            wcol = N // m_size
            dt = H_dw[0].dtype

            def scan_fn(carry, inputs):
                Eb_dw, wb_dw = inputs
                his, los = jax.vmap(
                    lambda e_hi, e_lo, w_hi, w_lo: point_fn(
                        (e_hi, e_lo), (w_hi, w_lo), H_dw, S_dw, params,
                        sig_tot_fn, sig_c_fn, m_size, exec_cfg))(
                            Eb_dw[0], Eb_dw[1], wb_dw[0], wb_dw[1])

                def red(i, s):
                    return _cdw_add(s, (his[i], los[i]))

                init_red = _pvary(
                    (jnp.zeros((N, wcol), dt), jnp.zeros((N, wcol), dt)),
                    (ENERGY_AXIS, MODEL_AXIS))
                chunk_sum = lax.fori_loop(0, his.shape[0], red, init_red)
                return _cdw_add(carry, chunk_sum), None

            init = _pvary(
                (jnp.zeros((N, wcol), dt), jnp.zeros((N, wcol), dt)),
                (ENERGY_AXIS, MODEL_AXIS))
            (s_hi, s_lo), _ = lax.scan(scan_fn, init, (E_dw, w_dw))
            g_hi = lax.all_gather(s_hi, ENERGY_AXIS)
            g_lo = lax.all_gather(s_lo, ENERGY_AXIS)
            acc = (g_hi[0], g_lo[0])
            for i in range(1, mesh.shape[ENERGY_AXIS]):
                acc = _cdw_add(acc, (g_hi[i], g_lo[i]))
            pick = jnp.where(lax.axis_index(ENERGY_AXIS) == 0, 1.0, 0.0)
            return split_traced((lax.psum(acc[0] * pick, ENERGY_AXIS),
                                 lax.psum(acc[1] * pick, ENERGY_AXIS)))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(None, MODEL_AXIS),
        )(params_s, H_s, S_s, E_s, w_s)

    return engine


def _point_transmission_pre(E, H, S, sigs, exec_cfg):
    """Transmission from precomputed per-contact sigmas (warm path)."""
    sig_tot = sigs[0]
    for s in sigs[1:]:
        sig_tot = sig_tot + s
    Gr = _gr_point(E, H, S, sig_tot, exec_cfg)
    Ga = jnp.conj(Gr).T
    s1, s2 = sigs[0], sigs[-1]
    gamma1 = 1j * (s1 - jnp.conj(s1).T)
    gamma2 = 1j * (s2 - jnp.conj(s2).T)
    return jnp.real(jnp.trace(
        zl._mm(zl._mm(zl._mm(gamma1, Gr), gamma2), Ga)))


def _point_transmission_pre_lowrank(E, H, S, sigs, c1, c2, exec_cfg):
    """Warm + low-rank transmission: precomputed per-contact sigmas AND
    contact-column solves -- without this the warm engine pays a full
    inverse where the cold path solves nc columns, losing 3-4x whenever
    the provider's sigma is cheap (measured round 3, chain contacts)."""
    sig_tot = sigs[0]
    for s in sigs[1:]:
        sig_tot = sig_tot + s
    X = _gr_cols(E, H, S, sig_tot, c2, exec_cfg)       # (N, nc2)
    G12 = X[np.asarray(c1), :]
    s1, s2 = sigs[0], sigs[-1]
    ix1 = np.ix_(np.asarray(c1), np.asarray(c1))
    ix2 = np.ix_(np.asarray(c2), np.asarray(c2))
    gamma1 = 1j * (s1[ix1] - jnp.conj(s1[ix1]).T)
    gamma2 = 1j * (s2[ix2] - jnp.conj(s2[ix2]).T)
    return jnp.real(jnp.trace(zl._mm(
        zl._mm(zl._mm(gamma1, G12), gamma2), jnp.conj(G12).T)))


@lru_cache(maxsize=None)
def _build_trans_engine_warm(warm_fn, exec_cfg: ExecutionConfig,
                             mesh: Optional[Mesh], lowrank=None):
    """Warm-started T(E) sweep: the provider's fixed-point state is carried
    across chunks per lane (previous-energy initialization along the sorted
    grid within a shard, SURVEY.md section 7.4 item 2), and each energy's contact
    sigmas are solved once and reused for Sigma_tot and both Gammas.
    lowrank=(c1, c2) static contact supports route the per-point kernel
    through contact-column solves instead of the full inverse."""

    if lowrank is not None:
        c1, c2 = lowrank
        point = lambda e, sg, H, S: _point_transmission_pre_lowrank(
            e, H, S, sg, c1, c2, exec_cfg)
    else:
        point = lambda e, sg, H, S: _point_transmission_pre(
            e, H, S, sg, exec_cfg)

    def device_body(params, H, S, E, state0, varying=False):
        chunk = E.shape[-1]
        state_lanes = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (chunk,) + x.shape), state0)
        if varying:
            state_lanes = _pvary(state_lanes, (ENERGY_AXIS,))

        def scan_fn(state, Eb):
            # ONE vmap for sigma + observable: a separate sigma vmap would
            # materialize (chunk, N, N) per-contact sigmas between the two
            # batched computations (measured 25% slower, round 3)
            def one(e, st):
                sigs, st2 = warm_fn(params, e, st)
                return point(e, sigs, H, S), st2

            vals, state_new = jax.vmap(one)(Eb, state)
            return state_new, vals

        _, out = lax.scan(scan_fn, state_lanes, E)
        return out

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s, state0_s):
            params, H, S, E, state0 = merge_tree(
                (params_s, H_s, S_s, E_s, state0_s))
            return split_traced(
                device_body(params, H, S, E[0], state0)[None])
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s, state0_s):
        def per_device(params_s, H_s, S_s, E_s, state0_s):
            params, H, S, E, state0 = merge_tree(
                (params_s, H_s, S_s, E_s, state0_s))
            return split_traced(
                device_body(params, H, S, E[0], state0,
                            varying=True)[None])

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P()),
            out_specs=P(ENERGY_AXIS),
        )(params_s, H_s, S_s, E_s, state0_s)

    return engine


@lru_cache(maxsize=None)
def _build_sum_engine_warm(kind: str, warm_fn, exec_cfg: ExecutionConfig,
                           mesh: Optional[Mesh], contact: Optional[int]):
    """Warm-started weighted sums (gr / gless) for providers with
    contacts_warm_apply: per-lane fixed-point state carried across chunks,
    one solve per energy shared by Sigma_tot and Gamma."""

    def point(e, w, sigs, H, S):
        sig_tot = sigs[0]
        for s in sigs[1:]:
            sig_tot = sig_tot + s
        if kind == "gr":
            return (w * _gr_point(e, H, S, sig_tot, exec_cfg)).astype(H.dtype)
        sig_c = sigs[contact % len(sigs)] if contact is not None else sig_tot
        Gr = _gr_point(e, H, S, sig_tot, exec_cfg)
        Ga = jnp.conj(Gr).T
        gamma = (1j * (sig_c - jnp.conj(sig_c).T)).astype(H.dtype)
        return (w * zl._mm(zl._mm(Gr, gamma), Ga)).astype(H.dtype)

    def device_body(params, H, S, E, w, state0, varying=False):
        chunk = E.shape[-1]
        state_lanes = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (chunk,) + x.shape), state0)
        N = H.shape[-1]
        init_acc = (jnp.zeros((N, N), H.dtype), jnp.zeros((N, N), H.dtype))
        if varying:
            init_acc = _pvary(init_acc, (ENERGY_AXIS,))
            state_lanes = _pvary(state_lanes, (ENERGY_AXIS,))

        def scan_fn(carry, inputs):
            acc, state = carry
            Eb, wb = inputs

            def one(e, ww, st):
                sigs, st2 = warm_fn(params, e, st)
                return point(e, ww, sigs, H, S), st2

            vals, state_new = jax.vmap(one)(Eb, wb, state)
            return (_kahan_add(acc, jnp.sum(vals, axis=0)), state_new), None

        (acc, _), _ = lax.scan(scan_fn, (init_acc, state_lanes), (E, w))
        return acc[0] + acc[1]

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s, w_s, state0_s):
            params, H, S, E, w, state0 = merge_tree(
                (params_s, H_s, S_s, E_s, w_s, state0_s))
            return split_traced(device_body(params, H, S, E[0], w[0],
                                            state0))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s, state0_s):
        def per_device(params_s, H_s, S_s, E_s, w_s, state0_s):
            params, H, S, E, w, state0 = merge_tree(
                (params_s, H_s, S_s, E_s, w_s, state0_s))
            out = device_body(params, H, S, E[0], w[0], state0,
                              varying=True)
            return split_traced(lax.psum(out, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS), P()),
            out_specs=P(),
        )(params_s, H_s, S_s, E_s, w_s, state0_s)

    return engine


# Residual gates for the continuation engine: `r` is max|I - A X| BEFORE
# the final plain Newton update, so the post-update error is ~r^2 ('fast')
# or ~r^4 after the double-float polish squares once more ('mixed').
_CHAIN_GATE_FAST = 5e-3     # r^2 < 2.5e-5 ~ the complex64 LU floor
_CHAIN_GATE_MIXED = 3e-2    # r^4 < 8e-7 < the polish floor


def _make_chain_scan(sig_tot_fn, exec_cfg: ExecutionConfig, epilog=None):
    """Shared Newton-Schulz continuation scan body (see
    _build_sum_engine_chain): (params, H, S, E, w, varying) -> weighted
    sum.  E/w must be lane-major (each lane a contiguous sorted segment).
    epilog='im' accumulates Im(w G) in real dtype."""
    mixed = exec_cfg.precision == "mixed"
    k_steps = exec_cfg.chain_steps or (2 if mixed else 3)
    gate = _CHAIN_GATE_MIXED if mixed else _CHAIN_GATE_FAST
    mm = zl._mm

    def assemble(params, e, H, S):
        sig = sig_tot_fn(params, e)
        return (e * S - H - sig).astype(H.dtype)

    def newton(A, X0, k):
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        X, r = X0, None
        for i in range(k):
            Y = mm(A, X)
            if i == k - 1:
                r = jnp.max(jnp.abs(Y - eye))
            X = 2.0 * X - mm(X, Y)
        return X, r

    def lu(A):
        if mixed:
            return zl.zinv_refined(A, steps=exec_cfg.refine_steps,
                                   bs=exec_cfg.lu_block,
                                   panel_impl=exec_cfg.lu_panel,
                                   trail=exec_cfg.lu_trail)
        return zl.zinv(A, bs=exec_cfg.lu_block,
                       panel_impl=exec_cfg.lu_panel,
                       trail=exec_cfg.lu_trail)

    def polish(A, X):
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        R = eye - zl.matmul_hp3(A, X)
        ok = jnp.max(jnp.abs(R)) < 0.5
        return jnp.where(ok, X + zl._mm_corr(X, R), X)

    def body(params, H, S, E, w, varying=False):
        N = H.shape[-1]
        dt = H.dtype
        # complex128 (x64/CPU): the polish residual is exact, so spend one
        # more Newton step + the tight gate to reach ~1e-10 instead of the
        # mixed tier's gate-limited ~1e-6; no TPU cost (device runs c64)
        x64 = dt == jnp.complex128
        k_loc = max(k_steps, 3) if x64 else k_steps
        gate_loc = min(gate, _CHAIN_GATE_FAST) if x64 else gate
        adt = jnp.real(H).dtype if epilog == "im" else dt
        lanes = E.shape[-1]
        init = ((jnp.zeros((N, N), adt), jnp.zeros((N, N), adt)),
                jnp.zeros((lanes, N, N), dt), jnp.array(False))
        if varying:
            init = _pvary(init, (ENERGY_AXIS,))

        def scan_fn(carry, inputs):
            acc, X_prev, valid = carry
            Eb, wb = inputs
            A = jax.vmap(lambda e: assemble(params, e, H, S))(Eb)
            Xn, r = jax.vmap(lambda a, x: newton(a, x, k_loc))(A, X_prev)
            ok = valid & (jnp.max(r) < gate_loc)
            X = lax.cond(ok, lambda a, x: x, lambda a, x: jax.vmap(lu)(a),
                         A, Xn)
            # polish also on complex128 (x64/CPU): its residual is
            # exact, so the chain reaches ~1e-10 there instead of the
            # mixed-gate-limited ~1e-6
            if mixed or x64:
                X = jax.vmap(polish)(A, X)
            contrib = jnp.sum(wb[:, None, None] * X, axis=0)
            if epilog == "im":
                contrib = jnp.imag(contrib)
            return (_kahan_add(acc, contrib.astype(adt)), X, ok | True), None

        (acc, _, _), _ = lax.scan(scan_fn, init, (E, w))
        return acc[0] + acc[1]

    return body


@lru_cache(maxsize=None)
def _build_density_eq_split_engine(sig_tot_fn, exec_cfg: ExecutionConfig,
                                   mesh: Optional[Mesh]):
    """Fused equilibrium dispatch with grid-aware continuation (VERDICT r2
    item 1): the CONTOUR grid rides the Newton-Schulz continuation scan
    (lane-major, previous-point seeds -- the contour is smooth and far
    from the real axis, where continuation measured +43% round 1), while
    the real-axis lower segment keeps the batched-LU scan (resonances
    break the seeds there).  Both accumulate Im(w G) on device and combine
    into ONE dispatch + ONE transfer per SCF cycle."""

    def std_scan(params, H, S, E, w, varying=False):
        N = H.shape[-1]
        rdt = jnp.real(H).dtype

        def scan_fn(carry, inputs):
            Eb, wb = inputs
            vals = jax.vmap(
                lambda e, ww: jnp.imag(_point_gr_weighted(
                    e, ww, H, S, params, sig_tot_fn, None,
                    exec_cfg)))(Eb, wb)
            return _kahan_add(carry, jnp.sum(vals, axis=0)), None

        init = (jnp.zeros((N, N), rdt), jnp.zeros((N, N), rdt))
        if varying:
            init = _pvary(init, (ENERGY_AXIS,))
        (s, c), _ = lax.scan(scan_fn, init, (E, w))
        return s + c

    chain_scan = _make_chain_scan(sig_tot_fn, exec_cfg, epilog="im")

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s):
            params, H, S, Er, wr, Ec, wc = merge_tree(
                (params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s))
            out = std_scan(params, H, S, Er[0], wr[0]) \
                + chain_scan(params, H, S, Ec[0], wc[0])
            return split_traced(out)
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s):
        def per_device(params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s):
            params, H, S, Er, wr, Ec, wc = merge_tree(
                (params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s))
            out = std_scan(params, H, S, Er[0], wr[0], varying=True) \
                + chain_scan(params, H, S, Ec[0], wc[0], varying=True)
            return split_traced(lax.psum(out, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS),
                      P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, H_s, S_s, Er_s, wr_s, Ec_s, wc_s)

    return engine


@lru_cache(maxsize=None)
def _build_sum_engine_chain(sig_tot_fn, exec_cfg: ExecutionConfig,
                            mesh: Optional[Mesh]):
    """Weighted G(E) sums by Newton-Schulz continuation along each lane.

    The blocked LU is sequential-latency bound (the pivoted panel loops),
    leaving the MXU mostly idle; on a dense sorted grid the neighbouring
    energy's inverse is an excellent Newton seed (error |dE|*||S G||), so
    most energies need only 2-3 quadratically-converging inverse
    iterations -- pure batched matmuls.  A per-step residual gate falls
    back to the batched LU (lax.cond, scalar predicate) for the first
    point of each lane segment, near resonances where ||G|| blows up, and
    on NaNs (NaN fails the gate by construction).
    """
    mixed = exec_cfg.precision == "mixed"
    k_steps = exec_cfg.chain_steps or (2 if mixed else 3)
    gate = _CHAIN_GATE_MIXED if mixed else _CHAIN_GATE_FAST
    _mm = zl._mm

    def assemble(params, e, H, S):
        sig = sig_tot_fn(params, e)
        return (e * S - H - sig).astype(H.dtype)

    def newton(A, X0, k):
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        X, r = X0, None
        for i in range(k):
            Y = _mm(A, X)
            if i == k - 1:
                r = jnp.max(jnp.abs(Y - eye))
            X = 2.0 * X - _mm(X, Y)
        return X, r

    def lu(A):
        if mixed:
            return zl.zinv_refined(A, steps=exec_cfg.refine_steps,
                                   bs=exec_cfg.lu_block,
                                   panel_impl=exec_cfg.lu_panel,
                                   trail=exec_cfg.lu_trail)
        return zl.zinv(A, bs=exec_cfg.lu_block,
                       panel_impl=exec_cfg.lu_panel,
                       trail=exec_cfg.lu_trail)

    def polish(A, X):
        eye = jnp.eye(A.shape[-1], dtype=A.dtype)
        R = eye - zl.matmul_hp3(A, X)
        ok = jnp.max(jnp.abs(R)) < 0.5
        return jnp.where(ok, X + zl._mm_corr(X, R), X)

    def device_body(params, H, S, E, w, varying=False):
        N = H.shape[-1]
        dt = H.dtype
        # see _make_chain_scan: exact-residual polish on complex128
        x64 = dt == jnp.complex128
        k_loc = max(k_steps, 3) if x64 else k_steps
        gate_loc = min(gate, _CHAIN_GATE_FAST) if x64 else gate
        lanes = E.shape[-1]
        init = ((jnp.zeros((N, N), dt), jnp.zeros((N, N), dt)),
                jnp.zeros((lanes, N, N), dt), jnp.array(False))
        if varying:
            init = _pvary(init, (ENERGY_AXIS,))

        def scan_fn(carry, inputs):
            acc, X_prev, valid = carry
            Eb, wb = inputs
            A = jax.vmap(lambda e: assemble(params, e, H, S))(Eb)
            Xn, r = jax.vmap(lambda a, x: newton(a, x, k_loc))(A, X_prev)
            ok = valid & (jnp.max(r) < gate_loc)
            X = lax.cond(ok, lambda a, x: x, lambda a, x: jax.vmap(lu)(a),
                         A, Xn)
            if mixed or x64:
                X = jax.vmap(polish)(A, X)
            contrib = jnp.sum(wb[:, None, None] * X, axis=0).astype(dt)
            # every subsequent step has a valid seed; `ok | True` (not a
            # fresh constant) keeps the carry's shard_map varying-ness
            return (_kahan_add(acc, contrib), X, ok | True), None

        (acc, _, _), _ = lax.scan(scan_fn, init, (E, w))
        return acc[0] + acc[1]

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s, w_s):
            params, H, S, E, w = merge_tree((params_s, H_s, S_s, E_s, w_s))
            return split_traced(device_body(params, H, S, E[0], w[0]))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s):
        def per_device(params_s, H_s, S_s, E_s, w_s):
            params, H, S, E, w = merge_tree((params_s, H_s, S_s, E_s, w_s))
            out = device_body(params, H, S, E[0], w[0], varying=True)
            return split_traced(lax.psum(out, ENERGY_AXIS))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, H_s, S_s, E_s, w_s)

    return engine


@lru_cache(maxsize=None)
def _dw_wrap(fn):
    """Lift a single-word sigma fn to the (hi, lo) interface (zero lo):
    the provider's own f32 evaluation floor then dominates the tier.
    The dw kernels pass E as a (hi, lo) pair; single-word providers see
    only the hi part."""
    def wrapped(params, E):
        if isinstance(E, tuple):
            E = E[0]
        s = fn(params, E)
        return s, jnp.zeros_like(s)
    return wrapped


def _cdw_add(s, x):
    """Complex double-word accumulate (TwoSum per component)."""
    s_hi, s_lo = s
    x_hi, x_lo = x
    t, e = zl.ctwo_sum(s_hi, x_hi)
    return t, s_lo + x_lo + e


@lru_cache(maxsize=None)
def _build_sum_engine_dw(point_fn, sig_tot_fn, sig_c_fn,
                         exec_cfg: ExecutionConfig, mesh: Optional[Mesh]):
    """'high'-tier engine: double-word accumulation end to end.

    Inputs arrive as (hi, lo) split pairs; per-point contributions are
    (hi, lo); reductions within the chunk, across chunks and across the
    mesh use TwoSum double-word adds, so the final density keeps ~1e-9
    information despite f32 storage (merged to f64 on the host)."""

    def device_body(params, H_dw, S_dw, E_dw, w_dw, varying=False):
        N = H_dw[0].shape[-1]
        dt = H_dw[0].dtype

        def scan_fn(carry, inputs):
            Eb_dw, wb_dw = inputs
            his, los = jax.vmap(
                lambda e_hi, e_lo, w_hi, w_lo: point_fn(
                    (e_hi, e_lo), (w_hi, w_lo), H_dw, S_dw, params,
                    sig_tot_fn, sig_c_fn, exec_cfg))(
                        Eb_dw[0], Eb_dw[1], wb_dw[0], wb_dw[1])

            def red(i, s):
                return _cdw_add(s, (his[i], los[i]))

            init_red = (jnp.zeros((N, N), dt), jnp.zeros((N, N), dt))
            if varying:
                # tie the constant carry seed to the data's varying-ness
                # (see CLAUDE.md: shard_map vma carries)
                init_red = _pvary(init_red, (ENERGY_AXIS,))
            chunk_sum = lax.fori_loop(0, his.shape[0], red, init_red)
            return _cdw_add(carry, chunk_sum), None

        init = (jnp.zeros((N, N), dt), jnp.zeros((N, N), dt))
        if varying:
            init = _pvary(init, (ENERGY_AXIS,))
        (s_hi, s_lo), _ = lax.scan(scan_fn, init, (E_dw, w_dw))
        return s_hi, s_lo

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s, w_s):
            params, H_dw, S_dw, E_dw, w_dw = merge_tree(
                (params_s, H_s, S_s, E_s, w_s))
            E_dw = (E_dw[0][0], E_dw[1][0])
            w_dw = (w_dw[0][0], w_dw[1][0])
            return split_traced(device_body(params, H_dw, S_dw, E_dw, w_dw))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s, w_s):
        def per_device(params_s, H_s, S_s, E_s, w_s):
            params, H_dw, S_dw, E_dw, w_dw = merge_tree(
                (params_s, H_s, S_s, E_s, w_s))
            E_dw = (E_dw[0][0], E_dw[1][0])
            w_dw = (w_dw[0][0], w_dw[1][0])
            s_hi, s_lo = device_body(params, H_dw, S_dw, E_dw, w_dw,
                                     varying=True)
            # a plain psum would round the hi parts in f32 (~eps * |sum|
            # per hop, measured 2e-7 on an 8-way mesh): gather the pairs
            # and combine with compensated double-word adds instead.  The
            # combined value is replicated but vma-typed varying; a psum of
            # the value masked to device 0 (zeros elsewhere) is EXACT in fp
            # and yields the invariant type out_specs=P() requires.
            g_hi = lax.all_gather(s_hi, ENERGY_AXIS)
            g_lo = lax.all_gather(s_lo, ENERGY_AXIS)
            acc = (g_hi[0], g_lo[0])
            for i in range(1, mesh.shape[ENERGY_AXIS]):
                acc = _cdw_add(acc, (g_hi[i], g_lo[i]))
            pick = jnp.where(lax.axis_index(ENERGY_AXIS) == 0, 1.0, 0.0)
            return split_traced((lax.psum(acc[0] * pick, ENERGY_AXIS),
                                 lax.psum(acc[1] * pick, ENERGY_AXIS)))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS), P(ENERGY_AXIS)),
            out_specs=P(),
        )(params_s, H_s, S_s, E_s, w_s)

    return engine


@lru_cache(maxsize=None)
def _build_map_engine(point_fn, fns, exec_cfg: ExecutionConfig,
                      mesh: Optional[Mesh]):
    """Jitted engine mapping an observable over the energy grid.

    fns is a tuple of sigma-apply functions consumed by the point kernel.
    Returns per-energy values with the input's (nd, nc, ch) layout.
    """

    def device_body(params, H, S, E):
        def scan_fn(_, Eb):
            vals = jax.vmap(
                lambda e: point_fn(e, H, S, params, *fns, exec_cfg))(Eb)
            return None, vals

        _, out = lax.scan(scan_fn, None, E)
        return out

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s):
            params, H, S, E = merge_tree((params_s, H_s, S_s, E_s))
            return split_traced(device_body(params, H, S, E[0])[None])
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s):
        def per_device(params_s, H_s, S_s, E_s):
            params, H, S, E = merge_tree((params_s, H_s, S_s, E_s))
            return split_traced(device_body(params, H, S, E[0])[None])

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS)),
            out_specs=P(ENERGY_AXIS),
        )(params_s, H_s, S_s, E_s)

    return engine


@lru_cache(maxsize=None)
def _build_map_engine_dw(point_fn, fns, exec_cfg: ExecutionConfig,
                         mesh: Optional[Mesh]):
    """'high'/'exact' per-energy map engine.

    H/S/E arrive as double-word split pairs; the point kernel returns a
    (hi, lo) pytree per energy which the host merges into f64."""

    def device_body(params, H_dw, S_dw, E_dw):
        def scan_fn(_, Eb_dw):
            vals = jax.vmap(
                lambda e_hi, e_lo: point_fn((e_hi, e_lo), H_dw, S_dw,
                                            params, *fns, exec_cfg))(
                                                Eb_dw[0], Eb_dw[1])
            return None, vals

        _, out = lax.scan(scan_fn, None, E_dw)
        return out

    if mesh is None:
        @jax.jit
        def engine(params_s, H_s, S_s, E_s):
            params, H_dw, S_dw, E_dw = merge_tree(
                (params_s, H_s, S_s, E_s))
            E_dw = (E_dw[0][0], E_dw[1][0])
            out = device_body(params, H_dw, S_dw, E_dw)
            return split_traced(jax.tree_util.tree_map(
                lambda x: x[None], out))
        return engine


    @jax.jit
    def engine(params_s, H_s, S_s, E_s):
        def per_device(params_s, H_s, S_s, E_s):
            params, H_dw, S_dw, E_dw = merge_tree(
                (params_s, H_s, S_s, E_s))
            E_dw = (E_dw[0][0], E_dw[1][0])
            out = device_body(params, H_dw, S_dw, E_dw)
            return split_traced(jax.tree_util.tree_map(
                lambda x: x[None], out))

        return shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(), P(), P(ENERGY_AXIS)),
            out_specs=P(ENERGY_AXIS),
        )(params_s, H_s, S_s, E_s)

    return engine


# ---------------------------------------------------------------------------
# Host-side drivers: padding, chunking, un-padding
# ---------------------------------------------------------------------------

def _layout(E, w, mesh: Optional[Mesh], chunk: int):
    """Pad and reshape host grids to (n_dev, n_chunks, chunk)."""
    E = np.asarray(E)
    w = np.asarray(w) if w is not None else None
    n_dev = 1 if mesh is None else mesh.shape[ENERGY_AXIS]
    n = E.size
    per = n_dev * chunk
    n_pad = (-n) % per
    # pad with a repeat of the first node at zero weight (keeps solves regular)
    E_pad = np.concatenate([E, np.full(n_pad, E.flat[0], dtype=E.dtype)])
    n_chunks = E_pad.size // per
    E_lay = E_pad.reshape(n_chunks, n_dev, chunk).transpose(1, 0, 2)
    if w is None:
        return E_lay, None, n, n_pad
    w_pad = np.concatenate([w, np.zeros(n_pad, dtype=w.dtype)])
    w_lay = w_pad.reshape(n_chunks, n_dev, chunk).transpose(1, 0, 2)
    return E_lay, w_lay, n, n_pad


def _unlayout(vals, n):
    """Invert _layout for per-energy outputs: (nd, nc, ch, ...) -> (n, ...)."""
    vals = np.asarray(vals)
    nd, nc, ch = vals.shape[:3]
    flat = vals.transpose(1, 0, 2, *range(3, vals.ndim)).reshape(
        (nd * nc * ch,) + vals.shape[3:])
    return flat[:n]


def _layout_lane_major(E, mesh: Optional[Mesh], chunk: int, fill=None):
    """Warm-start layout: each lane owns a CONTIGUOUS energy segment, so
    successive chunks continue the same lane's grid (previous-point
    initialization stays local).  fill: padding value (defaults to the last
    node; use 0 for weights so padding contributes nothing)."""
    E = np.asarray(E)
    n_dev = 1 if mesh is None else mesh.shape[ENERGY_AXIS]
    n = E.size
    per = n_dev * chunk
    n_pad = (-n) % per
    fill_val = E.flat[-1] if fill is None else fill
    E_pad = np.concatenate([E, np.full(n_pad, fill_val, dtype=E.dtype)])
    n_chunks = E_pad.size // per
    # (d, c, j) = E[(d*chunk + j)*n_chunks + c]
    E_lay = E_pad.reshape(n_dev, chunk, n_chunks).transpose(0, 2, 1)
    return E_lay, n, n_pad


def _unlayout_lane_major(vals, n):
    vals = np.asarray(vals)
    nd, nc, ch = vals.shape[:3]
    flat = vals.transpose(0, 2, 1, *range(3, vals.ndim)).reshape(
        (nd * ch * nc,) + vals.shape[3:])
    return flat[:n]


def _auto_chunk_cfg(exec_cfg: ExecutionConfig, N: int) -> ExecutionConfig:
    """Resolve energy_chunk=0: largest power-of-two chunk whose live solve
    buffers (~72 N^2 bytes per lane: the [A|B] work pair, trailing copies
    and the refinement operands) fit a ~7 GB budget, clamped to [1, 32].

    Resolved once per engine so the frozen config keeps keying the
    lru-cached engine builders."""
    import dataclasses
    budget = 7e9
    chunk = 1
    while chunk * 2 <= 32 and (chunk * 2) * 72 * N * N <= budget:
        chunk *= 2
    return dataclasses.replace(exec_cfg, energy_chunk=chunk)


def _cdtype(exec_cfg):
    # x64 runtimes (CPU goldens / strict runs) use complex128; TPU runtimes
    # use complex64 with optional iterative refinement ('mixed').
    if jax.config.jax_enable_x64:
        return np.complex128
    return np.complex64



_OPERAND_DEV_CACHE = {}   # (content digest, mesh key) -> device split tree


def _content_digest(tree):
    """Hashable content key of a host NumPy pytree (treedef + per-leaf
    shape/dtype + blake2b of the bytes), or None for non-array leaves
    that numpy cannot serialize."""
    import hashlib
    import jax.tree_util as jtu
    leaves, treedef = jtu.tree_flatten(tree)
    h = hashlib.blake2b(digest_size=16)
    meta = []
    try:
        for leaf in leaves:
            a = np.ascontiguousarray(np.asarray(leaf))
            meta.append((a.shape, a.dtype.str))
            h.update(a.tobytes())
    except Exception:
        return None
    return (treedef, tuple(meta), h.hexdigest())


_SPECTRAL_UNSET = object()


class EnergyEngine:
    """Bound engine for a fixed (H, S, provider) system.

    Prepares split-complex H/S and provider params once; methods accept
    host-side energy grids and return host numpy results.
    """

    def __init__(self, H, S, provider, exec_cfg: ExecutionConfig = _DEFAULT_EXEC,
                 mesh: Optional[Mesh] = None):
        self.provider = provider
        # host f64 copies feed the spectral route's eigh (ops/spectral.py);
        # kept as plain references (the basis cache digests content)
        self._H_host = np.asarray(H)
        self._S_host = np.asarray(S)
        self._spectral = _SPECTRAL_UNSET
        self._spectral_fb = None
        # remember whether the chunk was auto-resolved: the LU heuristic
        # (72 N^2 B/lane) starves the spectral engine at large N (its
        # per-lane footprint is ~64 k N B, not N^2) -- the runner picks
        # its own chunk in that case
        self._chunk_was_auto = not exec_cfg.energy_chunk
        if not exec_cfg.energy_chunk:
            exec_cfg = _auto_chunk_cfg(exec_cfg, np.asarray(H).shape[-1])
        self.exec_cfg = exec_cfg
        self.mesh = mesh
        self.high = exec_cfg.precision in ("high", "exact")
        self.cdtype = np.complex64 if self.high else _cdtype(exec_cfg)
        if self.high:
            self.H_s = self._dw_split(H)
            self.S_s = self._dw_split(S)
        else:
            self.H_s = split_tree(np.asarray(H, dtype=self.cdtype),
                                  self.cdtype)
            self.S_s = split_tree(np.asarray(S, dtype=self.cdtype),
                                  self.cdtype)
        # Device-resident operands: numpy jit arguments are RE-UPLOADED on
        # every dispatch -- through the axon tunnel the N^2 H/S pairs cost
        # ~2.7 s/call at N=2000 (measured: 19.1 -> 32.0 pts/s from this
        # device_put alone, results bit-identical).  H/S are copied into
        # the split trees at construction, so residency is safe even if
        # the caller later mutates its H.  The content-keyed global cache
        # additionally spares the S re-upload when SCF cycles rebuild the
        # engine with a fresh F but the same overlap.
        self.H_s = self._put_cached(self.H_s)
        self.S_s = self._put_cached(self.S_s)
        self._params_dev = {}          # content digest -> device split tree
        self._pole_checked = set()     # grid digests already guard-checked

    def _mesh_key(self):
        if self.mesh is None:
            return None
        return (tuple(self.mesh.devices.flat), self.mesh.axis_names)

    def _put_replicated(self, tree):
        """device_put a host pytree (replicated over the mesh if any);
        falls back to host arrays if placement fails (e.g. exotic
        multi-host configurations)."""
        try:
            if self.mesh is None:
                return jax.device_put(tree)
            from jax.sharding import NamedSharding
            return jax.device_put(tree, NamedSharding(self.mesh, P()))
        except Exception:
            return tree

    def _put_cached(self, tree):
        """device_put through a global content-keyed LRU, so identical
        operand trees (the unchanged S across SCF cycles, repeated engine
        builds on one system) upload once per process."""
        digest = _content_digest(tree)
        if digest is None:
            return self._put_replicated(tree)
        key = (digest, self._mesh_key())
        hit = _OPERAND_DEV_CACHE.pop(key, None)
        if hit is not None:
            _OPERAND_DEV_CACHE[key] = hit
            return hit
        dev = self._put_replicated(tree)
        if len(_OPERAND_DEV_CACHE) >= 8:
            _OPERAND_DEV_CACHE.pop(next(iter(_OPERAND_DEV_CACHE)))
        _OPERAND_DEV_CACHE[key] = dev
        return dev

    def _dw_split(self, x):
        """Exact two-float decomposition of an f64 array, each half as a
        complex-safe split pair."""
        x = np.asarray(x, dtype=np.complex128)
        hi = x.astype(np.complex64)
        lo = (x - hi.astype(np.complex128)).astype(np.complex64)
        return (split_tree(hi, np.complex64), split_tree(lo, np.complex64))

    def _prep(self, E, w):
        E_lay, w_lay, n, _ = _layout(
            np.asarray(E, dtype=np.complex128),
            None if w is None else np.asarray(w, dtype=np.complex128),
            self.mesh, self.exec_cfg.energy_chunk)
        E_s = split_tree(E_lay.astype(self.cdtype), self.cdtype)
        w_s = None if w_lay is None else split_tree(
            w_lay.astype(self.cdtype), self.cdtype)
        return E_s, w_s, n

    def _params_split(self, params):
        """Split params and keep them device-resident across dispatches.

        Provider params are host NumPy pytrees that can be N^2-sized
        (e.g. ConstantSelfEnergy's stacked sigmas) -- re-uploading them
        every call costs seconds through the tunnel.  They are cached by
        CONTENT digest (blake2b), not object identity: providers like
        Chain1DSelfEnergy.setF mutate their arrays in place, so identity
        keying would serve stale physics.  The digest costs ~1 ms per
        16 MB -- noise against the upload it avoids."""
        key = _content_digest(params)
        if key is None:
            return split_tree(params, self.cdtype)
        hit = self._params_dev.pop(key, None)
        if hit is not None:
            self._params_dev[key] = hit    # LRU: move-to-end on hit, so a
            # steady-state cycle through several param trees keeps its hot
            # entries instead of FIFO-evicting them every round
            return hit
        dev = self._put_replicated(split_tree(params, self.cdtype))
        if len(self._params_dev) >= 6:     # bound device memory
            self._params_dev.pop(next(iter(self._params_dev)))
        self._params_dev[key] = dev
        return dev

    def _log_dispatch(self, kind, n_energies):
        from gaunegf_tpu.utils.logging import get_logger
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        Hs = self.H_s[0] if self.high else self.H_s
        get_logger("engine").debug(
            f"{kind}: N={Hs.re.shape[-1]} nE={n_energies} "
            f"chunk={self.exec_cfg.energy_chunk} devices={n_dev} "
            f"precision={self.exec_cfg.precision}")

    def _cast_state(self, init):
        import jax.tree_util as jtu
        return jtu.tree_map(lambda x: np.asarray(x).astype(self.cdtype),
                            init)

    def _warm_sum(self, kind, E, w, contact=None):
        wfn, params, init = self.provider.contacts_warm_apply()
        init = self._cast_state(init)
        eng = _build_sum_engine_warm(kind, wfn, self.exec_cfg, self.mesh,
                                     contact)
        E_lay, _, _ = _layout_lane_major(
            np.asarray(E, dtype=np.complex128), self.mesh,
            self.exec_cfg.energy_chunk)
        w_lay, _, _ = _layout_lane_major(
            np.asarray(w, dtype=np.complex128), self.mesh,
            self.exec_cfg.energy_chunk, fill=0.0)
        out = eng(self._params_split(params), self.H_s, self.S_s,
                  split_tree(E_lay.astype(self.cdtype), self.cdtype),
                  split_tree(w_lay.astype(self.cdtype), self.cdtype),
                  split_tree(init, self.cdtype))
        return merge_host(out).astype(np.complex128)

    def _use_warm(self):
        """Warm engines engage when the provider has a warm interface AND
        recommends it (``warm_profitable``; Bethe: yes -- its sigma
        evaluation dominates; chain: no -- measured 0.84x on TPU T(E),
        round 3).  ``warm_start="force"`` overrides the recommendation."""
        ws = self.exec_cfg.warm_start
        if not ws or self.high:
            return False
        if getattr(self.provider, "contacts_warm_apply", None) is None:
            return False
        if ws == "force":
            return True
        return bool(getattr(self.provider, "warm_profitable", True))

    def _has_dw_sigma(self):
        return (getattr(self.provider, "total_apply_dw", None) is not None
                and getattr(self.provider, "contact_apply_dw", None)
                is not None)

    def _dw_total(self):
        if self._has_dw_sigma():
            return self.provider.total_apply_dw()
        fn, params = self.provider.total_apply()
        return _dw_wrap(fn), params

    def _dw_contact(self, i):
        if self._has_dw_sigma():
            return self.provider.contact_apply_dw(i)
        fn, params = self.provider.contact_apply(i)
        return _dw_wrap(fn), params

    def gr_sum(self, E, w, epilog=None):
        """sum_k w_k G(E_k); parity with integrate.GrInt.

        epilog='im': return Im(sum) as a real array, computed on device in
        the standard engine (halved transfer; see _build_sum_engine) and on
        the host for the warm / continuation / double-word / spectral
        paths.

        solver='spectral' routes through ops/spectral.py: the grid is
        host-partitioned by pole distance -- the spectral dispatch serves
        the bulk, and the few points inside spectral_dist_lu of a bare
        eigenvalue (where the Woodbury assembly floors but the LU is
        well-conditioned) get a second LU dispatch."""
        from gaunegf_tpu.utils.logging import perf_span
        self._log_dispatch("gr_sum", np.size(E))
        runner = self._spectral_runner()
        if runner is not None:
            (Eg, wg), (Eb, wb) = runner.split_grid(E, w)
            if Eg.size:
                with perf_span("gr_sum_spectral", nE=Eg.size):
                    out = runner.gr_sum(self.provider, self._params_split,
                                        Eg, wg, epilog=epilog)
                if out is not None:
                    if Eb.size:
                        out = out + self._spectral_fallback_engine() \
                            ._gr_sum_lu(Eb, wb, epilog)
                    return out
        return self._gr_sum_lu(E, w, epilog)

    def _spectral_fallback_engine(self):
        """Exact-tier sibling serving the spectral route's sub-dist_lu
        points.  Those sit within 1e-5 of a bare eigenvalue; when the
        eigenvector couples weakly to the contacts, cond(A) reaches
        ~1e6+ and the MIXED refinement floors at cond * u_res ~ 1e-1
        (measured 17% on a dist-4.4e-7 point, e41 round 4).  The exact
        tier's error-free Ozaki residuals hold cond * 1e-13 ~ 1e-7.
        The dispatch is a handful of points per grid (chunk 4), so the
        f64-class tier costs nothing at the grid scale."""
        if self._spectral_fb is None:
            import dataclasses
            cfg = dataclasses.replace(
                self.exec_cfg, precision="exact", solver="lu",
                energy_chunk=4, continuation=False)
            self._spectral_fb = EnergyEngine(
                self._H_host, self._S_host, self.provider, cfg, self.mesh)
        return self._spectral_fb

    def _near_pole_guard(self, E):
        """Warn when a fast/mixed LU dispatch is asked for near-pole
        real-axis points, where the refined-f32 tier floors at
        cond * u_res above its accuracy contract (PARITY.md round-4
        caveat; e41: error 1.66e-1 at pole distance 4.4e-7 vs the 2e-6
        mixed contract).  Host-side, once per (system, grid): distances
        are measured against the bare (H, S) pencil eigenvalues -- the
        same basis the spectral route uses, through its content-keyed
        cache, so SCF cycles pay at most one host eigh per Fock and
        nothing when the spectral route already ran.  Contour and
        eta-broadened grids pass untouched (|Im E| bounds the pole
        distance); complex or non-symmetric pencils have no cheap
        characterization and are skipped silently."""
        cfg = self.exec_cfg
        if cfg.precision not in ("fast", "mixed") or not cfg.near_pole_warn:
            return
        E = np.asarray(E)
        if E.size == 0:
            return
        key = hash(E.tobytes())
        if key in self._pole_checked:
            return
        self._pole_checked.add(key)
        thresh = cfg.spectral_dist_f32
        z = E.astype(np.complex128).ravel()
        cand = np.abs(z.imag) < thresh
        if not cand.any():
            return
        from gaunegf_tpu.ops.spectral import spectral_basis
        basis = spectral_basis(self._H_host, self._S_host)
        if basis is None:
            return
        lam = basis[0]
        d = np.abs(z[cand][:, None] - lam[None, :]).min(axis=1)
        dmin = float(d.min())
        if dmin < thresh:
            import warnings
            warnings.warn(
                f"LU '{cfg.precision}' tier: {int((d < thresh).sum())} grid "
                f"point(s) within {thresh:g} of a bare eigenvalue of the "
                f"(H, S) pencil (closest {dmin:.2e}); the refined-f32 solve "
                f"floors at cond * u_res there and can exceed its accuracy "
                f"contract (measured up to 1.7e-1 at dist 4.4e-7 -- see "
                f"PARITY.md).  Use solver='auto'/'spectral' (pole-deflated, "
                f"in-contract at any distance) or precision='high'/'exact', "
                f"or set near_pole_warn=False to silence.",
                RuntimeWarning, stacklevel=3)

    def _gr_sum_lu(self, E, w, epilog=None):
        """The LU engine family (warm / continuation / dw / mp / standard)."""
        from gaunegf_tpu.utils.logging import perf_span
        self._near_pole_guard(E)

        def _ep(out):
            return np.imag(out) if epilog == "im" else out

        if self._use_warm():
            return _ep(self._warm_sum("gr", E, w))
        fn, params = self.provider.total_apply()
        # continuation == "contour" applies only inside the grid-aware
        # fused dispatch (density_eq_split); plain grids keep the LU path
        if self.exec_cfg.continuation is True and not self.high:
            eng = _build_sum_engine_chain(fn, self.exec_cfg, self.mesh)
            E_lay, _, _ = _layout_lane_major(
                np.asarray(E, dtype=np.complex128), self.mesh,
                self.exec_cfg.energy_chunk)
            w_lay, _, _ = _layout_lane_major(
                np.asarray(w, dtype=np.complex128), self.mesh,
                self.exec_cfg.energy_chunk, fill=0.0)
            with perf_span("gr_sum_chain", nE=np.size(E)):
                out = eng(self._params_split(params), self.H_s, self.S_s,
                          split_tree(E_lay.astype(self.cdtype), self.cdtype),
                          split_tree(w_lay.astype(self.cdtype), self.cdtype))
            return _ep(merge_host(out).astype(np.complex128))
        if self.high:
            fn, params = self._dw_total()
            if self._model_shards(dw_ok=True) > 1:
                eng = _build_sum_engine_dw_mp(_point_gr_weighted_dw_cols,
                                              fn, None, self.exec_cfg,
                                              self.mesh)
            else:
                eng = _build_sum_engine_dw(_point_gr_weighted_dw, fn, None,
                                           self.exec_cfg, self.mesh)
            E_lay, w_lay, _, _ = _layout(
                np.asarray(E, dtype=np.complex128),
                np.asarray(w, dtype=np.complex128),
                self.mesh, self.exec_cfg.energy_chunk)
            with perf_span("gr_sum_dw", nE=np.size(E)):
                out = eng(self._params_split(params), self.H_s, self.S_s,
                          self._dw_split(E_lay), self._dw_split(w_lay))
            hi, lo = merge_host(out)
            return _ep(hi.astype(np.complex128) + lo.astype(np.complex128))
        if self._model_shards() > 1:
            eng = _build_sum_engine_mp(_point_gr_weighted_cols_mp, fn, None,
                                       self.exec_cfg, self.mesh,
                                       epilog=epilog)
        else:
            eng = _build_sum_engine(_point_gr_weighted, fn, None,
                                    self.exec_cfg, self.mesh, epilog=epilog)
        E_s, w_s, _ = self._prep(E, w)
        with perf_span("gr_sum", nE=np.size(E)):
            out = eng(self._params_split(params), self.H_s, self.S_s,
                      E_s, w_s)
        out = merge_host(out)
        return out.astype(np.float64) if epilog == "im" \
            else out.astype(np.complex128)

    def _spectral_runner(self):
        """Lazy spectral-route state; None when disabled or unavailable.

        Engages for solver='spectral'/'auto' on the single-word tiers (the dw
        tiers keep their LU engines until a dw-sigma spectral variant
        lands).  Availability is decided once per engine: the pencil must
        be real-symmetric-definite and Sigma = c0*S + contact block
        (ops/spectral.py detect_structure)."""
        if self.exec_cfg.solver not in ("spectral", "auto") or self.high:
            return None
        if self.exec_cfg.precision == "strict":
            return None
        # the spectral engines shard over 'e' only; an active model axis
        # means the caller wants the column-sharded / distributed LU
        # family (zinv_refined_cols / zsolve_dist), which the spectral
        # route would silently bypass -- decline and fall back
        if (self.mesh is not None
                and self.mesh.shape.get(MODEL_AXIS, 1) > 1):
            return None
        # continuation=True is an explicit opt-in for the Newton-Schulz
        # chain (the default 'contour' only shapes the fused LU eq
        # dispatch); honor it rather than silently rerouting
        if self.exec_cfg.continuation is True:
            return None
        if self._spectral is _SPECTRAL_UNSET:
            from gaunegf_tpu.ops.spectral import SpectralRunner
            H_host = self._H_host if self._H_host is not None else None
            if H_host is None:
                self._spectral = None
            else:
                try:
                    r = SpectralRunner(H_host, self._S_host, self.provider,
                                       self.exec_cfg, self.mesh,
                                       put_fn=self._put_cached,
                                       chunk_auto=self._chunk_was_auto)
                    self._spectral = r if r.available else None
                except Exception:
                    self._spectral = None
            if self._spectral is None:
                from gaunegf_tpu.utils.logging import get_logger
                get_logger("engine").debug(
                    "spectral route unavailable; falling back to LU")
        return self._spectral

    def _model_shards(self, dw_ok: bool = False) -> int:
        """Active 'm'-axis size for the column-sharded engine paths.

        1 (replicated) unless the mesh has a >1 model axis AND the orbital
        count divides it.  The warm / continuation engine families always
        run replicated across 'm' (correct, just not distributed); the dw
        tiers shard only where a dw *_cols kernel exists (``dw_ok=True``:
        currently the gr_sum path)."""
        if self.mesh is None or MODEL_AXIS not in self.mesh.shape:
            return 1
        m = self.mesh.shape[MODEL_AXIS]
        N = (self.H_s[0] if self.high else self.H_s).re.shape[-1]
        if (m == 1 or N % m or (self.high and not dw_ok)
                or self.exec_cfg.continuation is True or self._use_warm()):
            return 1
        return m

    def _contact_inds(self, contact):
        """Static contact support for the low-rank path, or None."""
        if not self.exec_cfg.use_lowrank:
            return None
        getter = getattr(self.provider, "contact_inds", None)
        if getter is None:
            return None
        inds = getter(contact)
        if inds is None:
            return None
        inds = tuple(int(i) for i in inds)
        N = self.H_s.re.shape[-1]
        if len(inds) > N // 2:
            return None
        return inds

    def gless_sum(self, E, w, contact: Optional[int] = None):
        """sum_k w_k [G Gamma_i G^+](E_k); parity with integrate.GrLessInt.

        solver='spectral': same host partition as gr_sum -- the sandwich
        sum runs as stacked rank-k products in the eigenbasis, pathological
        near-pole points ride a second LU dispatch."""
        from gaunegf_tpu.utils.logging import perf_span
        runner = self._spectral_runner()
        if runner is not None:
            (Eg, wg), (Eb, wb) = runner.split_grid(E, w)
            if Eg.size:
                with perf_span("gless_sum_spectral", nE=Eg.size):
                    out = runner.gless_sum(self.provider, self._params_split,
                                           Eg, wg, contact)
                if out is not None:
                    if Eb.size:
                        out = out + self._spectral_fallback_engine() \
                            ._gless_sum_lu(Eb, wb, contact)
                    return out
        return self._gless_sum_lu(E, w, contact)

    def _gless_sum_lu(self, E, w, contact: Optional[int] = None):
        self._near_pole_guard(E)
        if self._use_warm():
            return self._warm_sum("gless", E, w, contact)
        fn, params = self.provider.total_apply()
        cfn = None
        if contact is not None:
            cfn, params = self.provider.contact_apply(contact)
            fn, _ = self.provider.total_apply()
        if self.high:
            fn, params = self._dw_total()
            if contact is not None:
                cfn, params = self._dw_contact(contact)
            eng = _build_sum_engine_dw(_point_gless_weighted_dw, fn, cfn,
                                       self.exec_cfg, self.mesh)
            E_lay, w_lay, _, _ = _layout(
                np.asarray(E, dtype=np.complex128),
                np.asarray(w, dtype=np.complex128),
                self.mesh, self.exec_cfg.energy_chunk)
            out = eng(self._params_split(params), self.H_s, self.S_s,
                      self._dw_split(E_lay), self._dw_split(w_lay))
            hi, lo = merge_host(out)
            return hi.astype(np.complex128) + lo.astype(np.complex128)
        c = self._contact_inds(contact)
        m = self._model_shards()
        if m > 1:
            if c is not None:
                eng = _build_sum_engine_mp(
                    _point_gless_weighted_lowrank_cols, fn, cfn,
                    self.exec_cfg, self.mesh, extra=(c,))
            else:
                eng = _build_sum_engine_mp(
                    _point_gless_weighted_full_cols, fn, cfn,
                    self.exec_cfg, self.mesh)
        elif c is not None:
            eng = _build_sum_engine(_point_gless_weighted_lowrank, fn, cfn,
                                    self.exec_cfg, self.mesh, extra=(c,))
        else:
            eng = _build_sum_engine(_point_gless_weighted, fn, cfn,
                                    self.exec_cfg, self.mesh)
        E_s, w_s, _ = self._prep(E, w)
        out = eng(self._params_split(params), self.H_s, self.S_s, E_s, w_s)
        return merge_host(out).astype(np.complex128)

    def density_neq_sum(self, E_eq, w_eq, E_neq, w_neq,
                        contact: Optional[int] = None):
        """Im(sum w G) over the eq grid + sum w [G Gamma G+] over the bias
        window, combined on device -- ONE dispatch and ONE transfer per
        biased SCF cycle (scale factors belong in the weights).

        Falls back to gr_sum + gless_sum (two dispatches) for the warm /
        double-word / continuation engine families, which have no fused
        variant; model-sharded runs use the fused ('e', 'm') sibling."""
        self._log_dispatch("density_neq", np.size(E_eq) + np.size(E_neq))
        if (self._use_warm() or self.high
                or self.exec_cfg.continuation is True
                or self._spectral_runner() is not None):
            # spectral: two (cheap) spectral dispatches beat one fused LU
            # dispatch; the eq leg ships only Im on device either way
            return (self.gr_sum(E_eq, w_eq, epilog="im")
                    + self.gless_sum(E_neq, w_neq, contact))
        from gaunegf_tpu.utils.logging import perf_span
        fn, params = self.provider.total_apply()
        cfn = None
        if contact is not None:
            cfn, params = self.provider.contact_apply(contact)
            fn, _ = self.provider.total_apply()
        c = self._contact_inds(contact)
        if self._model_shards() > 1:
            eng = _build_density_neq_engine_mp(fn, cfn, c, self.exec_cfg,
                                               self.mesh)
        else:
            eng = _build_density_neq_engine(fn, cfn, c, self.exec_cfg,
                                            self.mesh)
        Eq_s, wq_s, _ = self._prep(E_eq, w_eq)
        En_s, wn_s, _ = self._prep(E_neq, w_neq)
        with perf_span("density_neq",
                       nE=np.size(E_eq) + np.size(E_neq)):
            out = eng(self._params_split(params), self.H_s, self.S_s,
                      Eq_s, wq_s, En_s, wn_s)
        return merge_host(out).astype(np.complex128)

    def density_eq_split(self, E_real, w_real, E_contour, w_contour):
        """Im(sum w G) over real-axis + contour grids in ONE dispatch, the
        contour lanes riding Newton-Schulz continuation (grid-aware: the
        real segment keeps batched LU).  Falls back to a single fused
        gr_sum when continuation does not apply (warm/high/model-sharded
        engines, or continuation disabled)."""
        use_split = (self.exec_cfg.continuation in ("contour", True)
                     and not self.high and not self._use_warm()
                     and self._model_shards() == 1
                     and self._spectral_runner() is None)
        if not use_split:
            E = np.concatenate([np.asarray(E_real, complex),
                                np.asarray(E_contour, complex)])
            w = np.concatenate([np.asarray(w_real, complex),
                                np.asarray(w_contour, complex)])
            return self.gr_sum(E, w, epilog="im")
        from gaunegf_tpu.utils.logging import perf_span
        fn, params = self.provider.total_apply()
        eng = _build_density_eq_split_engine(fn, self.exec_cfg, self.mesh)
        Er_s, wr_s, _ = self._prep(E_real, w_real)
        Ec_lay, _, _ = _layout_lane_major(
            np.asarray(E_contour, dtype=np.complex128), self.mesh,
            self.exec_cfg.energy_chunk)
        wc_lay, _, _ = _layout_lane_major(
            np.asarray(w_contour, dtype=np.complex128), self.mesh,
            self.exec_cfg.energy_chunk, fill=0.0)
        with perf_span("density_eq_split",
                       nE=np.size(E_real) + np.size(E_contour)):
            out = eng(self._params_split(params), self.H_s, self.S_s,
                      Er_s, wr_s,
                      split_tree(Ec_lay.astype(self.cdtype), self.cdtype),
                      split_tree(wc_lay.astype(self.cdtype), self.cdtype))
        return merge_host(out).astype(np.float64)

    def transmission(self, E):
        """T(E) over the grid (restricted channel).

        solver='spectral': T is evaluated entirely in the contact subspace
        (O(N k^2) per point, no N x N work at all); near-pole points are
        computed by the LU path and scattered back into place."""
        from gaunegf_tpu.utils.logging import perf_span
        runner = self._spectral_runner()
        if runner is not None and getattr(self.provider, "contact_apply",
                                          None) is not None:
            E_arr = np.asarray(E, dtype=np.complex128)
            bad = runner.bad_mask(E_arr)
            if not bad.all():
                with perf_span("transmission_spectral",
                               nE=int((~bad).sum())):
                    good_vals = runner.transmission(
                        self.provider, self._params_split, E_arr[~bad])
                if good_vals is not None:
                    vals = np.empty(E_arr.size, dtype=np.float64)
                    vals[~bad] = good_vals
                    if bad.any():
                        vals[bad] = self._spectral_fallback_engine() \
                            ._transmission_lu(E_arr[bad])
                    return vals
        return self._transmission_lu(E)

    def _transmission_lu(self, E):
        if self._use_warm():
            wfn, params, init = self.provider.contacts_warm_apply()
            init = self._cast_state(init)
            cw1 = self._contact_inds(0)
            cw2 = self._contact_inds(-1)
            lowrank = (cw1, cw2) if (cw1 is not None and cw2 is not None) \
                else None
            eng = _build_trans_engine_warm(wfn, self.exec_cfg, self.mesh,
                                           lowrank=lowrank)
            E_lay, n, _ = _layout_lane_major(
                np.asarray(E, dtype=np.complex128), self.mesh,
                self.exec_cfg.energy_chunk)
            E_s = split_tree(E_lay.astype(self.cdtype), self.cdtype)
            out = eng(self._params_split(params), self.H_s, self.S_s, E_s,
                      split_tree(init, self.cdtype))
            return _unlayout_lane_major(merge_host(out), n).real
        fn, params = self.provider.total_apply()
        g1, _ = self.provider.contact_apply(0)
        g2, _ = self.provider.contact_apply(-1)
        if self.high:
            fn, params = self._dw_total()
            g1, _ = self._dw_contact(0)
            g2, _ = self._dw_contact(-1)
            eng = _build_map_engine_dw(_point_transmission_dw, (fn, g1, g2),
                                       self.exec_cfg, self.mesh)
            E_lay, _, n, _ = _layout(np.asarray(E, dtype=np.complex128),
                                     None, self.mesh,
                                     self.exec_cfg.energy_chunk)
            hi, lo = merge_host(eng(self._params_split(params), self.H_s,
                                    self.S_s, self._dw_split(E_lay)))
            return _unlayout(hi.astype(np.float64)
                             + lo.astype(np.float64), n)
        c1 = self._contact_inds(0)
        c2 = self._contact_inds(-1)
        m = self._model_shards()
        if m > 1:
            if c1 is not None and c2 is not None:
                eng = _build_map_engine_mp(_point_transmission_lowrank_cols,
                                           (fn, g1, g2, c1, c2),
                                           self.exec_cfg, self.mesh)
            else:
                eng = _build_map_engine_mp(_point_transmission_full_cols,
                                           (fn, g1, g2),
                                           self.exec_cfg, self.mesh)
        elif c1 is not None and c2 is not None:
            eng = _build_map_engine(_point_transmission_lowrank,
                                    (fn, g1, g2, c1, c2),
                                    self.exec_cfg, self.mesh)
        else:
            eng = _build_map_engine(_point_transmission, (fn, g1, g2),
                                    self.exec_cfg, self.mesh)
        E_s, _, n = self._prep(E, None)
        out = merge_host(eng(self._params_split(params), self.H_s,
                             self.S_s, E_s))
        return _unlayout(out, n).real

    def map_engine(self, point_fn, fns, E):
        """Run a custom per-energy observable kernel over the grid."""
        _, params = self.provider.total_apply()
        eng = _build_map_engine(point_fn, fns, self.exec_cfg, self.mesh)
        E_s, _, n = self._prep(E, None)
        out = merge_host(eng(self._params_split(params), self.H_s,
                             self.S_s, E_s))
        return _unlayout(out, n)

    def gr_diag(self, E):
        """diag G(E) over the grid (DOS building block)."""
        fn, params = self.provider.total_apply()
        if self.high:
            fn, params = self._dw_total()
            eng = _build_map_engine_dw(_point_gr_diag_dw, (fn,),
                                       self.exec_cfg, self.mesh)
            E_lay, _, n, _ = _layout(np.asarray(E, dtype=np.complex128),
                                     None, self.mesh,
                                     self.exec_cfg.energy_chunk)
            hi, lo = merge_host(eng(self._params_split(params), self.H_s,
                                    self.S_s, self._dw_split(E_lay)))
            return _unlayout(hi.astype(np.complex128)
                             + lo.astype(np.complex128), n)
        eng = _build_map_engine(_point_gr_diag, (fn,),
                                self.exec_cfg, self.mesh)
        E_s, _, n = self._prep(E, None)
        out = merge_host(eng(self._params_split(params), self.H_s,
                             self.S_s, E_s))
        return _unlayout(out, n)

    def dos(self, E):
        """(total_dos, per_site_dos) over the grid."""
        diag = self.gr_diag(E)
        per_site = -np.imag(diag) / np.pi
        return per_site.sum(axis=-1), per_site


# Functional wrappers ------------------------------------------------------

def weighted_gr_sum(H, S, provider, E, w, exec_cfg=_DEFAULT_EXEC, mesh=None):
    return EnergyEngine(H, S, provider, exec_cfg, mesh).gr_sum(E, w)


def weighted_gless_sum(H, S, provider, E, w, contact=None,
                       exec_cfg=_DEFAULT_EXEC, mesh=None):
    return EnergyEngine(H, S, provider, exec_cfg, mesh).gless_sum(E, w, contact)


def transmission_map(H, S, provider, E, exec_cfg=_DEFAULT_EXEC, mesh=None):
    return EnergyEngine(H, S, provider, exec_cfg, mesh).transmission(E)


def dos_map(H, S, provider, E, exec_cfg=_DEFAULT_EXEC, mesh=None):
    return EnergyEngine(H, S, provider, exec_cfg, mesh).dos(E)


def gr_diag_map(H, S, provider, E, exec_cfg=_DEFAULT_EXEC, mesh=None):
    return EnergyEngine(H, S, provider, exec_cfg, mesh).gr_diag(E)
