"""Fused Pallas panel factorization: strips + deferred updates in VMEM.

The XLA 'split' panel (zlinalg._factor_panel_split, the default) already
narrows the rank-1 eliminations to 32-column strips with MXU inter-strip
updates, but each elimination still crosses op boundaries and the panel
re-streams between fusions.  This kernel runs the WHOLE panel
factorization as one Pallas program: the transposed (bs, m) panel lives
in VMEM refs, each elimination reads/writes single rows via dynamic
sublane slices (pl.ds -- the formulation round 1's masked-select kernel
lacked), and the deferred strip updates are two in-kernel MXU dots
(pivot-lane extraction via a one-hot matmul + the L @ U12 update with the
strip's unit-lower inverse from a log-doubling Neumann product).

Virtual pivoting: the pivot SEQUENCE matches partial pivoting exactly
(same argmax over the same candidates); rows are tracked with an
availability mask instead of physical swaps, and the XLA wrapper composes
the permutation and packs rows exactly like zlinalg._factor_panel_virtual.

Complex data is carried as separate re/im f32 refs (the backend cannot
tile complex); batch is the grid dimension.  Validated in interpreter
mode AND on device (tests/test_pallas_fused.py; round-2 device bisection
found in-kernel dots default to one-pass bf16 -- every product here pins
precision=HIGHEST).

Round-2 A/B verdict (v5e, N=1000 mixed, same session): fused 133 pts/s
vs the XLA 'split' panel's 166 -- the six-pass f32-HIGHEST in-kernel
dots cost more than the op-boundary overhead they remove, and bs=256
panels exceed the 16 MB VMEM scope at N=2000.  'split' stays the
default; this kernel remains available via lu_panel='fused' (its ~4x
faster compiles are occasionally useful) and as the scaffold for a
future bf16-LU + extra-refinement tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["factor_panel_fused", "HAVE_PALLAS"]

STRIP = 32



def _split3(x):
    """Exact-enough triple bf16 split: x ~= x1 + x2 + x3 to ~2^-24 rel
    (each part bf16-representable, so 1-pass MXU products are exact)."""
    x1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - x1
    x2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    x3 = r - x2
    return x1, x2, x3


def _make_kernel(m: int, bs: int, strip: int, mode: str = "highest"):
    """mode='highest': every dot 6-pass f32 (the round-2 kernel).
    mode='bf16x3': manual bf16-split dots -- SELECTION products (one-hot
    extraction/scatter, where a bf16 cast would corrupt the extracted f32
    values) use the exact 3-way split (3 one-pass dots vs 6 passes);
    VALUE products (L11 substitution, trailing update) use a 3-product
    2-way split (~16-bit, 3 one-pass dots) -- factor quality drops to
    ~1e-4, which the mixed tier's Newton polish absorbs (its final error
    is residual-floor-, not seed-, limited).  Halves the MXU pass count
    that made the round-2 fused kernel lose its A/B."""
    n_strips = bs // strip
    bf3 = mode == "bf16x3"

    def kernel(ire_ref, iim_ref, ore_ref, oim_ref, opiv_ref):
        lanes = lax.broadcasted_iota(jnp.int32, (1, m), 1)
        rows_s = lax.broadcasted_iota(jnp.int32, (strip, 1), 0)
        ore_ref[0] = ire_ref[0]
        oim_ref[0] = iim_ref[0]
        avail0 = jnp.ones((1, m), jnp.float32)

        def _dg_m_raw(a, b, precision):
            # a (r, m) x b (k, m) -> (r, k), contracting the m axes
            # (equivalent to a @ b.T without materializing a transpose)
            return lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)

        def _dg_m(a, b):
            """Value x one-hot contraction over m: must return the f32
            values EXACTLY (they become U12/L11 factors)."""
            if not bf3:
                return _dg_m_raw(a, b, lax.Precision.HIGHEST)
            a1, a2, a3 = _split3(a)
            d = lambda x: _dg_m_raw(x, b, None)
            return (d(a1) + d(a2)) + d(a3)

        def _mm_raw(a, b, precision=None):
            return jnp.dot(a, b, precision=precision,
                           preferred_element_type=jnp.float32)

        def _mmv(a, b):
            """Value x value product: ~16-bit (3 one-pass dots) in bf16x3
            mode -- factor-quality work the mixed tier's polish absorbs."""
            if not bf3:
                return _mm_raw(a, b, lax.Precision.HIGHEST)
            a1 = a.astype(jnp.bfloat16).astype(jnp.float32)
            a2 = a - a1
            b1 = b.astype(jnp.bfloat16).astype(jnp.float32)
            b2 = b - b1
            return _mm_raw(a1, b1) + _mm_raw(a1, b2) + _mm_raw(a2, b1)

        def _mms(a, onehot):
            """Value x one-hot scatter: exact 3-way split (each output
            element is a single selected value -- a bf16 cast here would
            corrupt the stored factors)."""
            if not bf3:
                return _mm_raw(a, onehot, lax.Precision.HIGHEST)
            a1, a2, a3 = _split3(a)
            return (_mm_raw(a1, onehot) + _mm_raw(a2, onehot)) \
                + _mm_raw(a3, onehot)

        def eliminate(j_local, s0, carry):
            avail = carry
            jg = s0 + j_local
            cr = ore_ref[0, pl.ds(jg, 1), :]          # (1, m) row read
            ci = oim_ref[0, pl.ds(jg, 1), :]
            # hypot matches jnp.abs's pivot ordering without the
            # overflow/underflow of the naive square
            mag = jnp.where(avail > 0, jnp.hypot(cr, ci), -1.0)
            p = jnp.argmax(mag[0, :])
            onehot = (lanes == p).astype(jnp.float32)  # (1, m)
            pr = jnp.sum(cr * onehot)
            pi = jnp.sum(ci * onehot)
            den = pr * pr + pi * pi
            den = jnp.where(den == 0, 1.0, den)       # padded/singular guard
            inv_r, inv_i = pr / den, -pi / den
            keep = (avail > 0) & (onehot == 0)
            lr = jnp.where(keep, cr * inv_r - ci * inv_i, 0.0)
            li = jnp.where(keep, cr * inv_i + ci * inv_r, 0.0)

            # rank-1 update of the strip rows BELOW j (within this strip)
            sre = ore_ref[0, pl.ds(s0, strip), :]     # (strip, m)
            sim = oim_ref[0, pl.ds(s0, strip), :]
            below = rows_s > j_local                  # (strip, 1)
            ur = jnp.sum(sre * onehot, axis=1, keepdims=True)  # (strip, 1)
            ui = jnp.sum(sim * onehot, axis=1, keepdims=True)
            ur = jnp.where(below, ur, 0.0)
            ui = jnp.where(below, ui, 0.0)
            sre_new = sre - (ur * lr - ui * li)
            sim_new = sim - (ur * li + ui * lr)
            # row j stores multipliers at available lanes, U values at used
            keep_row = jnp.where(keep, lr, cr)
            keep_row_i = jnp.where(keep, li, ci)
            sel_j = rows_s == j_local
            sre_new = jnp.where(sel_j, keep_row, sre_new)
            sim_new = jnp.where(sel_j, keep_row_i, sim_new)
            ore_ref[0, pl.ds(s0, strip), :] = sre_new
            oim_ref[0, pl.ds(s0, strip), :] = sim_new

            opiv_ref[0, pl.ds(jg, 1), 0] = p[None].astype(jnp.int32)
            avail = jnp.where(onehot > 0, 0.0, avail)
            return avail

        avail = avail0
        for s in range(n_strips):
            s0 = s * strip
            avail = lax.fori_loop(
                0, strip, lambda j, c: eliminate(j, s0, c), avail)

            if s == n_strips - 1:
                break
            # deferred update of the remaining strips (MXU).  Mosaic
            # miscompiled both explicit .T relayouts and a second
            # (m, strip) one-hot layout here (bisected on device), so the
            # ONLY pivot-lane object is onehotP (strip, m) -- built from
            # the opiv ref, the same source the returned permutation uses
            # -- and every "transposed" product is a dot_general
            # contracting the m axes directly.
            piv_s = opiv_ref[0, pl.ds(s0, strip), :]            # (strip, 1)
            onehotP = (lax.broadcasted_iota(jnp.int32, (strip, m), 1)
                       == piv_s).astype(jnp.float32)
            sre = ore_ref[0, pl.ds(s0, strip), :]
            sim = oim_ref[0, pl.ds(s0, strip), :]
            # L21 = multipliers at the STILL-available lanes (avail already
            # excludes this strip's and all earlier strips' pivot lanes;
            # the strictly-lower L11 entries live at this strip's pivot
            # lanes and must NOT join the trailing rank update)
            Lre = jnp.where(avail > 0, sre, 0.0)
            Lim = jnp.where(avail > 0, sim, 0.0)
            # G[j, k] = (strip row j) at pivot lane of elimination k; the
            # unit-lower L11 satisfies L11[j, k] = G[k, j] (j > k), so
            # G's strictly-UPPER part is L11^T and the substitution below
            # right-multiplies by inv(L11^T) = inv(I + upper(G)) directly
            Gr = _dg_m(sre, onehotP)
            Gi = _dg_m(sim, onehotP)
            upper = (lax.broadcasted_iota(jnp.int32, (strip, strip), 0)
                     < lax.broadcasted_iota(jnp.int32, (strip, strip),
                                            1)).astype(jnp.float32)
            L11Tr = Gr * upper + jnp.eye(strip, dtype=jnp.float32)
            L11Ti = Gi * upper
            XTr, XTi = _cinv_unit_nilpotent(L11Tr, L11Ti, _mmv)

            rest = bs - s0 - strip
            rre = ore_ref[0, pl.ds(s0 + strip, rest), :]
            rim = oim_ref[0, pl.ds(s0 + strip, rest), :]
            # U12^T = rest-values at this strip's pivot lanes: (rest, strip)
            Ur = _dg_m(rre, onehotP)
            Ui = _dg_m(rim, onehotP)
            # forward substitution: U12^T = U12^T_raw @ inv(L11^T)
            Wr = _mmv(Ur, XTr) - _mmv(Ui, XTi)
            Wi = _mmv(Ur, XTi) + _mmv(Ui, XTr)
            # trailing update: rest -= W @ L_strip
            rre_new = rre - (_mmv(Wr, Lre) - _mmv(Wi, Lim))
            rim_new = rim - (_mmv(Wr, Lim) + _mmv(Wi, Lre))
            # write back W into the rest rows' pivot lanes (they become
            # the U12 values): rest_lanes at pivots = W
            rre_new = rre_new + _mms(Wr, onehotP) - _mms(Ur, onehotP)
            rim_new = rim_new + _mms(Wi, onehotP) - _mms(Ui, onehotP)
            ore_ref[0, pl.ds(s0 + strip, rest), :] = rre_new
            oim_ref[0, pl.ds(s0 + strip, rest), :] = rim_new


    return kernel


def _cinv_unit_nilpotent(Lr, Li, mm=None):
    """Complex inverse of I + N (N nilpotent triangular), log-doubling
    Neumann product -- works for either triangle, no transposes.
    ``mm`` is the real-product primitive (defaults to 6-pass HIGHEST)."""
    if mm is None:
        mm = lambda a, b: jnp.dot(a, b, precision=lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
    n = Lr.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    Nr = eye - Lr
    Ni = -Li
    Xr, Xi = eye + Nr, Ni
    Pr, Pi = Nr, Ni
    steps = int(np.ceil(np.log2(max(n, 2))))
    for _ in range(steps - 1):
        Pr2 = mm(Pr, Pr) - mm(Pi, Pi)
        Pi2 = mm(Pr, Pi) + mm(Pi, Pr)
        Xr2 = Xr + mm(Xr, Pr2) - mm(Xi, Pi2)
        Xi2 = Xi + mm(Xr, Pi2) + mm(Xi, Pr2)
        Xr, Xi, Pr, Pi = Xr2, Xi2, Pr2, Pi2
    return Xr, Xi


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def factor_panel_fused(panel, interpret: bool = False,
                       mode: str = "highest"):
    """Virtually-pivoted fused panel factorization.

    panel: (..., m, bs) complex64.  Returns (packed rows in pivoted order,
    perm) with the zlinalg._factor_panel contract.  mode='bf16x3' halves
    the in-kernel MXU pass count (see _make_kernel)."""
    if panel.ndim == 2:
        panel = panel[None]
        squeeze = True
    else:
        squeeze = False
    B, m, bs = panel.shape
    strip = min(STRIP, bs)
    if bs % strip:
        raise ValueError(f"panel width bs={bs} must be a multiple of the "
                         f"strip width {strip}")
    pre = jnp.real(panel).astype(jnp.float32)
    pim = jnp.imag(panel).astype(jnp.float32)
    # transposed layout in the kernel
    tre = jnp.swapaxes(pre, -1, -2)
    tim = jnp.swapaxes(pim, -1, -2)

    ore, oim, opiv = pl.pallas_call(
        _make_kernel(m, bs, strip, mode),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, bs, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, bs, m), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, bs, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, bs, 1), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, bs, m), jnp.float32),
            jax.ShapeDtypeStruct((B, bs, m), jnp.float32),
            jax.ShapeDtypeStruct((B, bs, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tre, tim)

    pt = ore + 1j * oim                               # (B, bs, m)
    pivrows = opiv[..., 0]                            # (B, bs)

    def pack_one(pt_b, piv_b):
        if m > bs:
            used = jnp.zeros((m,), bool).at[piv_b].set(True)
            rest = jnp.where(~used, size=m - bs)[0].astype(jnp.int32)
            perm = jnp.concatenate([piv_b.astype(jnp.int32), rest])
        else:
            perm = piv_b.astype(jnp.int32)
        return jnp.swapaxes(pt_b, -1, -2)[perm, :], perm

    packed, perm = jax.vmap(pack_one)(pt, pivrows)
    if squeeze:
        return packed[0], perm[0]
    return packed, perm
