"""Pallas TPU kernel: pivoted LU panel factorization.

The blocked solve in ops/zlinalg.py spends its serial budget in the panel
factorization loop (N sequential columns).  As an XLA fori_loop each column
iteration re-streams the HBM-resident panel and pays per-op dispatch
overhead; this kernel keeps the whole (m, bs) panel resident in VMEM and
runs the bs-column loop inside one Pallas program, with the batch as the
grid dimension.

Mosaic constraints shaped the formulation:
* complex carried as separate re/im f32 refs (no complex transfers/tiling);
* no dynamic slicing on values -- row/column extraction, swaps and writes
  are iota-mask selects and reductions;
* refs indexed directly as ref[0] on the (1, m, bs) blocks (sub-ref views
  via .at[] miscompile).

The composed permutation is returned per panel so the caller applies it to
the off-panel columns as a single gather (same contract as
zlinalg._factor_panel).  Enable with ExecutionConfig(lu_panel='pallas') or
zsolve(..., panel_impl='pallas'); validated in interpreter mode on CPU and
against the XLA path on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["factor_panel_pallas", "HAVE_PALLAS"]


def _make_kernel(m: int, bs: int):
    def kernel(pre_ref, pim_ref, ore_ref, oim_ref, operm_ref):
        rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        cols = lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        ore_ref[:, :, :] = pre_ref[:, :, :]
        oim_ref[:, :, :] = pim_ref[:, :, :]
        operm_ref[0] = rows

        def body(j, _):
            re = ore_ref[0]
            im = oim_ref[0]
            pm = operm_ref[0]

            is_col_j = cols == j
            cr = jnp.sum(jnp.where(is_col_j, re, 0.0), axis=1, keepdims=True)
            ci = jnp.sum(jnp.where(is_col_j, im, 0.0), axis=1, keepdims=True)
            mag = jnp.where(rows >= j, cr * cr + ci * ci, -1.0)
            p = jnp.argmax(mag[:, 0])

            is_j = rows == j
            is_p = rows == p
            # row swap j <-> p (masked selects; no dynamic slicing)
            rj_re = jnp.sum(jnp.where(is_j, re, 0.0), axis=0, keepdims=True)
            rj_im = jnp.sum(jnp.where(is_j, im, 0.0), axis=0, keepdims=True)
            rp_re = jnp.sum(jnp.where(is_p, re, 0.0), axis=0, keepdims=True)
            rp_im = jnp.sum(jnp.where(is_p, im, 0.0), axis=0, keepdims=True)
            re = jnp.where(is_j, rp_re, jnp.where(is_p, rj_re, re))
            im = jnp.where(is_j, rp_im, jnp.where(is_p, rj_im, im))
            pj = jnp.sum(jnp.where(is_j[:, 0], pm[:, 0], 0))
            pp = jnp.sum(jnp.where(is_p[:, 0], pm[:, 0], 0))
            pm = jnp.where(is_j, pp, jnp.where(is_p, pj, pm))

            # pivot column after the swap
            cr = jnp.sum(jnp.where(is_col_j, re, 0.0), axis=1, keepdims=True)
            ci = jnp.sum(jnp.where(is_col_j, im, 0.0), axis=1, keepdims=True)
            pr = jnp.sum(jnp.where(is_j, cr, 0.0))
            pi = jnp.sum(jnp.where(is_j, ci, 0.0))
            den = pr * pr + pi * pi
            den = jnp.where(den == 0, 1.0, den)     # padded/singular guard
            inv_r = pr / den
            inv_i = -pi / den
            below = rows > j
            lr = jnp.where(below, cr * inv_r - ci * inv_i, 0.0)
            li = jnp.where(below, cr * inv_i + ci * inv_r, 0.0)

            right = cols > j
            ur_full_re = jnp.sum(jnp.where(is_j, re, 0.0), axis=0,
                                 keepdims=True)
            ur_full_im = jnp.sum(jnp.where(is_j, im, 0.0), axis=0,
                                 keepdims=True)
            ur = jnp.where(right, ur_full_re, 0.0)
            ui = jnp.where(right, ur_full_im, 0.0)
            re = re - (lr * ur - li * ui)
            im = im - (lr * ui + li * ur)
            re = jnp.where(is_col_j & below, lr, re)
            im = jnp.where(is_col_j & below, li, im)

            ore_ref[0] = re
            oim_ref[0] = im
            operm_ref[0] = pm
            return 0

        lax.fori_loop(0, bs, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_panel_pallas(panel, interpret: bool = False):
    """Pivoted LU panel factorization via Pallas.

    panel: (..., m, bs) complex.  Returns (packed_panel, perm) with the
    same contract as zlinalg._factor_panel.
    """
    if panel.ndim == 2:
        panel = panel[None]
        squeeze = True
    else:
        squeeze = False
    B, m, bs = panel.shape
    rdt = jnp.float32 if panel.dtype == jnp.complex64 else jnp.float64
    pre = jnp.real(panel).astype(rdt)
    pim = jnp.imag(panel).astype(rdt)

    ore, oim, operm = pl.pallas_call(
        _make_kernel(m, bs),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, 1), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m, bs), rdt),
            jax.ShapeDtypeStruct((B, m, bs), rdt),
            jax.ShapeDtypeStruct((B, m, 1), jnp.int32),
        ],
        interpret=interpret,
    )(pre, pim)
    packed = ore + 1j * oim
    perm = operm[..., 0]
    if squeeze:
        return packed[0], perm[0]
    return packed, perm
