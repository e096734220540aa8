"""Pallas TPU kernel: pivoted LU panel factorization.

The blocked solve in ops/zlinalg.py spends its serial budget in the panel
factorization loop (N sequential columns).  As an XLA fori_loop each column
iteration pays loop/fusion overhead on HBM-resident data; this kernel keeps
the whole (m, bs) panel resident in VMEM and runs the bs-column loop inside
one Pallas program, with the batch as the grid dimension.

Complex data is carried as separate re/im f32 refs (the backend has no
complex transfers, and VMEM tiling is defined for real dtypes).  The
composed permutation is returned per panel so the caller applies it to the
off-panel columns as a single gather (same contract as
zlinalg._factor_panel).

Opt-in: zlinalg routes panels here when ExecutionConfig/zsolve is given
``panel='pallas'``; correctness is validated in interpreter mode on CPU
(tests/test_pallas_panel.py) and against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

__all__ = ["factor_panel_pallas", "HAVE_PALLAS"]


def _panel_kernel(pre_ref, pim_ref, out_re_ref, out_im_ref, perm_ref):
    """Fully-masked formulation: no dynamic slicing (unsupported by the
    Mosaic lowering) -- row/column extraction, swaps and writes are all
    iota-mask selects and reductions on the VMEM-resident panel."""
    m, bs = pre_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, bs), 1)

    out_re_ref[:, :] = pre_ref[:, :]
    out_im_ref[:, :] = pim_ref[:, :]
    perm_ref[:, :] = rows.astype(jnp.float32) if perm_ref.dtype == jnp.float32 \
        else rows

    def body(j, _):
        re = out_re_ref[:, :]
        im = out_im_ref[:, :]
        pm = perm_ref[:, :]

        is_col_j = cols == j                        # (1, bs)
        cr = jnp.sum(jnp.where(is_col_j, re, 0.0), axis=1, keepdims=True)
        ci = jnp.sum(jnp.where(is_col_j, im, 0.0), axis=1, keepdims=True)
        mag = cr * cr + ci * ci
        mag = jnp.where(rows >= j, mag, -1.0)
        p = jnp.argmax(mag[:, 0])

        is_row_j = rows == j                        # (m, 1)
        is_row_p = rows == p
        # masked row extraction (1, bs) via reductions
        row_j_re = jnp.sum(jnp.where(is_row_j, re, 0.0), axis=0,
                           keepdims=True)
        row_j_im = jnp.sum(jnp.where(is_row_j, im, 0.0), axis=0,
                           keepdims=True)
        row_p_re = jnp.sum(jnp.where(is_row_p, re, 0.0), axis=0,
                           keepdims=True)
        row_p_im = jnp.sum(jnp.where(is_row_p, im, 0.0), axis=0,
                           keepdims=True)
        # swap rows j <-> p
        re = jnp.where(is_row_j, row_p_re,
                       jnp.where(is_row_p, row_j_re, re))
        im = jnp.where(is_row_j, row_p_im,
                       jnp.where(is_row_p, row_j_im, im))
        pj = jnp.sum(jnp.where(is_row_j[:, 0], pm[:, 0], 0))
        pp = jnp.sum(jnp.where(is_row_p[:, 0], pm[:, 0], 0))
        pm = jnp.where(is_row_j, pp, jnp.where(is_row_p, pj, pm))

        # pivot column after swap
        cr = jnp.sum(jnp.where(is_col_j, re, 0.0), axis=1, keepdims=True)
        ci = jnp.sum(jnp.where(is_col_j, im, 0.0), axis=1, keepdims=True)
        pr = jnp.sum(jnp.where(is_row_j, cr, 0.0))
        pi = jnp.sum(jnp.where(is_row_j, ci, 0.0))
        den = pr * pr + pi * pi
        den = jnp.where(den == 0, 1.0, den)
        inv_r = pr / den
        inv_i = -pi / den
        below = rows > j
        lr = jnp.where(below, cr * inv_r - ci * inv_i, 0.0)
        li = jnp.where(below, cr * inv_i + ci * inv_r, 0.0)

        right = cols > j
        urow_re = jnp.sum(jnp.where(is_row_j, re, 0.0), axis=0,
                          keepdims=True)
        urow_im = jnp.sum(jnp.where(is_row_j, im, 0.0), axis=0,
                          keepdims=True)
        ur = jnp.where(right, urow_re, 0.0)
        ui = jnp.where(right, urow_im, 0.0)
        re = re - (lr * ur - li * ui)
        im = im - (lr * ui + li * ur)
        # store multipliers in column j (rows > j)
        re = jnp.where(is_col_j & below, lr, re)
        im = jnp.where(is_col_j & below, li, im)

        out_re_ref[:, :] = re
        out_im_ref[:, :] = im
        perm_ref[:, :] = pm
        return 0

    lax.fori_loop(0, bs, body, 0)


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
    pre = jnp.real(panel).astype(jnp.float32 if panel.dtype == jnp.complex64
                                 else jnp.float64)
    pim = jnp.imag(panel).astype(pre.dtype)

    grid = (B,)
    specs = dict(
        in_specs=[
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, bs), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, m, 1), lambda b: (b, 0, 0)),
        ],
    )

    def kernel(pre_ref, pim_ref, ore_ref, oim_ref, operm_ref):
        _panel_kernel(pre_ref.at[0], pim_ref.at[0], ore_ref.at[0],
                      oim_ref.at[0], operm_ref.at[0])

    out_shape = [
        jax.ShapeDtypeStruct((B, m, bs), pre.dtype),
        jax.ShapeDtypeStruct((B, m, bs), pre.dtype),
        jax.ShapeDtypeStruct((B, m, 1), jnp.int32),
    ]
    ore, oim, operm = pl.pallas_call(
        kernel, grid=grid, out_shape=out_shape, interpret=interpret,
        **specs)(pre, pim)
    packed = ore + 1j * oim
    perm = operm[..., 0]
    if squeeze:
        return packed[0], perm[0]
    return packed, perm
