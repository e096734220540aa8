"""Pallas strip elimination: the scan panel's inner loop as ONE kernel.

Round-3 N=2000 profile (BASELINE.md): 53% of device time sits in the
panel while-loops, ~16x above their rank-1 bandwidth ideal -- the cost is
per-iteration XLA loop overhead on ~N eliminations, not data movement.
This kernel runs one 32-column strip's eliminations as a single Pallas
program: the (strip, m) transposed strip lives in VMEM, each elimination
is pure VPU work (row read via dynamic ref slice, masked argmax pivot
search, complex rank-1 update), and the kernel replaces `strip` XLA
while-iterations with one program launch.

Unlike ops/pallas/panel_fused.py (which lost its round-2 A/B because the
deferred inter-strip updates became 6-pass HIGHEST in-kernel dots), this
kernel contains NO MXU products at all: the deferred updates stay in XLA
(zlinalg._factor_panel_scan), where dot_general lowers efficiently.
Elimination math mirrors panel_fused's device-validated eliminate
(separate re/im f32, hypot pivot magnitudes, padded/singular guard).

Used by zlinalg._factor_panel_scan(strip_impl='pallas'), exposed as
ExecutionConfig(lu_panel='pstrip').
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

__all__ = ["eliminate_strip", "pallas_interpret_default", "HAVE_PALLAS"]


def _make_kernel(m: int, strip: int):
    def kernel(ire_ref, iim_ref, iav_ref,
               ore_ref, oim_ref, opiv_ref, oav_ref):
        lanes = lax.broadcasted_iota(jnp.int32, (1, m), 1)
        rows_s = lax.broadcasted_iota(jnp.int32, (strip, 1), 0)
        ore_ref[0] = ire_ref[0]
        oim_ref[0] = iim_ref[0]

        def eliminate(j, avail):
            cr = ore_ref[0, pl.ds(j, 1), :]            # (1, m) row read
            ci = oim_ref[0, pl.ds(j, 1), :]
            mag = jnp.where(avail > 0, jnp.hypot(cr, ci), -1.0)
            p = jnp.argmax(mag[0, :])
            onehot = (lanes == p).astype(jnp.float32)  # (1, m)
            pr = jnp.sum(cr * onehot)
            pi = jnp.sum(ci * onehot)
            # two divisions by |p| instead of one by |p|^2: pr*pr+pi*pi
            # underflows f32 for |p| < ~1e-19 and would trip the singular
            # guard, zeroing multipliers the XLA paths compute correctly
            pm = jnp.hypot(pr, pi)
            pm = jnp.where(pm == 0, 1.0, pm)           # padded/singular guard
            inv_r, inv_i = (pr / pm) / pm, -(pi / pm) / pm
            keep = (avail > 0) & (onehot == 0)
            lr = jnp.where(keep, cr * inv_r - ci * inv_i, 0.0)
            li = jnp.where(keep, cr * inv_i + ci * inv_r, 0.0)

            sre = ore_ref[0]                           # (strip, m)
            sim = oim_ref[0]
            below = rows_s > j                         # (strip, 1)
            ur = jnp.sum(sre * onehot, axis=1, keepdims=True)
            ui = jnp.sum(sim * onehot, axis=1, keepdims=True)
            ur = jnp.where(below, ur, 0.0)
            ui = jnp.where(below, ui, 0.0)
            sre_new = sre - (ur * lr - ui * li)
            sim_new = sim - (ur * li + ui * lr)
            # row j stores multipliers at available lanes, U values at used
            sel_j = rows_s == j
            sre_new = jnp.where(sel_j, jnp.where(keep, lr, cr), sre_new)
            sim_new = jnp.where(sel_j, jnp.where(keep, li, ci), sim_new)
            ore_ref[0] = sre_new
            oim_ref[0] = sim_new

            opiv_ref[0, pl.ds(j, 1), 0] = p[None].astype(jnp.int32)
            return jnp.where(onehot > 0, 0.0, avail)

        avail = lax.fori_loop(0, strip, eliminate, iav_ref[0])
        oav_ref[0] = avail

    return kernel


def pallas_interpret_default() -> bool:
    """Whether strip kernels should run in interpreter mode.

    True on CPU-default processes and whenever GAUNEGF_PALLAS_INTERPRET=1
    (escape hatch for CPU-placed computations inside a TPU-default
    process, where Mosaic lowering would fail -- and per the backend
    notes a failed op can poison the TPU client)."""
    import os
    if os.environ.get("GAUNEGF_PALLAS_INTERPRET", "") == "1":
        return True
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("interpret",))
def eliminate_strip(sb, avail, interpret: bool = False):
    """Factor one transposed (strip, m) complex64 strip in-place.

    sb: (strip, m) complex64 -- rows are the strip's columns (transposed
    panel layout, zlinalg._factor_panel_scan).  avail: (m,) bool lanes
    still available as pivots.  Returns (sb', piv32 (strip,) int32,
    avail' (m,) bool) with exactly the per-column elimination semantics
    of _factor_panel_scan's XLA `eliminate` body.  f32-only: callers fall
    back to the XLA strips for complex128 inputs.
    """
    strip, m = sb.shape
    tre = jnp.real(sb).astype(jnp.float32)[None]
    tim = jnp.imag(sb).astype(jnp.float32)[None]
    av = avail.astype(jnp.float32)[None, None]

    ore, oim, opiv, oav = pl.pallas_call(
        _make_kernel(m, strip),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, strip, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, strip, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, strip, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, strip, m), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, strip, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, strip, m), jnp.float32),
            jax.ShapeDtypeStruct((1, strip, m), jnp.float32),
            jax.ShapeDtypeStruct((1, strip, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1, m), jnp.float32),
        ],
        interpret=interpret,
    )(tre, tim, av)

    return (ore[0] + 1j * oim[0]).astype(sb.dtype), \
        opiv[0, :, 0], oav[0, 0] > 0
