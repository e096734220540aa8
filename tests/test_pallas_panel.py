"""Pallas panel-factorization kernel vs the XLA reference path
(interpreter mode on CPU; the real-TPU path is exercised by bench runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaunegf_tpu.ops import zlinalg as zl
from gaunegf_tpu.ops.pallas import panel_lu


@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("m,bs", [(32, 8), (64, 32), (96, 32)])
def test_pallas_panel_matches_xla(rng, m, bs):
    panel = (rng.standard_normal((m, bs))
             + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
    ref_panel, ref_perm = zl._factor_panel(
        jnp.asarray(panel), jnp.arange(m, dtype=jnp.int32))
    got_panel, got_perm = panel_lu.factor_panel_pallas(
        jnp.asarray(panel), interpret=True)
    assert np.array_equal(np.asarray(got_perm), np.asarray(ref_perm))
    assert np.max(np.abs(np.asarray(got_panel)
                         - np.asarray(ref_panel))) < 1e-5


@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
def test_pallas_panel_batched(rng):
    B, m, bs = 3, 48, 16
    panels = (rng.standard_normal((B, m, bs))
              + 1j * rng.standard_normal((B, m, bs))).astype(np.complex64)
    got_panel, got_perm = panel_lu.factor_panel_pallas(
        jnp.asarray(panels), interpret=True)
    for b in range(B):
        ref_panel, ref_perm = zl._factor_panel(
            jnp.asarray(panels[b]), jnp.arange(m, dtype=jnp.int32))
        assert np.array_equal(np.asarray(got_perm[b]), np.asarray(ref_perm))
        assert np.max(np.abs(np.asarray(got_panel[b])
                             - np.asarray(ref_panel))) < 1e-5


# --- strip-elimination kernel (lu_panel='pstrip') -------------------------

@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
def test_pstrip_panel_matches_virtual(rng):
    """_factor_panel_scan(strip_impl='pallas'): identical pivot sequence
    to the virtual-pivot panel, values to f32 rounding."""
    for m, bs in [(96, 64), (200, 64), (256, 128)]:
        A = (rng.standard_normal((m, bs))
             + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
        p0, perm0 = zl._factor_panel_virtual(jnp.asarray(A))
        p1, perm1 = zl._factor_panel_scan(jnp.asarray(A),
                                          strip_impl="pallas")
        assert np.array_equal(np.asarray(perm0), np.asarray(perm1)), (m, bs)
        scale = np.max(np.abs(np.asarray(p0)))
        assert np.max(np.abs(np.asarray(p0 - p1))) < 1e-3 * scale, (m, bs)


@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
def test_pstrip_solve_matches_lapack(rng):
    N = 192
    A = (rng.standard_normal((2, N, N))
         + 1j * rng.standard_normal((2, N, N))).astype(np.complex64)
    B = np.broadcast_to(np.eye(N, dtype=np.complex64), (2, N, N))
    X1 = zl.zsolve(jnp.asarray(A), jnp.asarray(B), method="blocked",
                   bs=64, panel_impl="pstrip")
    Xl = zl.zsolve(jnp.asarray(A), jnp.asarray(B), method="lapack")
    rel = float(np.max(np.abs(np.asarray(X1 - Xl)))
                / np.max(np.abs(np.asarray(Xl))))
    assert rel < 1e-3, rel


# --- split recursion with Pallas strip base (lu_panel='psplit') -----------

@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
def test_psplit_panel_matches_split(rng):
    """_factor_panel_split(strip_impl='pallas'): identical pivot sequence
    to the pure-XLA split, values to f32 rounding (incl. lane padding to
    the 256 bucket)."""
    for m, bs in [(96, 64), (200, 64), (300, 128), (256, 128)]:
        A = (rng.standard_normal((m, bs))
             + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
        p0, perm0 = zl._factor_panel_split(jnp.asarray(A))
        p1, perm1 = zl._factor_panel_split(jnp.asarray(A),
                                           strip_impl="pallas")
        assert np.array_equal(np.asarray(perm0), np.asarray(perm1)), (m, bs)
        scale = np.max(np.abs(np.asarray(p0)))
        assert np.max(np.abs(np.asarray(p0 - p1))) < 1e-3 * scale, (m, bs)


@pytest.mark.skipif(not panel_lu.HAVE_PALLAS, reason="pallas unavailable")
def test_psplit_solve_matches_lapack(rng):
    """N=320/bs=64: strip lanes pad to the 512 bucket inside the leaves.

    bs=64 (nb=5), NOT 128: nb=3 panels with batch>=2 trip a pre-existing
    XLA CPU RET_CHECK (transpose folding vs dot layout,
    hlo_computation.cc:1726) in the blocked solve for EVERY panel_impl --
    unrelated to the Pallas path (reproduced on round-2 code)."""
    N = 320
    A = (rng.standard_normal((2, N, N))
         + 1j * rng.standard_normal((2, N, N))).astype(np.complex64)
    B = np.broadcast_to(np.eye(N, dtype=np.complex64), (2, N, N))
    X1 = zl.zsolve(jnp.asarray(A), jnp.asarray(B), method="blocked",
                   bs=64, panel_impl="psplit")
    Xl = zl.zsolve(jnp.asarray(A), jnp.asarray(B), method="lapack")
    rel = float(np.max(np.abs(np.asarray(X1 - Xl)))
                / np.max(np.abs(np.asarray(Xl))))
    assert rel < 1e-3, rel
