"""Fused Pallas panel kernel vs the XLA panel paths (interpreter mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gaunegf_tpu.ops import zlinalg as zl
from gaunegf_tpu.ops.pallas.panel_fused import (
    factor_panel_fused, HAVE_PALLAS)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas")


@pytest.mark.parametrize("m,bs", [(96, 32), (160, 64), (256, 128)])
def test_fused_matches_virtual_pivots(rng, m, bs):
    A = (rng.standard_normal((m, bs))
         + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
    pv, permv = zl._factor_panel_virtual(jnp.asarray(A))
    pf, permf = factor_panel_fused(jnp.asarray(A), interpret=True)
    assert (np.asarray(permv) == np.asarray(permf)).all(), \
        "pivot sequence must match partial pivoting exactly"
    # values agree to f32 accumulation differences (deferred MXU updates
    # reorder the same arithmetic)
    assert np.abs(np.asarray(pv) - np.asarray(pf)).max() < 1e-3


def test_fused_batched(rng):
    A = (rng.standard_normal((3, 64, 32))
         + 1j * rng.standard_normal((3, 64, 32))).astype(np.complex64)
    pf, permf = factor_panel_fused(jnp.asarray(A), interpret=True)
    assert pf.shape == (3, 64, 32) and permf.shape == (3, 64)
    for b in range(3):
        pv, permv = zl._factor_panel_virtual(jnp.asarray(A[b]))
        assert (np.asarray(permv) == np.asarray(permf[b])).all()


def test_fused_full_solve(rng):
    """zinv through the fused panel reaches the f32 LU accuracy class."""
    from unittest import mock
    import gaunegf_tpu.ops.pallas.panel_fused as pf_mod

    orig = pf_mod.factor_panel_fused
    with mock.patch.object(pf_mod, "factor_panel_fused",
                           lambda p: orig(p, interpret=True)):
        N = 128
        A = (rng.standard_normal((N, N))
             + 1j * rng.standard_normal((N, N))).astype(np.complex64)
        A += N * (0.1 + 0.05j) * np.eye(N)
        X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked", bs=64,
                               panel_impl="fused"))
        ref = np.linalg.inv(A.astype(np.complex128))
        rel = np.abs(X - ref).max() / np.abs(ref).max()
        assert rel < 1e-5, rel


@pytest.mark.parametrize("m,bs", [(96, 32), (160, 64)])
def test_fused_bf16x3_matches_pivots_and_values(rng, m, bs):
    """bf16x3 mode: identical pivot sequence on well-separated magnitudes;
    values at the ~16-bit factor-quality level."""
    A = (rng.standard_normal((m, bs))
         + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
    pv, permv = zl._factor_panel_virtual(jnp.asarray(A))
    pf, permf = factor_panel_fused(jnp.asarray(A), interpret=True,
                                   mode="bf16x3")
    assert (np.asarray(permv) == np.asarray(permf)).all()
    assert np.abs(np.asarray(pv) - np.asarray(pf)).max() < 1e-2


def test_fused3_full_solve_mixed_quality(rng):
    """zinv_refined through the bf16x3 panel still reaches the mixed-tier
    accuracy class (the Newton polish absorbs the ~1e-4 factor quality)."""
    from unittest import mock
    import gaunegf_tpu.ops.pallas.panel_fused as pf_mod

    orig = pf_mod.factor_panel_fused
    with mock.patch.object(
            pf_mod, "factor_panel_fused",
            lambda p, mode="highest": orig(p, interpret=True, mode=mode)):
        N = 128
        A = (rng.standard_normal((N, N))
             + 1j * rng.standard_normal((N, N))).astype(np.complex64)
        A += N * (0.1 + 0.05j) * np.eye(N)
        X = np.asarray(zl.zinv_refined(jnp.asarray(A), steps=1, bs=64,
                                       method="blocked",
                                       panel_impl="fused3"))
        ref = np.linalg.inv(A.astype(np.complex128))
        rel = np.abs(X - ref).max() / np.abs(ref).max()
        assert rel < 5e-6, rel
