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
