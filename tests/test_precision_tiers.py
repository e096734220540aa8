"""'high'/'exact' tiers across the full engine surface (VERDICT r1 item 2).

Round 1 only implemented the double-word path for gr_sum; these tests pin
gless_sum, transmission, and dos at both tiers against f64 references, plus
the new double-word matmul/reduction primitives.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.ops import zlinalg as zl
from gaunegf_tpu.ops.greens import EnergyEngine


def _system(rng, n=64):
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(n))
    S = np.eye(n) + 0.05 * (np.eye(n, k=1) + np.eye(n, k=-1))
    g = ConstantSelfEnergy(H, S, [np.arange(6), np.arange(n - 6, n)],
                           sig1=-0.1j)
    return H, S, g


def _sig_np(g, i=None):
    if i is None:
        return np.asarray(g.sigmaTot(0.0)).astype(np.complex128)
    return np.asarray(g.sigma(0.0, i)).astype(np.complex128)


# --- primitives -----------------------------------------------------------

def test_zmatmul_dwf_beats_plain(rng):
    K = 256
    a = (rng.standard_normal((K, K))
         + 1j * rng.standard_normal((K, K))).astype(np.complex64)
    b = (rng.standard_normal((K, K))
         + 1j * rng.standard_normal((K, K))).astype(np.complex64)
    hi, lo = zl.zmatmul_dwf(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(hi, np.complex128) + np.asarray(lo, np.complex128)
    ref = a.astype(np.complex128) @ b.astype(np.complex128)
    err_dw = np.abs(got - ref).max() / np.abs(ref).max()
    # floor is the f32 accumulation over K (product rounding is captured);
    # ~sqrt(K)*eps of the term scale
    assert err_dw < 1e-6


def test_zmatmul_dw_double_word_operands(rng):
    K = 128
    A = (rng.standard_normal((K, K)) + 1j * rng.standard_normal((K, K)))
    B = (rng.standard_normal((K, K)) + 1j * rng.standard_normal((K, K)))
    A_hi = A.astype(np.complex64)
    A_lo = (A - A_hi.astype(np.complex128)).astype(np.complex64)
    B_hi = B.astype(np.complex64)
    B_lo = (B - B_hi.astype(np.complex128)).astype(np.complex64)
    for exact, tol in ((False, 1e-6), (True, 1e-12)):
        hi, lo = zl.zmatmul_dw((jnp.asarray(A_hi), jnp.asarray(A_lo)),
                               (jnp.asarray(B_hi), jnp.asarray(B_lo)),
                               exact=exact)
        got = np.asarray(hi, np.complex128) + np.asarray(lo, np.complex128)
        ref = A @ B
        assert np.abs(got - ref).max() / np.abs(ref).max() < tol


def test_cdw_reduce_compensated(rng):
    # moderately cancelling sum: double-word error ~ eps^2 * cond, far
    # below a plain f32 tree reduction (~eps * cond)
    n = 4097   # deliberately not a power of two
    x = (rng.standard_normal(n)
         + 1j * rng.standard_normal(n)).astype(np.complex64) * 10.0
    hi, lo = zl.cdw_reduce(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    got = complex(np.asarray(hi)) + complex(np.asarray(lo))
    ref = np.sum(x.astype(np.complex128))
    scale = np.abs(x).sum()
    assert abs(got - ref) / scale < 1e-12
    plain = complex(np.sum(x))
    assert abs(got - ref) < abs(plain - ref)


# --- engines --------------------------------------------------------------

@pytest.mark.parametrize("precision,tol", [("high", 3e-7), ("exact", 1e-12)])
def test_gless_sum_tiers(rng, precision, tol):
    H, S, g = _system(rng)
    E = np.linspace(-1.5, 1.5, 12)
    w = rng.random(12)
    st = _sig_np(g)
    s1 = _sig_np(g, 0)
    gam1 = 1j * (s1 - s1.conj().T)
    ref = np.zeros_like(st)
    for e, ww in zip(E, w):
        Gr = np.linalg.inv(e * S - H - st)
        ref += ww * (Gr @ gam1 @ Gr.conj().T)
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision=precision,
                                                energy_chunk=4))
    out = eng.gless_sum(E, w, contact=0)
    rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    assert rel < tol


# exact-tier T(E) floor: G's conditioning near real-axis resonances
# (the inverse itself is ~1e-10, see test_zinv_dw_exact_tier)
@pytest.mark.parametrize("precision,tol", [("high", 3e-7), ("exact", 5e-8)])
def test_transmission_tiers(rng, precision, tol):
    H, S, g = _system(rng)
    E = np.linspace(-1.5, 1.5, 11)
    st = _sig_np(g)
    s1, s2 = _sig_np(g, 0), _sig_np(g, 1)
    gam1 = 1j * (s1 - s1.conj().T)
    gam2 = 1j * (s2 - s2.conj().T)
    ref = np.array([
        np.real(np.trace(
            gam1 @ (Gr := np.linalg.inv(e * S - H - st)) @ gam2
            @ Gr.conj().T)) for e in E])
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision=precision,
                                                energy_chunk=4))
    out = eng.transmission(E)
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < tol


@pytest.mark.parametrize("precision,tol", [("high", 3e-7), ("exact", 1e-8)])
def test_dos_tiers(rng, precision, tol):
    H, S, g = _system(rng)
    E = np.linspace(-1.5, 1.5, 9)
    st = _sig_np(g)
    ref = np.array([
        -np.imag(np.diagonal(np.linalg.inv(e * S - H - st))) / np.pi
        for e in E])
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision=precision,
                                                energy_chunk=4))
    total, per_site = eng.dos(E)
    assert np.max(np.abs(per_site - ref)) / np.max(np.abs(ref)) < tol
    np.testing.assert_allclose(total, per_site.sum(axis=-1), rtol=1e-12)


def test_tiers_on_mesh(rng):
    """high tier gless/transmission under shard_map == serial."""
    from gaunegf_tpu.parallel.mesh import energy_mesh
    H, S, g = _system(rng, n=32)
    E = np.linspace(-1.0, 1.0, 10)
    w = rng.random(10)
    cfg = ExecutionConfig(precision="high", energy_chunk=2)
    serial = EnergyEngine(H, S, g, cfg)
    sharded = EnergyEngine(H, S, g, cfg, mesh=energy_mesh(4))
    np.testing.assert_allclose(sharded.gless_sum(E, w, contact=0),
                               serial.gless_sum(E, w, contact=0),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(sharded.transmission(E),
                               serial.transmission(E), rtol=0, atol=1e-9)


def test_exact_tier_energy_dependent_chain_provider(rng):
    """VERDICT r1 item 7, full scope: the exact tier keeps its ~1e-11
    floor with an ENERGY-DEPENDENT provider -- the chain surface GF runs
    fully double-word (surface_g_sancho_dw)."""
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy

    n = 32
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.3 * rng.standard_normal(n))
    S = np.eye(n) + 0.05 * (np.eye(n, k=1) + np.eye(n, k=-1))
    g = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                          eta=1e-6)
    E = np.linspace(-1.5, 1.5, 8) + 0.05j
    w = rng.standard_normal(8)
    ref = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict")).gr_sum(E, w)
    out = EnergyEngine(H, S, g, ExecutionConfig(
        precision="exact")).gr_sum(E, w)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-11, rel
    # high tier: f32-accumulation floor, still beyond f32 representation
    out_h = EnergyEngine(H, S, g, ExecutionConfig(
        precision="high")).gr_sum(E, w)
    rel_h = np.abs(out_h - ref).max() / np.abs(ref).max()
    assert rel_h < 1e-6, rel_h


def test_dw_wrapper_still_serves_no_dw_providers(rng):
    """Providers without a dw evaluation (wrapped, zero-lo) must keep
    working now that the dw kernels pass E as a (hi, lo) pair."""
    class NoDw:
        def __init__(self, g):
            self._g = g
            self.F, self.S = g.F, g.S
        def total_apply(self):
            return self._g.total_apply()
        def contact_apply(self, i):
            return self._g.contact_apply(i)
        def num_contacts(self):
            return 2
        def contact_inds(self, i=None):
            return self._g.contact_inds(i)

    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    n = 24
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = NoDw(Chain1DSelfEnergy(H, S, [np.arange(2), np.arange(n - 2, n)],
                               eta=1e-6))
    E = np.linspace(-1, 1, 4) + 0.1j
    out = EnergyEngine(H, S, g, ExecutionConfig(
        precision="high")).gr_sum(E, np.ones(4))
    assert np.isfinite(out).all()
    T = EnergyEngine(H, S, g, ExecutionConfig(
        precision="exact")).transmission(np.linspace(-1, 1, 4))
    assert np.isfinite(T).all()


def test_dyson_mode_has_no_dw_and_falls_back(rng):
    """method='dyson' providers must NOT silently switch to Sancho on the
    dw tiers: the dw API is disabled and the engine wraps the single-word
    sigma instead."""
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy

    n = 16
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = Chain1DSelfEnergy(H, S, [np.arange(2), np.arange(n - 2, n)],
                          eta=1e-6, method="dyson")
    assert g.total_apply_dw is None and g.contact_apply_dw is None
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision="high"))
    assert not eng._has_dw_sigma()
    out = eng.gr_sum(np.linspace(-1, 1, 4) + 0.1j, np.ones(4))
    assert np.isfinite(out).all()
