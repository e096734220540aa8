"""Energy-batched Green's engine vs reference GrInt/GrLessInt goldens,
plus sharded-vs-serial equivalence on the virtual 8-device mesh."""

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.ops.greens import EnergyEngine
from gaunegf_tpu.parallel.mesh import energy_mesh

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_v1.npz"))


class MockSigma:
    """Energy-dependent mock provider: Sigma(E) = base*(1+0.1E) - 0.05j*I."""

    def __init__(self, base):
        self.base = jnp.asarray(base)
        self.N = base.shape[0]
        self.F = np.zeros((self.N, self.N))
        self.S = np.eye(self.N)

    def params(self):
        return {"base": self.base}

    def total_apply(self):
        return _mock_total, self.params()

    def contact_apply(self, i):
        return _mock_half, self.params()

    def num_contacts(self):
        return 2


def _mock_total(params, E):
    n = params["base"].shape[0]
    return params["base"] * (1 + 0.1 * E) - 1j * 0.05 * jnp.eye(n)


def _mock_half(params, E):
    return _mock_total(params, E) / 2


def _engine(mesh=None):
    H = GOLD["gint_H"]
    S = np.eye(H.shape[0])
    mock = MockSigma(GOLD["gint_base"])
    return EnergyEngine(H, S, mock, ExecutionConfig(energy_chunk=4), mesh)


def test_gr_sum_matches_reference():
    got = _engine().gr_sum(GOLD["gint_E"], GOLD["gint_w"])
    assert np.max(np.abs(got - GOLD["gint_gr"])) < 1e-10


def test_gless_sum_matches_reference():
    got = _engine().gless_sum(GOLD["gint_E"], GOLD["gint_w"], contact=0)
    assert np.max(np.abs(got - GOLD["gint_gless"])) < 1e-10


def test_sharded_equals_serial():
    mesh = energy_mesh()
    assert mesh.shape["e"] == 8
    E, w = GOLD["gint_E"], GOLD["gint_w"]
    serial = _engine().gr_sum(E, w)
    sharded = _engine(mesh).gr_sum(E, w)
    assert np.max(np.abs(serial - sharded)) < 1e-12

    sl = _engine().gless_sum(E, w, contact=0)
    sh = _engine(mesh).gless_sum(E, w, contact=0)
    assert np.max(np.abs(sl - sh)) < 1e-12


def test_sharded_transmission_map():
    mesh = energy_mesh()
    E = np.linspace(-2, 2, 11)
    serial = _engine().transmission(E)
    sharded = _engine(mesh).transmission(E)
    assert serial.shape == (11,)
    assert np.max(np.abs(serial - sharded)) < 1e-12
    assert np.all(serial >= 0)


def test_odd_sizes_and_padding():
    """Grid sizes that don't divide the (devices x chunk) layout."""
    mesh = energy_mesh()
    for nE in [1, 3, 7, 13, 33]:
        E = np.linspace(-1, 1, nE)
        w = np.ones(nE)
        a = _engine().gr_sum(E, w)
        b = _engine(mesh).gr_sum(E, w)
        assert np.max(np.abs(a - b)) < 1e-12, nE


def test_dos_map():
    E = np.linspace(-2, 2, 9)
    tot, site = _engine().dos(E)
    assert tot.shape == (9,)
    assert site.shape == (9, GOLD["gint_H"].shape[0])
    assert np.allclose(tot, site.sum(axis=1))
    assert np.all(tot > 0)


def test_continuation_engine_matches_standard():
    """Newton-Schulz continuation: dense grids track the LU path; coarse
    grids trigger the residual-gated LU fallback and stay exact."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.parallel.mesh import energy_mesh

    rng = np.random.default_rng(0)
    n = 60
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(n))
    S = np.eye(n) + 0.02 * (lambda x: (x + x.T) / 2)(
        rng.standard_normal((n, n)))
    g = ConstantSelfEnergy(H, S, [np.arange(6), np.arange(n - 6, n)],
                           sig1=-0.05j)
    E = np.linspace(-2.5, 2.5, 75) + 1e-3j
    w = rng.random(75)
    std = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=8, solver="lu")).gr_sum(E, w)
    chn = EnergyEngine(
        H, S, g, ExecutionConfig(energy_chunk=8, continuation=True),
    ).gr_sum(E, w)
    assert np.abs(chn - std).max() / np.abs(std).max() < 1e-10

    # coarse grid: every step falls back to LU (dE * ||S G|| >> gate)
    E2 = np.linspace(-3, 3, 9) + 1e-3j
    w2 = rng.random(9)
    std2 = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=4, solver="lu")).gr_sum(E2, w2)
    chn2 = EnergyEngine(
        H, S, g, ExecutionConfig(energy_chunk=4, continuation=True),
    ).gr_sum(E2, w2)
    assert np.abs(chn2 - std2).max() / np.abs(std2).max() < 1e-10

    # sharded == serial
    chn8 = EnergyEngine(
        H, S, g, ExecutionConfig(energy_chunk=8, continuation=True),
        mesh=energy_mesh()).gr_sum(E, w)
    assert np.abs(chn8 - chn).max() / np.abs(chn).max() < 1e-12


def test_params_cache_sees_inplace_mutation(rng):
    """The device-resident params cache keys on CONTENT, not identity:
    a provider that mutates its param arrays IN PLACE (the
    Chain1DSelfEnergy.setF pattern) must get fresh physics on the next
    dispatch, and an unchanged provider must hit the cache."""
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    n = 40
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                           sig1=-0.05j)
    E = np.linspace(-2, 2, 16) + 0.05j
    w = np.ones(16)
    eng = EnergyEngine(H, S, g, ExecutionConfig(energy_chunk=4))
    out1 = eng.gr_sum(E, w)
    assert len(eng._params_dev) == 1
    out1b = eng.gr_sum(E, w)
    assert len(eng._params_dev) == 1          # unchanged params: cache hit
    np.testing.assert_array_equal(out1, out1b)

    g._sigs *= 2.0                            # in-place mutation
    out2 = eng.gr_sum(E, w)
    assert len(eng._params_dev) == 2          # new digest: re-uploaded
    fresh = EnergyEngine(H, S, ConstantSelfEnergy(
        H, S, [np.arange(4), np.arange(n - 4, n)], sig1=-0.1j),
        ExecutionConfig(energy_chunk=4)).gr_sum(E, w)
    # atol 1e-6, not exact: doubling _sigs also doubles form_sigma's
    # -1j*1e-9*S background, which the fresh sig1=-0.1j provider has once
    np.testing.assert_allclose(out2, fresh, rtol=0, atol=1e-6)
    assert np.max(np.abs(out2 - out1)) > 1e-6


def test_operand_cache_shares_device_trees():
    """Two engines on the same (H, S) share one device tree (the SCF
    rebuild pattern: fresh F each cycle, same overlap -- S must not
    re-upload), and different H gets its own entry."""
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    n = 24
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(3), np.arange(n - 3, n)],
                           sig1=-0.05j)
    e1 = EnergyEngine(H, S, g, ExecutionConfig(energy_chunk=4))
    e2 = EnergyEngine(H + 0.1 * np.eye(n), S, g,
                      ExecutionConfig(energy_chunk=4))
    assert e1.S_s is e2.S_s                   # same overlap: cache hit
    assert e1.H_s is not e2.H_s               # different Fock: miss
    e3 = EnergyEngine(H, S, g, ExecutionConfig(energy_chunk=8))
    assert e3.H_s is e1.H_s and e3.S_s is e1.S_s
