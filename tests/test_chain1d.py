"""1D-chain surface self-energy vs reference goldens (surfG1D parity)."""

import os

import numpy as np
import pytest

from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_v1.npz"))


def _provider(method):
    H, S = GOLD["chain_H"], GOLD["chain_S"]
    n_cell = 4
    inds1 = np.arange(n_cell)
    inds2 = np.arange(n_cell, 2 * n_cell)
    return Chain1DSelfEnergy(H, S, [inds1, inds2], eta=1e-4, method=method)


@pytest.mark.parametrize("method", ["sancho", "dyson"])
def test_sigma_tot_matches_reference(method):
    g = _provider(method)
    for E, ref in zip(GOLD["chain_Es"], GOLD["chain_sigma_tot"]):
        got = g.sigmaTot(float(E))
        assert np.max(np.abs(got - ref)) < 2e-4, (method, E)


def test_sigma_contact_matches_reference():
    g = _provider("sancho")
    for E, ref in zip(GOLD["chain_Es"], GOLD["chain_sigma_0"]):
        got = g.sigma(float(E), 0)
        assert np.max(np.abs(got - ref)) < 2e-4


def test_sigma_complex_energy():
    g = _provider("sancho")
    for z, ref in zip(GOLD["chain_zs"], GOLD["chain_sigma_tot_z"]):
        got = g.sigmaTot(complex(z))
        # both solvers stop at conv=1e-5 of the same fixed point
        assert np.max(np.abs(got - ref)) < 1e-5


def _provider_eta(method, eta):
    H, S = GOLD["chain_H"], GOLD["chain_S"]
    inds1 = np.arange(4)
    inds2 = np.arange(4, 8)
    return Chain1DSelfEnergy(H, S, [inds1, inds2], eta=eta, method=method)


def test_sancho_equals_dyson_where_dyson_converges():
    """With enough broadening the relaxed Dyson iteration converges and both
    solvers find the same fixed point."""
    gs = _provider_eta("sancho", 1e-2)
    gd = _provider_eta("dyson", 1e-2)
    gs.conv = 1e-12
    gd.conv = 1e-10
    for E in [-1.3, 0.4, 1.9]:
        a = gs.sigmaTot(E)
        b = gd.sigmaTot(E)
        # dyson's stopping rule measures per-iteration change, which under-
        # estimates distance to the fixed point at slow linear rates
        assert np.max(np.abs(a - b)) < 2e-4


def test_sancho_converges_where_dyson_stalls():
    """In-band at small eta the reference's relaxed Dyson iteration stalls
    (fixed-point residual ~0.26 after its 2000-iteration budget, verified
    against a 200k-iteration brute-force recursion); Sancho-Rubio decimation
    reaches machine precision.  Documented accuracy improvement."""
    g = _provider_eta("sancho", 1e-4)
    g.conv = 1e-12
    E = -1.3
    gs = np.asarray(g.surface_g(E, 0))
    c = g.params()["contacts"][0]
    A = np.asarray((E + 1j * g.eta) * c["Salpha"] - c["alpha"])
    B = np.asarray((E + 1j * g.eta) * c["Sbeta"] - c["beta"])
    resid = np.max(np.abs(np.linalg.inv(A - B @ gs @ B.conj().T) - gs))
    assert resid < 1e-10


def test_surface_g_fixed_point():
    """g must satisfy its own Dyson equation g = inv(A - B g B+)."""
    g = _provider("sancho")
    g.conv = 1e-12
    E = 0.8
    c = g.params()["contacts"][0]
    import jax.numpy as jnp
    A = (E + 1j * g.eta) * c["Salpha"] - c["alpha"]
    B = (E + 1j * g.eta) * c["Sbeta"] - c["beta"]
    gs = np.asarray(g.surface_g(E, 0))
    lhs = np.linalg.inv(np.asarray(A) - np.asarray(B) @ gs @ np.asarray(B).conj().T)
    assert np.max(np.abs(lhs - gs)) < 1e-8


def test_set_fock_shifts_lead_fermi():
    """Pattern (c): set_fock(mu) must shift alpha by dmu*I and beta by
    dmu*S_beta (surfG1D.py:330-342 semantics)."""
    n = 3
    alpha = np.diag([0.0, 0.5, -0.5])
    beta = -np.eye(n)
    Sa, Sb = np.eye(n), 0.1 * np.eye(n)
    F = np.zeros((6, 6))
    S = np.eye(6)
    g = Chain1DSelfEnergy(
        F, S, [[0, 1, 2], [3, 4, 5]],
        taus=[beta, beta], staus=[Sb, Sb],
        alphas=[alpha, alpha], a_overlaps=[Sa, Sa],
        betas=[beta, beta], b_overlaps=[Sb, Sb])
    g.set_fock(F, 0.0, 0.0)       # records initial fermi levels
    g.set_fock(F, 1.0, -1.0)      # shift left +1, right -1
    assert np.allclose(g.a_list[0], alpha + 1.0 * np.eye(n))
    assert np.allclose(g.b_list[0], beta + 1.0 * Sb)
    assert np.allclose(g.a_list[-1], alpha - 1.0 * np.eye(n))


def test_set_fock_auto_extraction_periodicity():
    """Pattern (a): set_fock overwrites contact onsite blocks with the
    adjacent-cell blocks (surfG1D.py:320-329 semantics)."""
    g = _provider("sancho")
    F2 = np.asarray(GOLD["chain_H"]).copy()
    F2[0, 0] += 0.7   # perturb the contact block
    g.set_fock(F2)
    # contact block [0:4,0:4] must equal the adjacent cell block [4:8,4:8]
    assert np.allclose(g.F[:4, :4], g.F[4:8, 4:8])


# ---------------------------------------------------------------------------
# Warm-started sweeps (previous-energy seeding; VERDICT r2 missing item 3)
# ---------------------------------------------------------------------------

def _junction(n=24, n_c=4):
    """Chain junction with REAL lead coupling: taus point at the cells
    adjacent to each contact block (the default 2-cell pattern would read
    zero coupling blocks out of a long chain)."""
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    inds1 = np.arange(n_c)
    inds2 = np.arange(n - n_c, n)
    taus = [np.arange(n_c, 2 * n_c), np.arange(n - 2 * n_c, n - n_c)]
    return H, S, Chain1DSelfEnergy(H, S, [inds1, inds2], taus=taus,
                                   eta=1e-4)


def test_chain_warm_transmission_matches_cold():
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    H, S, g = _junction()
    assert g.contacts_warm_apply is not None
    E = np.linspace(-1.5, 1.5, 48)
    cold = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=8, warm_start=False)).transmission(E)
    warm = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=8, warm_start="force")).transmission(E)
    np.testing.assert_allclose(warm, cold, rtol=0, atol=5e-5)


def test_chain_warm_gr_sum_matches_cold():
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    H, S, g = _junction()
    E = np.linspace(-2.0, 2.0, 32) + 0.05j
    w = np.ones(32)
    cold = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=8, warm_start=False)).gr_sum(E, w)
    warm = EnergyEngine(H, S, g, ExecutionConfig(
        energy_chunk=8, warm_start="force")).gr_sum(E, w)
    np.testing.assert_allclose(warm, cold, rtol=0, atol=5e-5)


def test_chain_warm_shared_solve_is_cold_exact():
    """The chain warm fn deliberately re-solves cold per energy (spurious
    fixed points make cross-energy seeding unsound; see chain1d.py), so
    warm must agree with cold to fp noise even across band features."""
    import jax.numpy as jnp

    from gaunegf_tpu.models.chain1d import (_chain_contacts_warm_fn,
                                            surface_g_sancho)
    from gaunegf_tpu.ops.complexio import call_complex_safe

    H, S, g = _junction()
    wfn = _chain_contacts_warm_fn(g._static_key())
    params = g.params()
    init = g._warm_init()

    def body(params, E):
        sigs, _ = wfn(params, E, init)
        return sigs[0] + sigs[1]

    for E in (0.3, 1.4231):
        warm = call_complex_safe(body, params, complex(E))
        cold = g.sigmaTot(E)
        assert np.max(np.abs(np.asarray(warm) - np.asarray(cold))) < 1e-10
