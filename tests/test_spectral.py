"""Spectral (eigenbasis + Woodbury) engine route vs the LU engines.

The spectral route (ops/spectral.py) must reproduce the LU engines' sums
at its precision contract (f32+dw pipeline: ~5e-6) for constant AND
energy-dependent contact self-energies, on serial and sharded meshes, and
must fall back to the LU route whenever the structure detection
disqualifies the provider.  Reference semantics: the sums are GrInt parity
(gauNEGF/integrate.py:84-142); the route itself has no reference
counterpart (the reference re-solves O(N^3) per energy point).
"""

import numpy as np
import pytest

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.ops.greens import EnergyEngine
from gaunegf_tpu.ops.spectral import detect_structure, spectral_basis
from gaunegf_tpu.parallel.mesh import energy_mesh


def _system(N=96, k_per=8, seed=0, overlap=False):
    rng = np.random.default_rng(seed)
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    if overlap:
        B = rng.standard_normal((N, N)) / (10 * np.sqrt(N))
        S = np.eye(N) + 0.5 * (B + B.T)
    else:
        S = np.eye(N)
    inds = [np.arange(k_per), np.arange(N - k_per, N)]
    return H, S, inds


def _grids(nE=24):
    th = np.linspace(0.1, np.pi - 0.1, nE)
    zc = -1.0 + 1.5 * np.exp(1j * th)
    wc = (0.3 + 0.1j) * np.ones(nE) / nE
    zr = np.linspace(-1.5, 1.5, nE)
    wr = np.ones(nE) / nE
    return zc, wc, zr, wr


def _relerr(a, b):
    return np.abs(a - b).max() / np.abs(b).max()


@pytest.mark.parametrize("overlap", [False, True])
def test_spectral_matches_strict_constant_sigma(overlap):
    H, S, inds = _system(overlap=overlap)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, zr, wr = _grids()
    truth_c = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zc, wc)
    truth_r = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    assert eng._spectral_runner() is not None
    assert _relerr(eng.gr_sum(zc, wc), truth_c) < 5e-6
    assert _relerr(eng.gr_sum(zr, wr), truth_r) < 5e-6


def test_spectral_sharded_matches_serial():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, _, _ = _grids()
    serial = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral")).gr_sum(zc, wc)
    sharded = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"),
        energy_mesh()).gr_sum(zc, wc)
    # per-device partial sums psum in f32: summation-order noise ~eps32
    assert _relerr(sharded, serial) < 5e-7


def test_spectral_forced_dw_mode():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    _, _, zr, wr = _grids()
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    # with deflation on (default), an all-near grid runs mode 'defl'
    eng_d = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_dist_f32=1e9))
    assert eng_d._spectral_runner()._mode(zr) == "defl"
    assert _relerr(eng_d.gr_sum(zr, wr), truth) < 5e-6
    # spectral_deflate=0 restores the dw-tier ladder
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_dist_f32=1e9, spectral_deflate=0))
    assert eng._spectral_runner()._mode(zr) == "dwl"
    assert _relerr(eng.gr_sum(zr, wr), truth) < 5e-6
    # the full-exact tier stays reachable and at least as accurate
    eng_full = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_dist_f32=1e9, spectral_dw="full", spectral_deflate=0))
    assert eng_full._spectral_runner()._mode(zr) == "dw"
    assert _relerr(eng_full.gr_sum(zr, wr), truth) < 5e-6


def test_spectral_near_pole_grid():
    """Grid points near bare eigenvalues: one inside the old dw band
    (3e-5) and one inside the old LU band (1e-7).  With deflation on
    (default) BOTH are served in the spectral dispatch (mode 'defl'
    segment, no fallback); spectral_deflate=0 restores the dw-segment +
    LU-fallback ladder.  Both must match the strict path."""
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam, _ = spectral_basis(H, S)
    zr = np.linspace(-1.5, 1.5, 24)
    zr[10] = lam[len(lam) // 2] + 1e-7
    zr[15] = lam[len(lam) // 3] + 3e-5
    wr = np.ones(24) / 24
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    runner = eng._spectral_runner()
    (Eg, wg), (Eb, wb) = runner.split_grid(zr, wr)
    assert Eb.size == 0 and Eg.size == 24       # deflation serves all
    d = runner._dists(Eg)
    assert (d < eng.exec_cfg.spectral_dist_f32).sum() >= 2
    assert _relerr(eng.gr_sum(zr, wr), truth) < 1e-5
    # legacy ladder (deflation off): 1e-7 point re-routed through a
    # second LU dispatch by split_grid, 3e-5 point in the dw segment
    eng0 = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_deflate=0))
    (Eg0, _), (Eb0, _) = eng0._spectral_runner().split_grid(zr, wr)
    assert Eb0.size == 1 and abs(Eb0[0] - zr[10]) < 1e-12
    assert _relerr(eng0.gr_sum(zr, wr), truth) < 1e-5
    # spectral_dw='full' (the round-4-early products) agrees too
    eng_full = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_dw="full", spectral_deflate=0))
    assert _relerr(eng_full.gr_sum(zr, wr), truth) < 1e-5


def test_spectral_chain_provider_energy_dependent():
    """Energy-dependent chain Sigma through the spectral route: the k x k
    block M(z) is re-evaluated per point (Sancho fixed point), only the
    bare resolvent is spectral."""
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    N = 40
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    S = np.eye(N)
    inds = [np.arange(4), np.arange(N - 4, N)]
    g = Chain1DSelfEnergy(H, S, inds, eta=1e-4)
    zc = np.linspace(-1.0, 1.0, 12) + 0.05j
    wc = np.ones(12) / 12
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zc, wc)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    assert eng._spectral_runner() is not None, \
        "chain sigma must be detected as contact-block structured"
    assert _relerr(eng.gr_sum(zc, wc), truth) < 2e-5


def test_detection_rejects_leaky_sigma():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    rng = np.random.default_rng(1)
    g._sigs = g._sigs + (-0.01j) * rng.standard_normal(g._sigs.shape[1:])
    assert detect_structure(g, S) is None
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    assert eng._spectral_runner() is None
    # the LU fallback still answers
    zc, wc, _, _ = _grids(8)
    out = eng.gr_sum(zc, wc)
    assert np.isfinite(out).all()


def test_fallback_no_contact_inds():
    class NoInds:
        def __init__(self, base):
            self.base = base
            self.F = np.zeros_like(base)
            self.S = np.eye(base.shape[0])

        def params(self):
            return {"base": self.base}

        def total_apply(self):
            return _noinds_total, self.params()

        def num_contacts(self):
            return 2

    H, S, _ = _system(32)
    g = NoInds(H * 0.1)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    assert eng._spectral_runner() is None
    zc, wc, _, _ = _grids(8)
    assert np.isfinite(eng.gr_sum(zc, wc)).all()


def _noinds_total(params, E):
    import jax.numpy as jnp
    n = params["base"].shape[0]
    return params["base"] * (1 + 0.1 * E) - 1j * 0.05 * jnp.eye(n)


def test_basis_rejects_complex_h():
    H, S, _ = _system(32)
    Hc = H.astype(complex)
    Hc[0, 1] += 0.1j
    Hc[1, 0] -= 0.1j
    assert spectral_basis(Hc, S) is None


def test_on_pole_point_exact_hit():
    """c0 = 0 provider (no background) with a grid point numerically ON a
    bare eigenvalue (pole distance EXACTLY 0).  Deflation (default)
    serves it inside the spectral dispatch: the capacitance
    S_m = diag(z-lam_near) - B_m stays invertible through the contact
    coupling's imaginary part even at delta = 0.  With deflation off,
    split_grid must hand the point to the LU fallback instead.  Both
    must match the strict path."""
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds)          # default: no background
    lam, _ = spectral_basis(H, S)
    zr = np.linspace(-1.5, 1.5, 12)
    zr[4] = lam[30]
    wr = np.ones(12) / 12
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    runner = eng._spectral_runner()
    assert runner is not None
    (Eg, _), (Eb, _) = runner.split_grid(zr, wr)
    assert Eb.size == 0 and Eg.size == 12       # deflation serves all
    assert _relerr(eng.gr_sum(zr, wr), truth) < 1e-5
    eng0 = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_deflate=0))
    (Eg0, _), (Eb0, _) = eng0._spectral_runner().split_grid(zr, wr)
    assert Eb0.size == 1 and Eg0.size == 11
    assert _relerr(eng0.gr_sum(zr, wr), truth) < 1e-5


def test_spectral_gless_matches_strict():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    _, _, zr, wr = _grids()
    for contact in (None, 0, 1):
        truth = EnergyEngine(H, S, g, ExecutionConfig(
            precision="strict", energy_chunk=4)).gless_sum(zr, wr, contact)
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=4, solver="spectral"))
        got = eng.gless_sum(zr, wr, contact)
        assert _relerr(got, truth) < 5e-6, contact


def test_spectral_gless_near_pole_deflated():
    """G< with grid points at 1e-7 / 3e-5 / exact-zero pole distance:
    the deflated kernel's analytic Sherman-Morrison identities must hold
    for the sandwich Xt = G P_c too (bias-window grids run on the real
    axis, where near-pole hits are routine at production N)."""
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam, _ = spectral_basis(H, S)
    zr = np.linspace(-1.5, 1.5, 24)
    zr[5] = lam[20] + 1e-7
    zr[11] = lam[len(lam) // 2]
    zr[17] = lam[60] + 3e-5
    wr = np.ones(24) / 24
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gless_sum(zr, wr, 0)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    runner = eng._spectral_runner()
    (Eg, _), (Eb, _) = runner.split_grid(zr, wr)
    assert Eb.size == 0                          # deflation serves all
    assert _relerr(eng.gless_sum(zr, wr, 0), truth) < 2e-5


def test_spectral_deflated_segment_single_dispatch():
    """A mixed far/near grid builds exactly two segments (f32 + defl)
    and matches truth; an all-far grid stays pure f32 (no deflation
    overhead on the bulk)."""
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam, _ = spectral_basis(H, S)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    runner = eng._spectral_runner()
    far = np.linspace(-1.5, 1.5, 16) + 0.05j
    assert runner._mode(far) == "f32"
    zr = np.linspace(-1.5, 1.5, 16)
    zr[3] = lam[30] + 1e-6
    assert runner._mode(zr) == "defl"
    wr = np.ones(16) / 16
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    assert _relerr(eng.gr_sum(zr, wr), truth) < 1e-5


def test_spectral_transmission_matches_strict():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam, _ = spectral_basis(H, S)
    E = np.linspace(-1.8, 1.8, 32)
    E[7] = lam[40] + 1e-7          # LU-band point, scattered back in place
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).transmission(E)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    got = eng.transmission(E)
    assert got.shape == truth.shape
    assert np.abs(got - truth).max() / np.abs(truth).max() < 2e-5


def test_spectral_gr_sum_im_epilog():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, _, _ = _grids()
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    full = eng.gr_sum(zc, wc)
    im = eng.gr_sum(zc, wc, epilog="im")
    assert im.dtype == np.float64
    assert np.abs(im - np.imag(full)).max() <= 1e-6 * np.abs(full).max()


def test_spectral_density_neq_matches_lu():
    H, S, inds = _system()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, zr, wr = _grids(12)
    lu = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4)).density_neq_sum(zc, wc, zr, wr)
    sp = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4,
        solver="spectral")).density_neq_sum(zc, wc, zr, wr)
    assert _relerr(sp, lu) < 1e-5


def test_spectral_negfe_scf_matches_default():
    """Production path: a full NEGFE SCF with solver='spectral' converges
    to the same density as the default LU solver (eigh per cycle, fresh
    detection per rebuilt Fock)."""
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.scfe import NEGFE

    def run(cfg):
        n = 12
        H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
        b = TightBindingFock(H0, n_electrons=n, U=0.4, n0=0.5 * np.ones(n))
        d = NEGFE(b, name="/tmp/spectral_scf", exec_cfg=cfg, verbose=False)
        d.setSigma([1, 2], [n - 1, n], sig=-0.1j, T=0)
        d.setIntegralLimits(N1=32, N2=16)
        d.setVoltage(0.0, fermi=0.05)
        d.SCF(conv=1e-6, damping=0.1, max_cycles=120, checkpoint=False)
        return d.P

    P_lu = run(ExecutionConfig(precision="mixed", energy_chunk=4))
    P_sp = run(ExecutionConfig(precision="mixed", energy_chunk=4,
                               solver="spectral"))
    # both converged to 1e-6; residual difference is per-dispatch accuracy
    assert np.abs(P_lu - P_sp).max() < 2e-5


@pytest.mark.parametrize("overlap", [False, True])
def test_spectral_device_basis(overlap):
    """spectral_basis='device': f32 eigh + Ogita-Aishima dw refinement on
    the device replaces the host f64 eigh; the resolvent floor (~1e-7)
    stays below the mixed contract."""
    H, S, inds = _system(overlap=overlap)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, zr, wr = _grids()
    truth_c = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zc, wc)
    truth_r = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_basis="device"))
    assert eng._spectral_runner() is not None
    assert _relerr(eng.gr_sum(zc, wc), truth_c) < 1e-5
    assert _relerr(eng.gr_sum(zr, wr), truth_r) < 1e-5


def test_device_basis_refinement_quality():
    """The OA-refined device basis must reach dw-class eigenvalues and
    orthogonality from an f32 seed, including degenerate clusters."""
    from gaunegf_tpu.ops.spectral import device_basis
    rng = np.random.default_rng(5)
    N = 120
    Q, _ = np.linalg.qr(rng.standard_normal((N, N)))
    lam_true = np.sort(rng.uniform(-2, 2, N))
    lam_true[50:54] = lam_true[50]              # exact 4-fold degeneracy
    A = (Q * lam_true[None, :]) @ Q.T
    A = 0.5 * (A + A.T)
    lam64, lam_dw, C_dw = device_basis(A, np.eye(N))
    C = (np.asarray(C_dw[0], np.float64)
         + np.asarray(C_dw[1], np.float64))
    # robust to-tolerance refinement (round-4 session 7): lam 1.5e-13 /
    # A-invariance 1.4e-13 (the legacy fixed-2-step path measured
    # 3.1e-10 / 8.8e-8); orthogonality trails the A-coupling exit
    # criterion slightly (~1.3e-10 vs legacy 2e-11) -- still 4 decades
    # under the mixed contract
    assert np.abs(np.sort(lam64) - lam_true).max() < 5e-12
    assert np.abs(C.T @ C - np.eye(N)).max() < 5e-10
    # A-invariance governs the resolvent quality
    assert np.abs(A @ C - C * lam64[None, :]).max() < 5e-12


def test_solver_default_auto_engages_spectral():
    """solver='auto' (the default since round 4) engages the spectral
    route for qualifying providers and 'lu' forces the LU engines."""
    H, S, inds = _system(32)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision="mixed",
                                                energy_chunk=4))
    assert eng.exec_cfg.solver == "auto"
    assert eng._spectral_runner() is not None
    eng_lu = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="lu"))
    assert eng_lu._spectral_runner() is None
    # high/exact tiers keep the LU engines under 'auto'
    eng_hi = EnergyEngine(H, S, g, ExecutionConfig(
        precision="high", energy_chunk=4))
    assert eng_hi._spectral_runner() is None


def test_defl_union_ritz_refinement():
    """The deflation's near-union Rayleigh-Ritz refinement (device basis):
    cluster-mixed OA columns floor the deflated near-pole sum; the
    refined basis must match the host-basis result at the host floor.

    Evidence chain: e51 (device: host 4.05e-7 vs raw device 4.45e-5,
    f64-lambda splice changes nothing), e52 (CPU: union rotation recovers
    4.09e-7), e53 (device: integrated path 4.34e-7)."""
    H, S, inds = _system(N=128, seed=3)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam = np.linalg.eigvalsh(H)
    # grid pinned at/near bare eigenvalues (forces the deflated segment)
    E = np.array([lam[40] + 3e-7, lam[64], lam[90] - 1e-6])
    w = np.ones(E.size)
    truth = EnergyEngine(H, S, g, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(E, w)

    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_basis="device"))
    r = eng._spectral_runner()
    assert r is not None and r._basis_is_device
    assert r._mode(E) == "defl"
    out = r.gr_sum(eng.provider, eng._params_split, E, w)
    assert _relerr(out, truth) < 5e-6
    # the refinement ran and is cached per padded union
    assert len(r._ritz_cache) == 1
    out2 = r.gr_sum(eng.provider, eng._params_split, E, w)
    assert len(r._ritz_cache) == 1
    assert _relerr(out2, truth) < 5e-6
    # host basis is the reference: no refinement state is created there
    eng_h = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_basis="host"))
    r_h = eng_h._spectral_runner()
    out_h = r_h.gr_sum(eng_h.provider, eng_h._params_split, E, w)
    assert len(r_h._ritz_cache) == 0
    assert _relerr(out_h, truth) < 5e-6


def test_defl_union_ritz_sharded():
    """The refinement's mesh branch (replicated device_put of the refined
    tree + dw H/S): sharded deflated sums match serial at ~eps32."""
    H, S, inds = _system(N=64, seed=7)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    lam = np.linalg.eigvalsh(H)
    E = np.concatenate([[lam[20] + 1e-6, lam[40]],
                        np.linspace(-1.2, 1.2, 6)])
    w = np.ones(E.size)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=2,
                          solver="spectral", spectral_basis="device")
    ser = EnergyEngine(H, S, g, cfg)
    r_ser = ser._spectral_runner()
    assert r_ser is not None and r_ser._mode(E) == "defl"
    out_ser = r_ser.gr_sum(ser.provider, ser._params_split, E, w)
    shard = EnergyEngine(H, S, g, cfg, mesh=energy_mesh(4))
    r_sh = shard._spectral_runner()
    out_sh = r_sh.gr_sum(shard.provider, shard._params_split, E, w)
    assert len(r_sh._ritz_cache) == 1
    assert _relerr(out_sh, out_ser) < 1e-5


def test_device_basis_warm_seed_accept_and_reject():
    """Warm-seeded device basis: a small Fock step refines from the
    previous cycle's eigenvectors (no f32 eigh) at cold-basis quality;
    an unrelated Fock is rejected by the separated-pair residual gauge
    and falls back to the cold path -- accuracy never depends on the
    SCF step size."""
    from gaunegf_tpu.ops import spectral as sp
    rng = np.random.default_rng(11)
    N = 96
    Q, _ = np.linalg.qr(rng.standard_normal((N, N)))
    lam_true = np.sort(rng.uniform(-2, 2, N))
    A = (Q * lam_true[None, :]) @ Q.T
    A = 0.5 * (A + A.T)
    sp._WARM_X_CACHE.clear()
    lam0, _, _ = sp.device_basis(A, np.eye(N), warm=True)
    assert sp.device_basis.last_path == "cold"
    assert len(sp._WARM_X_CACHE) == 1
    # SCF-like step: ~1e-4 symmetric perturbation
    dF = 1e-4 * rng.standard_normal((N, N))
    A1 = A + 0.5 * (dF + dF.T)
    lam1, lam_dw1, C_dw1 = sp.device_basis(A1, np.eye(N), warm=True)
    assert sp.device_basis.last_path == "warm"
    assert np.all(np.diff(lam1) >= 0)          # sorted despite seed order
    truth1 = np.linalg.eigvalsh(A1)
    assert np.abs(lam1 - truth1).max() < 5e-9
    C1 = (np.asarray(C_dw1[0], np.float64)
          + np.asarray(C_dw1[1], np.float64))
    assert np.abs(C1.T @ C1 - np.eye(N)).max() < 1e-8
    assert np.abs(A1 @ C1 - C1 * lam1[None, :]).max() < 5e-7
    # unrelated Fock: the gauge must reject the stale seed
    B = rng.standard_normal((N, N))
    A2 = 0.5 * (B + B.T)
    lam2, _, _ = sp.device_basis(A2, np.eye(N), warm=True)
    assert sp.device_basis.last_path == "rejected"
    assert np.abs(lam2 - np.linalg.eigvalsh(A2)).max() < 5e-9
    sp._WARM_X_CACHE.clear()


def test_device_basis_warm_two_focks_per_key():
    """Spin-unrestricted SCF pattern: two Fock families alternate against
    the same (N, S) key.  The two-slot nearest-H cache must hand each
    spin its OWN predecessor (both warm-accepted from round 2 on) instead
    of ping-ponging between the spins' bases."""
    from gaunegf_tpu.ops import spectral as sp
    rng = np.random.default_rng(17)
    N = 64
    base = rng.standard_normal((N, N))
    base = 0.5 * (base + base.T)
    # well-separated spin channels: +/-0.5 diagonal polarization
    H_up = base + 0.5 * np.diag(np.linspace(0, 1, N))
    H_dn = base - 0.5 * np.diag(np.linspace(0, 1, N))
    sp._WARM_X_CACHE.clear()
    paths = []
    for cyc in range(3):
        for H in (H_up, H_dn):
            Hc = H + 1e-4 * cyc * np.diag(np.linspace(-1, 1, N))
            lam, _, _ = sp.device_basis(Hc, np.eye(N), warm=True)
            paths.append(sp.device_basis.last_path)
            assert np.abs(lam - np.linalg.eigvalsh(Hc)).max() < 5e-9
    assert paths[0] == "cold"
    assert paths[2:] == ["warm"] * 4, paths
    assert len(sp._WARM_X_CACHE) == 1
    assert len(next(iter(sp._WARM_X_CACHE.values()))) == 2
    sp._WARM_X_CACHE.clear()


def test_device_basis_warm_overlap_engine_accuracy():
    """End-to-end: two engines on slightly different Focks (the SCF
    rebuild pattern) with spectral_basis='device' -- the second engages
    the warm basis and still matches the strict-LU truth."""
    from gaunegf_tpu.ops import spectral as sp
    H, S, inds = _system(overlap=True, seed=3)
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    zc, wc, zr, wr = _grids(12)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4,
                          solver="spectral", spectral_basis="device",
                          spectral_warm_basis=True)
    sp._WARM_X_CACHE.clear()
    eng0 = EnergyEngine(H, S, g, cfg)
    assert eng0._spectral_runner() is not None
    eng0.gr_sum(zc, wc)
    assert sp.device_basis.last_path == "cold"
    rng = np.random.default_rng(4)
    dF = 1e-4 * rng.standard_normal(H.shape)
    H1 = H + 0.5 * (dF + dF.T)
    g1 = ConstantSelfEnergy(H1, S, inds, sig1=-0.1j)
    truth_c = EnergyEngine(H1, S, g1, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zc, wc)
    truth_r = EnergyEngine(H1, S, g1, ExecutionConfig(
        precision="strict", energy_chunk=4)).gr_sum(zr, wr)
    eng1 = EnergyEngine(H1, S, g1, cfg)
    assert _relerr(eng1.gr_sum(zc, wc), truth_c) < 5e-6
    assert sp.device_basis.last_path == "warm"
    assert _relerr(eng1.gr_sum(zr, wr), truth_r) < 1e-5
    # opting out pins the cold path
    eng2 = EnergyEngine(H1, S, g1, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_basis="device", spectral_warm_basis=False))
    eng2.gr_sum(zc, wc)
    assert sp.device_basis.last_path == "cold"
    sp._WARM_X_CACHE.clear()


def test_basis_auto_resolution_by_backend(monkeypatch):
    """'auto' = robust device basis on accelerators for
    N >= spectral_basis_device_min_n, host f64 eigh otherwise (round 5;
    e60 validated device accuracy, e63/e46 set the size gate): a CPU
    session resolves to 'host'; an accelerator-reporting backend picks
    'device' only at/above the threshold."""
    import jax as _jax

    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    n = 64
    rng = np.random.default_rng(3)
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.1 * rng.standard_normal(n))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                           sig1=-0.1j)

    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    r = eng._spectral_runner()
    assert r is not None and not r._basis_is_device   # CPU session -> host

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    eng2 = EnergyEngine(H + 1e-9 * np.eye(n), S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral"))
    r2 = eng2._spectral_runner()
    assert r2 is not None and not r2._basis_is_device  # below min_n: host

    eng3 = EnergyEngine(H + 2e-9 * np.eye(n), S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, solver="spectral",
        spectral_basis_device_min_n=0))
    r3 = eng3._spectral_runner()
    assert r3 is not None and r3._basis_is_device      # accel + gate off
