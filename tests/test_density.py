"""Density integration routes vs reference goldens (density.py parity)."""

import os

import numpy as np

from gaunegf_tpu import density as dens
from gaunegf_tpu import quadrature as quad
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.parallel.mesh import energy_mesh

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_v1.npz"))


def _system():
    H = GOLD["dens_H"]
    n = H.shape[0]
    S = np.eye(n)
    c_inds = [np.arange(4), np.arange(12, 16)]
    g = ConstantSelfEnergy(H, S, c_inds, sig1=-0.1j)
    return H, S, g


def test_constant_sigma_matches_reference():
    H, S, g = _system()
    assert np.max(np.abs(g.sigmaTot(0.0) - GOLD["dens_sig_tot"])) < 1e-14


def test_ant_points_match_reference():
    x, w = quad.ant_points(16)
    assert np.max(np.abs(x - GOLD["ant_x_16"])) < 1e-14
    assert np.max(np.abs(w - GOLD["ant_w_16"])) < 1e-14


def _lu_cfg(**kw):
    """The strict golden tolerances below encode the LU route's x64-CPU
    behavior (~1e-10); the default 'auto' solver routes these grids
    through the spectral f32 assembly whose contract is 2e-6, so each
    golden test pins solver='lu' for the tight assert and re-checks the
    default route at its own contract."""
    from gaunegf_tpu.config import ExecutionConfig
    return ExecutionConfig(solver="lu", **kw)


def test_density_complex_n():
    H, S, g = _system()
    P = dens.density_complex_n(H, S, g, -4.0, 0.5, 64, T=0,
                               exec_cfg=_lu_cfg())
    assert np.max(np.abs(P - GOLD["dens_complexN"])) < 1e-9
    P_auto = dens.density_complex_n(H, S, g, -4.0, 0.5, 64, T=0)
    assert np.max(np.abs(P_auto - GOLD["dens_complexN"])) < 2e-6


def test_density_real_n():
    H, S, g = _system()
    P = dens.density_real_n(H, S, g, -6.0, 0.5, 128, T=0,
                            exec_cfg=_lu_cfg())
    assert np.max(np.abs(P - GOLD["dens_realN"])) < 1e-9
    P_auto = dens.density_real_n(H, S, g, -6.0, 0.5, 128, T=0)
    assert np.max(np.abs(P_auto - GOLD["dens_realN"])) < 2e-6


def test_density_grid_n():
    H, S, g = _system()
    # default config uses the low-rank contact path, which drops the
    # -1j*1e-9*S broadening background from Gamma (~1e-7 contribution)
    P = dens.density_grid_n(H, S, g, -0.4, 0.4, ind=1, N=64, T=0,
                            exec_cfg=_lu_cfg())
    assert np.max(np.abs(P - GOLD["dens_gridN"])) < 5e-7

    P_dense = dens.density_grid_n(H, S, g, -0.4, 0.4, ind=1, N=64, T=0,
                                  exec_cfg=_lu_cfg(use_lowrank=False))
    assert np.max(np.abs(P_dense - GOLD["dens_gridN"])) < 1e-9
    # default route (spectral gless): the G Gamma G^H sandwich contract
    P_auto = dens.density_grid_n(H, S, g, -0.4, 0.4, ind=1, N=64, T=0)
    assert np.max(np.abs(P_auto - GOLD["dens_gridN"])) < 1e-5


def test_density_sharded_equals_serial():
    H, S, g = _system()
    mesh = energy_mesh()
    # LU: bit-identical up to psum order (x64).  The spectral route's
    # sharded==serial story (f32 psum noise) is covered in test_spectral.
    P1 = dens.density_complex_n(H, S, g, -4.0, 0.5, 64, T=0,
                                exec_cfg=_lu_cfg())
    P2 = dens.density_complex_n(H, S, g, -4.0, 0.5, 64, T=0, mesh=mesh,
                                exec_cfg=_lu_cfg())
    assert np.max(np.abs(P1 - P2)) < 1e-12


def test_density_analytic_matches_reference():
    P = dens.density_analytic(GOLD["analytic_V"],
                              np.linalg.inv(GOLD["analytic_V"].conj().T),
                              GOLD["analytic_D"],
                              None if False else _gambar(),
                              -1e6, 0.3)
    assert np.max(np.abs(P - GOLD["analytic_P"])) < 1e-10


def _gambar():
    H, S, g = _system()
    sig = g.sigmaTot(0.0)
    Gam = 1j * (sig - sig.conj().T)
    return Gam  # S = I so X = I


def test_bisect_fermi_matches_reference():
    V = GOLD["analytic_V"]
    Vc = np.linalg.inv(V.conj().T)
    f = dens.bisect_fermi(V, Vc, GOLD["analytic_D"], _gambar(), 8.0,
                          conv=1e-10, verbose=False)
    assert abs(f - float(GOLD["analytic_fermi"])) < 1e-8


def test_contour_equals_real_axis_route():
    """Physics identity: equilibrium density from the complex contour must
    equal dense real-axis integration (path independence)."""
    H, S, g = _system()
    Pc = dens.density_complex_n(H, S, g, -4.0, 0.2, 96, T=0)
    Pr = dens.density_real_n(H, S, g, -4.0, 0.2, 4096, T=0)
    assert np.max(np.abs(Pc - Pr)) < 5e-4


def test_adaptive_routes():
    H, S, g = _system()
    Pn = dens.density_complex_n(H, S, g, -4.0, 0.5, 162, T=0)
    Pa = dens.density_complex(H, S, g, -4.0, 0.5, tol=1e-7, T=0, verbose=False)
    assert np.max(np.abs(Pa - Pn)) < 1e-5

    Pg = dens.density_grid(H, S, g, -0.4, 0.4, ind=1, tol=1e-7, T=0)
    Pgn = dens.density_grid_n(H, S, g, -0.4, 0.4, ind=1, N=162, T=0)
    assert np.max(np.abs(Pg - Pgn)) < 1e-5


def test_integral_fit_matches_reference():
    H, S, g = _system()
    emin, n1, n2 = dens.integral_fit(H, S, g, 0.0, -1e6, 1e-4, T=0,
                                     verbose=False)
    assert emin == float(GOLD["fit_emin"])
    assert n1 == int(GOLD["fit_n1"])
    assert n2 == int(GOLD["fit_n2"])


def test_density_finite_temperature_physical():
    """Finite-T contour density: trace interpolates between T=0 fillings and
    stays close for mu in a gap (documented sign fix vs reference)."""
    H, S, g = _system()
    P0 = dens.density_complex_n(H, S, g, -4.0, 0.0, 128, T=0)
    PT = dens.density_complex_n(H, S, g, -4.0, 0.0, 256, T=300.0)
    # with Gamma = 0.1 the spectral weight near mu is small but nonzero;
    # traces should agree to ~1e-2 electrons
    assert abs(np.trace(P0 - PT).real) < 2e-2


def test_density_eq_n_fuses_real_and_contour():
    """density_eq_n (one engine dispatch) == density_real_n +
    density_complex_n exactly (weights concatenate linearly)."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu import density as dens

    n = 30
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                           sig1=-0.1j)
    cfg = ExecutionConfig(energy_chunk=8, solver="lu")   # the fused
    # weight-concatenation dispatch is an LU-engine feature; the spectral
    # route serves eq grids as two cheap dispatches instead
    Pr = dens.density_real_n(H, S, g, -30.0, -6.0, 16, T=0, exec_cfg=cfg)
    Pc = dens.density_complex_n(H, S, g, -6.0, 0.0, 32, T=0, exec_cfg=cfg)
    Pf = dens.density_eq_n(H, S, g, -30.0, -6.0, 0.0, N1=32, N2=16, T=0,
                           exec_cfg=cfg)
    assert np.abs(Pf - (Pr + Pc)).max() < 1e-12


def test_density_neq_fused_matches_unfused():
    """density_neq_n (one dispatch) == density_eq_n + density_grid_n."""
    H, S, g = _system()
    kw = dict(N1=24, N2=12, T=300.0, exec_cfg=_lu_cfg())
    mu1, mu2 = 0.3, 0.6
    P_ref = dens.density_eq_n(H, S, g, -6.0, -4.0, mu1, **kw) \
        + dens.density_grid_n(H, S, g, mu1, mu2, ind=-1, N=16, T=300.0,
                              exec_cfg=_lu_cfg())
    P_fused = dens.density_neq_n(H, S, g, -6.0, -4.0, mu1, mu2,
                                 Nnegf=16, **kw)
    np.testing.assert_allclose(P_fused, P_ref, rtol=0, atol=1e-12)


def test_density_neq_fused_sharded():
    H, S, g = _system()
    mu1, mu2 = 0.5, 0.2          # reversed bias sign covered too
    serial = dens.density_neq_n(H, S, g, -6.0, -4.0, mu1, mu2,
                                N1=16, N2=8, Nnegf=16, T=300.0)
    sharded = dens.density_neq_n(H, S, g, -6.0, -4.0, mu1, mu2,
                                 N1=16, N2=8, Nnegf=16, T=300.0,
                                 mesh=energy_mesh())
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-12)


def test_density_neq_fused_dense_fallback():
    """use_lowrank=False path (dense G< kernel) agrees with low-rank to
    the documented ~1e-9 background-Gamma truncation."""
    from gaunegf_tpu.config import ExecutionConfig
    H, S, g = _system()
    lowrank = dens.density_neq_n(H, S, g, -6.0, -4.0, 0.3, 0.5,
                                 N1=16, N2=8, Nnegf=16, T=300.0)
    dense = dens.density_neq_n(H, S, g, -6.0, -4.0, 0.3, 0.5,
                               N1=16, N2=8, Nnegf=16, T=300.0,
                               exec_cfg=ExecutionConfig(use_lowrank=False))
    np.testing.assert_allclose(dense, lowrank, rtol=0, atol=1e-7)


def test_density_eq_split_continuation_matches_plain(rng):
    """Grid-aware continuation (contour lanes ride Newton-Schulz) gives
    the same equilibrium density as the plain fused dispatch."""
    from gaunegf_tpu import density as dens
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy

    N = 32
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(N - 4, N)],
                           sig1=-0.1j)
    kw = dict(Eminf=-40.0, Emin=-4.0, mu=0.3, N1=64, N2=24)
    P0 = dens.density_eq_n(H, S, g, exec_cfg=ExecutionConfig(
        energy_chunk=8, continuation=False), **kw)
    P1 = dens.density_eq_n(H, S, g, exec_cfg=ExecutionConfig(
        energy_chunk=8, continuation="contour"), **kw)
    # the chain polish runs on complex128 too (exact residual): ~1e-9
    np.testing.assert_allclose(P1, P0, rtol=0, atol=1e-8)


def test_density_eq_split_continuation_sharded(rng):
    """The split engine's sharded path (psum over 'e') matches serial."""
    from gaunegf_tpu import density as dens
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.parallel.mesh import energy_mesh

    N = 32
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(N - 4, N)],
                           sig1=-0.1j)
    kw = dict(Eminf=-40.0, Emin=-4.0, mu=0.3, N1=64, N2=24)
    cfg = ExecutionConfig(energy_chunk=4, continuation="contour",
                          solver="lu")
    P0 = dens.density_eq_n(H, S, g, exec_cfg=cfg, **kw)
    P1 = dens.density_eq_n(H, S, g, exec_cfg=cfg, mesh=energy_mesh(), **kw)
    np.testing.assert_allclose(P1, P0, rtol=0, atol=1e-8)


def test_integrate_points_serial_matches_direct():
    from gaunegf_tpu import density as dens

    pts = [np.full((3, 3), float(i)) for i in range(12)]
    out = dens.integrate_points(lambda i: pts[i], 12)
    np.testing.assert_allclose(out, sum(pts))


def test_integrate_points_thread_pool(monkeypatch):
    """The host parallel path (integratePoints parity, reference
    density.py:121-210, thread pool instead of fork -- see PARITY.md):
    forced on via the reference's gating (parallel=True, >=100 points,
    >=32 cores), result identical to serial."""
    from gaunegf_tpu import density as dens

    monkeypatch.setenv("SLURM_CPUS_ON_NODE", "32")
    n = 128

    def point(i):
        return np.full((4, 4), float(i + 1))

    expected = sum(point(i) for i in range(n))
    out = dens.integrate_points(point, n, parallel=True, num_workers=2,
                                chunk_size=16, debug=True)
    np.testing.assert_allclose(out, expected)


def test_integrate_points_pool_fallback(monkeypatch):
    """A pool that cannot be created falls back to serial (reference's
    try/except parity) instead of raising."""
    from gaunegf_tpu import density as dens
    import multiprocessing.pool as mp_pool

    monkeypatch.setenv("SLURM_CPUS_ON_NODE", "32")

    def boom(*a, **k):
        raise OSError("no pool for you")

    monkeypatch.setattr(mp_pool.ThreadPool, "__init__", boom)
    n = 120
    out = dens.integrate_points(lambda i: np.array([float(i)]), n,
                                parallel=True)
    np.testing.assert_allclose(out, [sum(range(n))])
