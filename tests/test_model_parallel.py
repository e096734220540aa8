"""Model ('m') axis column sharding: sharded == serial on an ('e','m') mesh.

SURVEY.md section 2.2 model-parallel row: the orbital dimension of the
solve distributes by column-sharding the identity RHS
(zlinalg.zinv_refined_cols); the LU factorization stays replicated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map

from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
from gaunegf_tpu.ops.greens import EnergyEngine
from gaunegf_tpu.parallel.mesh import energy_mesh, MODEL_AXIS, ENERGY_AXIS


def _transmission_truth(H, S, g, E):
    """x64 dense NumPy T(E) = Tr[G1 Gr G2 Ga] (contacts 0 and -1)."""
    out = []
    for e in np.asarray(E, dtype=np.complex128):
        s1 = np.asarray(g.sigma(e, 0), dtype=np.complex128)
        s2 = np.asarray(g.sigma(e, -1), dtype=np.complex128)
        st = np.asarray(g.sigmaTot(e), dtype=np.complex128)
        Gr = np.linalg.inv(e * S - H - st)
        G1 = 1j * (s1 - s1.conj().T)
        G2 = 1j * (s2 - s2.conj().T)
        out.append(np.trace(G1 @ Gr @ G2 @ Gr.conj().T).real)
    return np.asarray(out)


def _system(N, rng):
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(N - 4, N)],
                           sig1=-0.1j)
    return H, S, g


@pytest.mark.parametrize("m", [2, 4])
def test_gr_sum_model_sharded_matches_serial(rng, m):
    N = 64
    H, S, g = _system(N, rng)
    E = np.linspace(-2, 2, 16) + 0.05j
    w = rng.standard_normal(16)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4, solver="lu")

    serial = EnergyEngine(H, S, g, cfg, mesh=None).gr_sum(E, w)
    mesh = energy_mesh(model_parallel=m)
    assert mesh.shape[MODEL_AXIS] == m and mesh.shape[ENERGY_AXIS] == 8 // m
    sharded = EnergyEngine(H, S, g, cfg, mesh=mesh).gr_sum(E, w)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


def test_gr_sum_model_sharded_blocked_kernel(rng):
    """The combination real TPU meshes execute: blocked LU + ('e','m')."""
    N = 48
    H, S, g = _system(N, rng)
    E = np.linspace(-1, 1, 8) + 0.1j
    w = np.ones(8)
    cfg = ExecutionConfig(precision="fast", energy_chunk=4, lu_block=16,
                          solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).gr_sum(E, w)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).gr_sum(E, w)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-8)


def test_gr_sum_model_sharded_im_epilog(rng):
    N = 32
    H, S, g = _system(N, rng)
    E = np.linspace(-1, 1, 8) + 0.05j
    w = np.ones(8)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4, solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).gr_sum(E, w, epilog="im")
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).gr_sum(
                               E, w, epilog="im")
    assert sharded.dtype.kind == "f"
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


def test_model_shards_fallback_when_indivisible(rng):
    """N not divisible by m: the engine must fall back to replicated."""
    N = 33
    H, S, g = _system(N, rng)
    eng = EnergyEngine(H, S, g, ExecutionConfig(solver="lu"),
                       mesh=energy_mesh(model_parallel=2))
    assert eng._model_shards() == 1
    E = np.linspace(-1, 1, 8) + 0.05j
    out = eng.gr_sum(E, np.ones(8))
    serial = EnergyEngine(H, S, g, ExecutionConfig(solver="lu"),
                          mesh=None).gr_sum(
        E, np.ones(8))
    np.testing.assert_allclose(out, serial, rtol=0, atol=1e-9)


def test_zinv_refined_cols_direct(rng):
    """Column-sharded inverse == full inverse, blocked kernel, f32."""
    from jax.sharding import PartitionSpec as P
    from gaunegf_tpu.ops import zlinalg as zl

    N, m = 64, 4
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.3 + 0.1j) * np.eye(N)).astype(np.complex64)
    mesh = energy_mesh(model_parallel=m)

    def body(A):
        return zl.zinv_refined_cols(A, m, steps=1, bs=16)

    X = shard_map(body, mesh=mesh, in_specs=P(),
                  out_specs=P(None, MODEL_AXIS))(jnp.asarray(A))
    X_ref = np.linalg.inv(A.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-6, err


@pytest.mark.parametrize("m,trail", [(2, "hi"), (4, "hi"), (2, "bf3"),
                                     (2, "kar")])
def test_zsolve_dist_matches_serial(rng, m, trail):
    """Distributed-LU solve (panel-cyclic columns, one broadcast per
    panel) == LAPACK, on the CPU mesh; the lu_trail budget applies on the
    sharded path too (same knob semantics as the serial zsolve)."""
    from jax.sharding import PartitionSpec as P
    from gaunegf_tpu.ops import zlinalg as zl

    N, bs, k = 128, 16, 64
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.2 + 0.1j) * np.eye(N)).astype(np.complex64)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(np.complex64)
    mesh = energy_mesh(model_parallel=m)
    X = shard_map(lambda A, B: zl.zsolve_dist(A, B, m, bs=bs, trail=trail),
                  mesh=mesh,
                  in_specs=(P(), P(None, MODEL_AXIS)),
                  out_specs=P(None, MODEL_AXIS))(jnp.asarray(A),
                                                 jnp.asarray(B))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < (5e-6 if trail == "hi" else 5e-5), err


@pytest.mark.parametrize("lowrank", [True, False])
def test_gless_sum_model_sharded_matches_serial(rng, lowrank):
    """G< window divides over 'm' (low-rank contact columns and the full
    Gr Gamma Ga product path)."""
    N = 64
    H, S, g = _system(N, rng)
    E = np.linspace(-0.5, 0.5, 8) + 0.05j
    w = rng.standard_normal(8)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4,
                          use_lowrank=lowrank, solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).gless_sum(E, w, contact=0)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).gless_sum(
                               E, w, contact=0)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


def test_gless_sum_model_sharded_uneven_contact(rng):
    """Contact size not divisible by m: the padded-RHS path."""
    N = 48
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(5), np.arange(N - 5, N)],
                           sig1=-0.1j)
    E = np.linspace(-0.5, 0.5, 8) + 0.05j
    w = np.ones(8)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4, solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).gless_sum(E, w, contact=0)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=4)).gless_sum(
                               E, w, contact=0)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


@pytest.mark.parametrize("lowrank", [True, False])
def test_transmission_model_sharded_matches_serial(rng, lowrank):
    """atol 1e-7, not 1e-9: the m-sharded solve column-blocks the
    refinement matmuls, which round differently from the serial full-width
    ones (~1e-8 observed with the Neumann tri-inverses) -- far below the
    mixed tier's ~2e-6 accuracy floor, which the truth check pins."""
    N = 64
    H, S, g = _system(N, rng)
    E = np.linspace(-2, 2, 16)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4,
                          use_lowrank=lowrank, warm_start=False, solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).transmission(E)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).transmission(E)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-7)
    np.testing.assert_allclose(sharded, _transmission_truth(H, S, g, E),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize("precision,atol", [("high", 5e-7), ("exact", 1e-9)])
def test_gr_sum_dw_model_sharded_matches_serial(rng, precision, atol):
    """The double-word tiers shard the gr path over 'm'
    (zlinalg.zinv_dw_cols).  The 'exact' tier agrees with the serial dw
    engine to ~1e-10 (both converge to the true inverse); 'high' can only
    agree at its own accuracy floor (~1e-7: column-blocked residual
    matmuls round differently than full ones), so both are also checked
    against x64 ground truth at tier tolerance."""
    N = 32
    H, S, g = _system(N, rng)
    E = np.linspace(-1, 1, 8) + 0.05j
    w = rng.standard_normal(8)
    cfg = ExecutionConfig(precision=precision, energy_chunk=4)
    serial = EnergyEngine(H, S, g, cfg, mesh=None).gr_sum(E, w)
    eng = EnergyEngine(H, S, g, cfg, mesh=energy_mesh(model_parallel=2))
    assert eng._model_shards(dw_ok=True) == 2
    sharded = eng.gr_sum(E, w)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=atol)
    sig = g.sigmaTot(0.0)
    truth = sum(ww * np.linalg.inv(e * S - H - np.asarray(sig))
                for e, ww in zip(E, w))
    np.testing.assert_allclose(sharded, truth, rtol=0, atol=5e-7)


def test_density_neq_model_sharded_matches_serial(rng):
    """The fused biased-SCF dispatch has an ('e', 'm') sibling."""
    N = 64
    H, S, g = _system(N, rng)
    Eq = np.linspace(-3, -1, 8) + 0.1j
    wq = rng.standard_normal(8)
    En = np.linspace(-0.2, 0.2, 8) + 1e-3j
    wn = rng.standard_normal(8)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4, solver="lu")
    serial = EnergyEngine(H, S, g, cfg, mesh=None).density_neq_sum(
        Eq, wq, En, wn, contact=0)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).density_neq_sum(
                               Eq, wq, En, wn, contact=0)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


def test_gr_sum_distributed_lu_matches_serial(rng):
    """End-to-end: the mp engine with distribute_lu=True == serial."""
    N = 64
    H, S, g = _system(N, rng)
    E = np.linspace(-2, 2, 8) + 0.05j
    w = np.ones(8)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4, lu_block=16,
                          distribute_lu=True, solver="lu")
    serial = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, lu_block=16,
        solver="lu"), mesh=None).gr_sum(E, w)
    sharded = EnergyEngine(H, S, g, cfg,
                           mesh=energy_mesh(model_parallel=2)).gr_sum(E, w)
    np.testing.assert_allclose(sharded, serial, rtol=0, atol=1e-9)


def test_zsolve_dist_pads_uneven_sizes(rng):
    """N not divisible by bs*m: zsolve_dist pads internally (ADVICE r2;
    distribute_lu usable at any N without tuning lu_block)."""
    from jax.sharding import PartitionSpec as P
    from gaunegf_tpu.ops import zlinalg as zl

    N, bs, k, m = 100, 16, 32, 2
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.2 + 0.1j) * np.eye(N)).astype(np.complex64)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(np.complex64)
    mesh = energy_mesh(model_parallel=m)
    X = shard_map(lambda A, B: zl.zsolve_dist(A, B, m, bs=bs), mesh=mesh,
                  in_specs=(P(), P(None, MODEL_AXIS)),
                  out_specs=P(None, MODEL_AXIS))(jnp.asarray(A),
                                                 jnp.asarray(B))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-6, err


@pytest.mark.skipif(not __import__("os").environ.get("GAUNEGF_SCALE_TESTS"),
                    reason="N=2048 panel-cyclic solve compiles ~9 min on "
                           "CPU; set GAUNEGF_SCALE_TESTS=1 to run "
                           "(verified round 3: rel err 6.7e-7, BASELINE.md)")
def test_zsolve_dist_scale_n2048(rng):
    """Panel-cyclic distributed LU at the scale the flag targets."""
    from jax.sharding import PartitionSpec as P
    from gaunegf_tpu.ops import zlinalg as zl

    N, bs, k, m = 2048, 256, 32, 2
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.2 + 0.1j) * np.eye(N)).astype(np.complex64)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(np.complex64)
    mesh = energy_mesh(model_parallel=m)
    X = shard_map(lambda A, B: zl.zsolve_dist(A, B, m, bs=bs), mesh=mesh,
                  in_specs=(P(), P(None, MODEL_AXIS)),
                  out_specs=P(None, MODEL_AXIS))(jnp.asarray(A),
                                                 jnp.asarray(B))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-6, err
