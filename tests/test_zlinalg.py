"""Tests for the blocked complex LU / inverse kernels (ops/zlinalg.py).

Golden values come from NumPy f64 LAPACK; the blocked kernel must agree to
near machine precision when run in complex128 and to ~1e-5 in complex64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaunegf_tpu.ops import zlinalg as zl


def _random_negf_matrix(rng, n, eta=0.05):
    """A = E*S - H - Sigma: the characteristic NEGF matrix shape."""
    H = rng.standard_normal((n, n))
    H = (H + H.T) / 2
    S = np.eye(n) + 0.05 * rng.standard_normal((n, n))
    S = (S + S.T) / 2
    sig = -1j * eta * np.eye(n)
    E = 0.3
    return E * S - H - sig


@pytest.mark.parametrize("n", [5, 17, 64, 130, 300])
def test_zinv_matches_lapack(rng, n):
    A = _random_negf_matrix(rng, n).astype(np.complex128)
    X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked"))
    X_ref = np.linalg.inv(A)
    assert np.max(np.abs(X - X_ref)) < 1e-9 * np.max(np.abs(X_ref))


@pytest.mark.parametrize("bs", [8, 32, 128])
def test_zinv_block_sizes(rng, bs):
    n = 100
    A = _random_negf_matrix(rng, n).astype(np.complex128)
    X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked", bs=bs))
    assert np.max(np.abs(A @ X - np.eye(n))) < 1e-9


def test_zinv_batched(rng):
    B, n = 6, 40
    A = np.stack([_random_negf_matrix(rng, n) for _ in range(B)])
    X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked"))
    for b in range(B):
        assert np.max(np.abs(A[b] @ X[b] - np.eye(n))) < 1e-9


def test_zsolve_rhs(rng):
    n, k = 48, 7
    A = _random_negf_matrix(rng, n)
    B = rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    X = np.asarray(zl.zsolve(jnp.asarray(A), jnp.asarray(B), method="blocked"))
    assert np.max(np.abs(A @ X - B)) < 1e-9


def test_zinv_needs_pivoting(rng):
    # Leading zero diagonal entry: fails without partial pivoting.
    n = 16
    A = _random_negf_matrix(rng, n)
    A[0, 0] = 0.0
    A[1, 1] = 0.0
    X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked"))
    assert np.max(np.abs(A @ X - np.eye(n))) < 1e-8


def test_zinv_complex64_accuracy(rng):
    n = 128
    A = _random_negf_matrix(rng, n, eta=0.1).astype(np.complex64)
    X = np.asarray(zl.zinv(jnp.asarray(A), method="blocked"))
    X_ref = np.linalg.inv(A.astype(np.complex128))
    rel = np.max(np.abs(X - X_ref)) / np.max(np.abs(X_ref))
    assert rel < 5e-4


def test_zinv_refined_accuracy(rng):
    n = 128
    A64 = _random_negf_matrix(rng, n, eta=0.1)
    A = A64.astype(np.complex64)
    X = np.asarray(zl.zinv_refined(jnp.asarray(A), steps=2, method="blocked"))
    X_ref = np.linalg.inv(A64)
    rel = np.max(np.abs(X - X_ref)) / np.max(np.abs(X_ref))
    assert rel < 5e-6


def test_fractional_matrix_power(rng):
    n = 30
    S = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    S = (S + S.T) / 2
    X = np.asarray(zl.fractional_matrix_power(jnp.asarray(S), -0.5))
    assert np.max(np.abs(X @ S @ X - np.eye(n))) < 1e-8


def test_eig_matches_numpy(rng):
    n = 20
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    w, v = zl.eig(jnp.asarray(A))
    w, v = np.asarray(w), np.asarray(v)
    # eigenvalue sets must agree (order-free)
    w_ref = np.linalg.eigvals(A)
    assert np.max(np.abs(np.sort_complex(w) - np.sort_complex(w_ref))) < 1e-9
    assert np.max(np.abs(A @ v - v * w[None, :])) < 1e-8


def test_matmul_hp(rng):
    n = 64
    a = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    b = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    got = np.asarray(zl.matmul_hp(jnp.asarray(a), jnp.asarray(b)))
    ref = a.astype(np.complex128) @ b.astype(np.complex128)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-6


def test_zinv_dw_high_precision(rng):
    """Double-word inverse: beyond the complex64 representation floor."""
    import jax.numpy as jnp
    from gaunegf_tpu.ops import zlinalg as zl
    n = 96
    A64 = _random_negf_matrix(rng, n, eta=0.1)
    hi = A64.astype(np.complex64)
    lo = (A64 - hi.astype(np.complex128)).astype(np.complex64)
    X_hi, X_lo = zl.zinv_dw(jnp.asarray(hi), jnp.asarray(lo), steps=2,
                            method="blocked")
    X = np.asarray(X_hi).astype(np.complex128) \
        + np.asarray(X_lo).astype(np.complex128)
    X_ref = np.linalg.inv(A64)
    rel = np.max(np.abs(X - X_ref)) / np.max(np.abs(X_ref))
    # floor = f32 accumulation of the residual matmul (~sqrt(K)*eps*scale);
    # an Ozaki-style exact-accumulation residual is the next tier
    assert rel < 3e-6
    # and it must beat the plain complex64 inverse
    X32 = np.asarray(zl.zinv(jnp.asarray(hi), method="blocked"))
    rel32 = np.max(np.abs(X32 - X_ref)) / np.max(np.abs(X_ref))
    assert rel < rel32


def test_high_tier_engine(rng):
    """'high' precision engine: double-word density sums reach ~1e-7."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    n = 64
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(n))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(6), np.arange(n - 6, n)],
                           sig1=-0.1j)
    E = np.linspace(-2, 2, 12)
    w = rng.random(12)
    st = np.asarray(g.sigmaTot(0.0)).astype(np.complex128)
    ref = sum(ww * np.linalg.inv(e * S - H - st) for e, ww in zip(E, w))
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision="high",
                                                energy_chunk=4))
    out = eng.gr_sum(E, w)
    rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    assert rel < 1e-6


def test_matmul_ozaki_error_free(rng):
    """Ozaki-sliced matmul: exact partial products -> ~2^-47 relative
    accuracy, seven orders beyond the plain f32 accumulation floor."""
    for K in (64, 512):
        a = rng.standard_normal((K, K)).astype(np.float32)
        b = rng.standard_normal((K, K)).astype(np.float32)
        # wild row/column scales stress the exponent alignment
        a *= np.exp2(rng.integers(-8, 8, (K, 1))).astype(np.float32)
        b *= np.exp2(rng.integers(-8, 8, (1, K))).astype(np.float32)
        hi, lo = zl.matmul_ozaki_real(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        ref = a.astype(np.float64) @ b.astype(np.float64)
        scale = (np.abs(a).astype(np.float64)
                 @ np.abs(b).astype(np.float64)).max()
        assert np.abs(got - ref).max() / scale < 1e-13


def test_matmul_ozaki_lite(rng):
    """Reduced-slice Ozaki tier: ~eps * 2^(-s*n) relative (~1e-13 at the
    default 3 slices) at ~4x fewer MXU passes than the full-exact tier.

    On CPU this validates the slice-count reduction and the HIGH
    remainder path; the bf16-exactness of DEFAULT slice products is a
    TPU property validated on device (benchmarks/device/e42)."""
    for K in (64, 2000):
        a = rng.standard_normal((128, K)).astype(np.float32)
        b = rng.standard_normal((K, 128)).astype(np.float32)
        a *= np.exp2(rng.integers(-8, 8, (128, 1))).astype(np.float32)
        b *= np.exp2(rng.integers(-8, 8, (1, 128))).astype(np.float32)
        hi, lo = zl.matmul_ozaki_lite(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        ref = a.astype(np.float64) @ b.astype(np.float64)
        scale = (np.abs(a).astype(np.float64)
                 @ np.abs(b).astype(np.float64)).max()
        assert np.abs(got - ref).max() / scale < 5e-12


def test_zmatmul_dw_lite_near_pole_quality(rng):
    """zmatmul_dw(exact='lite') on |D|-scaled operands: the spectral dw
    assembly's requirement is product error * |D| << 1e-6; lite holds
    ~1e-12 relative, i.e. <= 1e-7 after the worst-case 1e5 cancellation."""
    K = 512
    a = (rng.standard_normal((96, K))
         + 1j * rng.standard_normal((96, K))).astype(np.complex128)
    b = (rng.standard_normal((K, 96))
         + 1j * rng.standard_normal((K, 96))).astype(np.complex128)
    a[3] *= 1e5                              # one near-pole row
    b[:, 7] *= 1e5
    a_dw = (a.astype(np.complex64),
            (a - a.astype(np.complex64)).astype(np.complex64))
    b_dw = (b.astype(np.complex64),
            (b - b.astype(np.complex64)).astype(np.complex64))
    hi, lo = zl.zmatmul_dw(tuple(map(jnp.asarray, a_dw)),
                           tuple(map(jnp.asarray, b_dw)), exact="lite")
    got = np.asarray(hi, np.complex128) + np.asarray(lo, np.complex128)
    ref = a @ b
    scale = (np.abs(a) @ np.abs(b)).max()
    assert np.abs(got - ref).max() / scale < 1e-11


def test_zmatmul_exact_complex(rng):
    K = 256
    a = (rng.standard_normal((K, K))
         + 1j * rng.standard_normal((K, K))).astype(np.complex64)
    b = (rng.standard_normal((K, K))
         + 1j * rng.standard_normal((K, K))).astype(np.complex64)
    hi, lo = zl.zmatmul_exact(jnp.asarray(a), jnp.asarray(b))
    got = np.asarray(hi, np.complex128) + np.asarray(lo, np.complex128)
    ref = a.astype(np.complex128) @ b.astype(np.complex128)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-13


def test_zinv_dw_exact_tier(rng):
    """'exact' tier: an Ozaki-residual Newton step removes the double-word
    path's f32-accumulation floor -> ~1e-11 forward error."""
    n = 96
    A64 = _random_negf_matrix(rng, n, eta=0.1)
    hi = A64.astype(np.complex64)
    lo = (A64 - hi.astype(np.complex128)).astype(np.complex64)
    X_hi, X_lo = zl.zinv_dw(jnp.asarray(hi), jnp.asarray(lo), steps=1,
                            exact_steps=1, method="blocked")
    X = np.asarray(X_hi).astype(np.complex128) \
        + np.asarray(X_lo).astype(np.complex128)
    X_ref = np.linalg.inv(A64)
    rel = np.max(np.abs(X - X_ref)) / np.max(np.abs(X_ref))
    assert rel < 1e-10


def test_exact_tier_engine(rng):
    """'exact' precision engine: density sums at f64-class accuracy."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    n = 64
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(n))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(6), np.arange(n - 6, n)],
                           sig1=-0.1j)
    E = np.linspace(-2, 2, 12)
    w = rng.random(12)
    st = np.asarray(g.sigmaTot(0.0)).astype(np.complex128)
    ref = sum(ww * np.linalg.inv(e * S - H - st) for e, ww in zip(E, w))
    eng = EnergyEngine(H, S, g, ExecutionConfig(precision="exact",
                                                energy_chunk=4))
    out = eng.gr_sum(E, w)
    rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    # round 2: the provider's double-word sigma evaluation removed the
    # single-word-Sigma floor -- f64-class density sums from an f32 chip
    assert rel < 1e-12


def test_blocked_solve_under_shard_map(rng, monkeypatch):
    """The blocked kernel must trace under shard_map (vma: constant-seeded
    loop carries vs data-derived outputs).  CPU auto-picks LAPACK, so this
    forces the blocked path -- the combination every TPU mesh run uses."""
    from gaunegf_tpu import transport as tr
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.parallel.mesh import energy_mesh

    monkeypatch.setattr(zl, "supports_lapack_complex", lambda: False)
    n = 48
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    nc = 4
    sig = np.zeros((n, n), complex)
    sig[np.ix_(range(nc), range(nc))] = -0.1j * np.eye(nc)
    sig2 = np.zeros((n, n), complex)
    sig2[np.ix_(range(n - nc, n), range(n - nc, n))] = -0.1j * np.eye(nc)
    mesh = energy_mesh()
    E = np.linspace(-3, 3, 32)
    T = tr.calculate_transmission(H, S, tr.SigmaSource(sig, sig2), E,
                                  mesh=mesh)
    T_ref = tr.calculate_transmission(H, S, tr.SigmaSource(sig, sig2), E)
    assert np.abs(T - T_ref).max() < 1e-8
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                           sig1=-0.1j)
    for panel in ("virtual", "xla"):
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=8, lu_panel=panel), mesh=mesh)
        out = eng.gr_sum(E, np.ones(E.size))
        assert np.isfinite(out).all()

    # surface-GF fixed points (while carries) under the same combination
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    for method in ("sancho", "dyson"):
        gc = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(4, 8)],
                               eta=1e-3, method=method)
        eng = EnergyEngine(H, S, gc, ExecutionConfig(energy_chunk=8),
                           mesh=mesh)
        Tc = eng.transmission(E)
        assert np.isfinite(Tc).all() and Tc.max() > 0.1


@pytest.mark.parametrize("trail", ["high", "bf3", "kar", "kar_high"])
def test_zsolve_trail_budget_modes(rng, trail):
    """Trailing-update budget modes ('high'/'bf3', see _mm_trail) keep the
    blocked solve within the mixed tier's seed quality: the LU FLOP bulk
    runs at ~2^-15 per product, which partial pivoting tolerates and the
    Newton polish absorbs."""
    N, k = 96, 32
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.3 + 0.1j) * np.eye(N)).astype(np.complex64)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(np.complex64)
    X = zl.zsolve(A, B, method="blocked", bs=16, trail=trail)
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-4, err


@pytest.mark.parametrize("trail", ["high", "bf3", "kar", "kar_high"])
def test_zinv_refined_trail_recovers_accuracy(rng, trail):
    """Newton refinement on top of a budget-trail LU seed reaches the
    mixed tier's accuracy floor."""
    N = 80
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.25 + 0.1j) * np.eye(N)).astype(np.complex64)
    X = zl.zinv_refined(A, steps=2, method="blocked", bs=16, trail=trail)
    X_ref = np.linalg.inv(A.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-6, err


def test_zlu_factor_trail_solve(rng):
    N, k = 64, 8
    A = (rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N)))
    A = (A + N * (0.3 + 0.1j) * np.eye(N)).astype(np.complex64)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(np.complex64)
    fac = zl.zlu_factor(A, bs=16, trail="bf3")
    X = zl.zlu_solve(fac, B)
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-4, err


def test_engine_lu_trail_config(rng, monkeypatch):
    """ExecutionConfig.lu_trail threads to the engine's BLOCKED path
    (LAPACK auto-pick disabled, as on TPU): gr_sum with 'bf3' matches the
    default-trail result within the mixed tier tolerance."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    monkeypatch.setattr(zl, "supports_lapack_complex", lambda: False)
    N = 48
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(N - 4, N)],
                           sig1=-0.1j)
    E = np.linspace(-1, 1, 8) + 0.05j
    w = np.ones(8)
    base = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, lu_block=16),
        mesh=None).gr_sum(E, w)
    bf3 = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=4, lu_block=16, lu_trail="bf3"),
        mesh=None).gr_sum(E, w)
    scale = np.abs(base).max()
    assert np.abs(bf3 - base).max() / scale < 1e-5
