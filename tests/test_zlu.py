"""zlu_factor / zlu_solve: reusable blocked-LU factors (round-3 op-count
lever -- the mixed low-rank path previously factorized twice per energy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gaunegf_tpu.ops import zlinalg as zl


def _rand_system(rng, N, k, dtype=np.complex64):
    A = rng.standard_normal((N, N)) + 1j * rng.standard_normal((N, N))
    A = (A + N * (0.3 + 0.1j) * np.eye(N)).astype(dtype)
    B = (rng.standard_normal((N, k))
         + 1j * rng.standard_normal((N, k))).astype(dtype)
    return A, B


@pytest.mark.parametrize("N,bs", [(64, 16), (100, 16), (96, 32)])
def test_zlu_factor_solve_matches_lapack(rng, N, bs):
    A, B = _rand_system(rng, N, 24)
    factors = zl.zlu_factor(jnp.asarray(A), bs=bs)
    X = np.asarray(zl.zlu_solve(factors, jnp.asarray(B)))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err = np.abs(X - X_ref).max() / np.abs(X_ref).max()
    assert err < 5e-6, err


def test_zlu_factor_reuse_for_refinement(rng):
    """One factorization serves the base solve AND the residual solve."""
    N = 80
    A, B = _rand_system(rng, N, 8)
    factors = zl.zlu_factor(jnp.asarray(A), bs=16)
    X = zl.zlu_solve(factors, jnp.asarray(B))
    R = jnp.asarray(B) - zl.matmul_hp(jnp.asarray(A), X)
    X2 = np.asarray(X + zl.zlu_solve(factors, R))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    err0 = np.abs(np.asarray(X) - X_ref).max() / np.abs(X_ref).max()
    err1 = np.abs(X2 - X_ref).max() / np.abs(X_ref).max()
    assert err1 < err0 or err1 < 1e-6, (err0, err1)


def test_zlu_batched(rng):
    Nb, N, k = 3, 48, 8
    A = np.stack([_rand_system(rng, N, k)[0] for _ in range(Nb)])
    B = np.stack([_rand_system(rng, N, k)[1] for _ in range(Nb)])
    factors = zl.zlu_factor(jnp.asarray(A), bs=16)
    X = np.asarray(zl.zlu_solve(factors, jnp.asarray(B)))
    for i in range(Nb):
        X_ref = np.linalg.solve(A[i].astype(np.complex128),
                                B[i].astype(np.complex128))
        assert np.abs(X[i] - X_ref).max() / np.abs(X_ref).max() < 5e-6


def test_gr_cols_blocked_matches_lapack(rng):
    """The engine's low-rank column solve on the blocked (TPU-shaped)
    path agrees with the LAPACK branch."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import _gr_cols
    import gaunegf_tpu.ops.zlinalg as zlmod

    N = 64
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    S = np.eye(N)
    sigma = np.zeros((N, N), complex)
    sigma[:4, :4] = -0.1j * np.eye(4)
    cols = tuple(range(4))
    cfg = ExecutionConfig(precision="mixed", lu_block=16)
    E = jnp.asarray(0.3 + 0.05j, jnp.complex64)
    args = (E, jnp.asarray(H, jnp.complex64), jnp.asarray(S, jnp.complex64),
            jnp.asarray(sigma, jnp.complex64), cols, cfg)
    X_lapack = np.asarray(_gr_cols(*args))
    orig = zlmod.supports_lapack_complex
    zlmod.supports_lapack_complex = lambda: False
    try:
        X_blocked = np.asarray(_gr_cols(*args))
    finally:
        zlmod.supports_lapack_complex = orig
    assert np.abs(X_blocked - X_lapack).max() < 1e-5


def test_scan_panel_matches_virtual(rng):
    """'scan' panel (one lax.scan body; the compile-time fix) produces the
    exact partial-pivot sequence and f32-class values."""
    for m, bs in [(96, 32), (200, 64)]:
        A = (rng.standard_normal((m, bs))
             + 1j * rng.standard_normal((m, bs))).astype(np.complex64)
        pv, permv = zl._factor_panel_virtual(jnp.asarray(A))
        ps, perms = zl._factor_panel_scan(jnp.asarray(A))
        assert (np.asarray(permv) == np.asarray(perms)).all(), (m, bs)
        assert np.abs(np.asarray(pv) - np.asarray(ps)).max() < 1e-3


def test_scan_panel_full_solve(rng):
    N = 192
    A, B = _rand_system(rng, N, 16)
    X = np.asarray(zl.zsolve(jnp.asarray(A), jnp.asarray(B),
                             method="blocked", bs=64, panel_impl="scan"))
    X_ref = np.linalg.solve(A.astype(np.complex128),
                            B.astype(np.complex128))
    assert np.abs(X - X_ref).max() / np.abs(X_ref).max() < 5e-6
