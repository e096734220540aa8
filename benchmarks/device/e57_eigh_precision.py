"""e57: the TPU f32 eigh runs bf16 matmuls internally -- fix + truth probe.

e56 measured the COLD device basis's eigenvalue error at N=2000 as
4.37e-4 relative (S=I, vs host f64 eigvalsh) -- three orders worse than
a backward-stable f32 eigh (~eps32 = 6e-8 relative).  Hypothesis: XLA's
TPU eigh (QDWH) runs its internal matmuls at DEFAULT precision =
one-pass bf16 (backend fact #6; e45 measured bare-@ DEFAULT at 3.8e-3),
and the Ogita-Aishima refinement cannot repair sub-cluster_tol pairs
(they get the R/2 update, never a rotation).  device_basis now wraps
the eigh in jax.default_matmul_precision('highest').

Measures at N=2000 (bench junction fixture, S=I):
1. raw jitted f32 eigh lam err + wall, DEFAULT vs HIGHEST matmul default;
2. device_basis (with the fix) lam err + wall;
3. end-to-end: 32-pt bench-grid gr_sum, spectral basis=device vs x64
   NumPy truth, against basis=host on the same grid (the N=2000
   device-basis truth row that e41/e53 only established at N=1000 or
   for the host basis).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e57_eigh_precision.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    import jax
    import jax.numpy as jnp
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.complexio import call_complex_safe
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.ops import spectral as sp

    N = 2000
    H, S, g = tb_system(N)
    truth_lam = np.linalg.eigvalsh(H)
    scale = np.abs(truth_lam).max()
    H32 = H.astype(np.float32)

    # 1. raw f32 eigh, DEFAULT vs HIGHEST internal matmuls
    @jax.jit
    def eigh_default(A):
        return jnp.linalg.eigh(A)

    @jax.jit
    def eigh_highest(A):
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.eigh(A)

    for name, fn in (("DEFAULT", eigh_default), ("HIGHEST", eigh_highest)):
        lam, X = fn(H32)
        lam = np.asarray(lam, np.float64)   # forces sync
        t0 = time.time()
        lam, X = fn(H32)
        lam = np.asarray(lam, np.float64)
        wall = time.time() - t0
        r = np.asarray(X, np.float64)
        resid = np.abs(H @ r - r * lam[None, :]).max()
        print(f"RESULT raw eigh {name}: wall {wall:.2f}s "
              f"lam err {np.abs(np.sort(lam) - truth_lam).max() / scale:.2e} "
              f"resid {resid / scale:.2e}", flush=True)

    # 2. device_basis with the fix
    t0 = time.time()
    lam64, _, _ = sp.device_basis(H, S)
    t1 = time.time()
    log(f"device_basis first (incl compile): {t1 - t0:.1f}s")
    t0 = time.time()
    lam64, _, _ = sp.device_basis(H, S)
    t1 = time.time()
    print(f"RESULT device_basis N=2000: wall {t1 - t0:.2f}s "
          f"lam err {np.abs(lam64 - truth_lam).max() / scale:.2e}",
          flush=True)

    # 3. end-to-end truth on the bench grid
    E = np.linspace(-2.0, 2.0, 32)
    w = np.ones(32)
    fn_sig, params = g.total_apply()
    t0 = time.time()
    truth = np.zeros((N, N), np.complex128)
    for e in E:
        sig = np.asarray(call_complex_safe(fn_sig, params, complex(e)),
                         np.complex128)
        truth += np.linalg.inv(e * S.astype(np.complex128)
                               - H.astype(np.complex128) - sig)
    log(f"x64 truth done ({time.time() - t0:.0f}s)")
    tscale = np.abs(truth).max()

    for basis in ("device", "host"):
        cfg = ExecutionConfig(precision="mixed", energy_chunk=16,
                              solver="spectral", spectral_basis=basis)
        eng = EnergyEngine(H, S, g, cfg)
        r = eng._spectral_runner()
        assert r is not None
        out = eng.gr_sum(E, w)
        err = np.abs(np.asarray(out) - truth).max() / tscale
        t0 = time.time()
        out = eng.gr_sum(E, w)
        np.asarray(out)
        wall = time.time() - t0
        print(f"RESULT gr_sum N=2000 basis={basis}: err {err:.2e} "
              f"warm wall {wall:.1f}s ({32 / wall:.1f} pts/s)", flush=True)


if __name__ == "__main__":
    main()
