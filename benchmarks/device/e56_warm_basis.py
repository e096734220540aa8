"""e56: warm-seeded device basis A/B on the N=2000 SCF cycle.

e55 (round-4 session 5) put the N=2000 spectral cycle at 26.9 s/cycle
(basis='device') vs LU's 24.4, with the per-cycle device-basis dispatch
at 8.7 s warm -- dominated by the f32 XLA eigh (QDWH) that re-runs from
scratch every Fock.  The warm seed (spectral_warm_basis, default on)
replaces the eigh with Ogita-Aishima refinement of the PREVIOUS cycle's
eigenvectors, gated on the separated-pair residual.

Measures, in order:
1. device_basis walls at N=2000: cold (eigh path), warm-accepted
   (SCF-like 1e-2 diagonal step), and the acceptance verdicts;
2. warm-basis eigenvalue accuracy vs the host f64 eigh;
3. rejected-seed fallback (unrelated Fock) correctness;
4. NEGFE biased cycles (e55 fixture) warm vs cold, 3 cycles each.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e56_warm_basis.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    import jax
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops import spectral as sp

    N = 2000
    H, S, g = tb_system(N)

    # 0. tunnel transfer rates at the SCF cycle's working size (16 MB f32):
    # the cycle moves ~64 MB H2D (H_s + H_dw) and ~32 MB D2H (P) per Fock
    buf = np.ones((N, N), np.float32)
    for _ in range(2):
        t0 = time.time()
        dev = jax.device_put(buf)
        dev.block_until_ready()
        h2d = time.time() - t0
        t0 = time.time()
        np.asarray(dev)
        d2h = time.time() - t0
    print(f"RESULT tunnel 16MB: H2D {h2d:.2f}s ({16 / h2d:.1f} MB/s) "
          f"D2H {d2h:.2f}s ({16 / d2h:.1f} MB/s)", flush=True)
    del dev, buf

    # 1. cold vs warm walls
    sp._WARM_X_CACHE.clear()
    t0 = time.time()
    lam0, _, _ = sp.device_basis(H, S, warm=True)
    t1 = time.time()
    log(f"cold first (incl compile): {t1 - t0:.1f}s "
        f"path={sp.device_basis.last_path}")
    H1 = H + 0.01 * np.diag(np.linspace(-1, 1, N))
    t0 = time.time()
    lam1, _, _ = sp.device_basis(H1, S, warm=True)
    t1 = time.time()
    warm1 = t1 - t0
    path1 = sp.device_basis.last_path
    log(f"warm first (incl seeded compile): {warm1:.1f}s path={path1}")
    H2 = H1 + 1e-4 * np.diag(np.linspace(1, -1, N))
    t0 = time.time()
    lam2, _, _ = sp.device_basis(H2, S, warm=True)
    t1 = time.time()
    print(f"RESULT warm device_basis N=2000: {t1 - t0:.1f}s "
          f"path={sp.device_basis.last_path} (first-warm {warm1:.1f}s "
          f"path={path1})", flush=True)
    sp._WARM_X_CACHE.clear()
    t0 = time.time()
    lam2c, _, _ = sp.device_basis(H2, S, warm=True)
    t1 = time.time()
    print(f"RESULT cold device_basis N=2000: {t1 - t0:.1f}s "
          f"path={sp.device_basis.last_path}", flush=True)

    # 2. accuracy vs host f64
    truth = np.linalg.eigvalsh(H2)
    scale = np.abs(truth).max()
    print(f"RESULT warm lam err: {np.abs(lam2 - truth).max() / scale:.2e} "
          f"cold lam err: {np.abs(lam2c - truth).max() / scale:.2e}",
          flush=True)

    # 3. rejected-seed fallback
    rng = np.random.default_rng(9)
    B = rng.standard_normal((N, N))
    A2 = 0.5 * (B + B.T)
    sp._WARM_X_CACHE.clear()
    sp.device_basis(H2, S, warm=True)
    t0 = time.time()
    lam_r, _, _ = sp.device_basis(A2, S, warm=True)
    t1 = time.time()
    err_r = np.abs(lam_r - np.linalg.eigvalsh(A2)).max() / \
        max(np.abs(lam_r).max(), 1e-30)
    print(f"RESULT rejected-seed: {t1 - t0:.1f}s "
          f"path={sp.device_basis.last_path} lam err {err_r:.2e}",
          flush=True)
    sp._WARM_X_CACHE.clear()

    # 4. NEGFE biased cycles warm vs cold
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.scfe import NEGFE

    def cycles(warm_flag, n_cyc=3):
        sp._WARM_X_CACHE.clear()
        H0 = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
        backend = TightBindingFock(H0, n_electrons=N, U=0.2,
                                   n0=0.5 * np.ones(N))
        negfe = NEGFE(backend, name=f"/tmp/e56_{warm_flag}", verbose=False,
                      exec_cfg=ExecutionConfig(
                          precision="mixed", energy_chunk=16,
                          solver="spectral", spectral_basis="device",
                          spectral_warm_basis=warm_flag))
        negfe.setSigma([1, 2], [N - 1, N], sig=-0.1j, T=0)
        negfe.setIntegralLimits(N1=100, N2=50)
        negfe.setVoltage(0.2, fermi=0.0)
        t0 = time.time()
        negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
        log(f"warm={warm_flag}: warm-up cycle {time.time() - t0:.1f}s")
        ts = []
        for c in range(n_cyc):
            t0 = time.time()
            negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
            dt = time.time() - t0
            ts.append(dt)
            log(f"warm={warm_flag}: cycle {c + 1}/{n_cyc} {dt:.2f}s "
                f"basis_path={sp.device_basis.last_path}")
        return float(np.median(ts))

    for warm_flag in (True, False):
        t = cycles(warm_flag)
        print(f"RESULT N=2000 spectral cycle, warm_basis={warm_flag}: "
              f"{t:.2f} s/cycle", flush=True)


if __name__ == "__main__":
    main()
