"""e55: decompose the N=2000 spectral SCF cycle (e33: 44.8 s vs LU 24.4).

e33 (round-4 session 5) measured the biased NEGFE cycle at N=2000:
LU 24.4 s/cycle steady; spectral 44.8/79.0/34.2 s -- slower AND noisy,
while the bench measures the spectral gr_sum at 94 pts/s (so the ~200
grid points should cost ~2-3 s).  Suspects: the per-Fock device-basis
dispatch (XLA f32 eigh at N=2000), per-cycle union-Ritz recompiles
(union size changes with the Fock -> new (u,)-shaped kernels), engine
rebuild overheads (H upload, structure probes), or the host eigh being
simply cheaper at this size (gvd 2.9 s / evd 1.2 s measured round 4).

Measures, in order:
1. device_basis wall at N=2000: first (compile) and second (fresh H
   values, same shapes) calls;
2. SpectralRunner construction with basis='host' (LAPACK evd) for the
   same pencil;
3. _defl_basis wall on two DISJOINT unions (fresh compile vs same-bucket
   reuse) at N=2000;
4. NEGFE biased cycles (e33 fixture) for spectral_basis='host' AND
   'device', 3 cycles each -- steady-state comparison vs e33's numbers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e55_scf2000_anatomy.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops import spectral as sp
    from gaunegf_tpu.ops.greens import EnergyEngine

    N = 2000
    H, S, g = tb_system(N)

    # 1. device basis dispatch
    t0 = time.time()
    out = sp.device_basis(H, S)
    t1 = time.time()
    H2 = H + 0.01 * np.diag(np.linspace(-1, 1, N))
    t2 = time.time()
    out2 = sp.device_basis(H2, S)
    t3 = time.time()
    print(f"RESULT device_basis N=2000: first {t1 - t0:.1f}s "
          f"(incl compile), warm {t3 - t2:.1f}s", flush=True)
    del out, out2

    # 2. host basis (evd driver: S = I here)
    t0 = time.time()
    b = sp.spectral_basis(H2, S)
    t1 = time.time()
    assert b is not None
    print(f"RESULT host eigh N=2000 (evd): {t1 - t0:.1f}s", flush=True)

    # 3. union-Ritz cost on disjoint unions
    cfg = ExecutionConfig(precision="mixed", energy_chunk=16,
                          solver="spectral", spectral_basis="device")
    eng = EnergyEngine(H, S, g, cfg)
    r = eng._spectral_runner()
    assert r is not None and r._basis_is_device
    lam = r.lam64
    idx_a = r._near_idx(np.array([lam[600] + 1e-6, lam[610]]), 8)
    idx_b = r._near_idx(np.array([lam[1200] + 1e-6, lam[1300]]), 8)
    t0 = time.time()
    r._defl_basis(idx_a)
    t1 = time.time()
    r._ritz_cache.clear()
    t2 = time.time()
    r._defl_basis(idx_b)          # same bucket size (likely): reuse jit
    t3 = time.time()
    print(f"RESULT ritz N=2000: first {t1 - t0:.1f}s, "
          f"disjoint-union repeat {t3 - t2:.1f}s", flush=True)

    # 4. NEGFE biased cycles by basis mode
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.scfe import NEGFE

    def cycles(basis, n_cyc=3):
        H0 = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
        backend = TightBindingFock(H0, n_electrons=N, U=0.2,
                                   n0=0.5 * np.ones(N))
        negfe = NEGFE(backend, name=f"/tmp/e55_{basis}", verbose=False,
                      exec_cfg=ExecutionConfig(
                          precision="mixed", energy_chunk=16,
                          solver="spectral", spectral_basis=basis))
        negfe.setSigma([1, 2], [N - 1, N], sig=-0.1j, T=0)
        negfe.setIntegralLimits(N1=100, N2=50)
        negfe.setVoltage(0.2, fermi=0.0)
        t0 = time.time()
        negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
        log(f"basis={basis}: warm cycle {time.time() - t0:.1f}s")
        ts = []
        for c in range(n_cyc):
            t0 = time.time()
            negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
            dt = time.time() - t0
            ts.append(dt)
            log(f"basis={basis}: cycle {c + 1}/{n_cyc} {dt:.2f}s")
        return float(np.median(ts))

    for basis in ("host", "device"):
        t = cycles(basis)
        print(f"RESULT N=2000 spectral cycle, basis={basis}: "
              f"{t:.2f} s/cycle", flush=True)


if __name__ == "__main__":
    main()
