"""e33: production NEGFE SCF cycle wall-clock at N=1000 (VERDICT r3 #4).

Times FockToP + PMix + PToFock (the fused biased density dispatch) for
the mixed tier at N=1000, both solver families.  BASELINE.json's second
metric ("SCF wall-clock to 1e-5 density") at production size.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e33_scf_cycle.py [N]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep


def cycle_time(N, solver, cycles=3):
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.scfe import NEGFE

    H0 = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    backend = TightBindingFock(H0, n_electrons=N, U=0.2,
                               n0=0.5 * np.ones(N))
    chunk = 64 if N <= 1300 else 16
    negfe = NEGFE(backend, name=f"/tmp/e33_{N}_{solver}", verbose=False,
                  exec_cfg=ExecutionConfig(precision="mixed",
                                           energy_chunk=chunk,
                                           solver=solver))
    negfe.setSigma([1, 2], [N - 1, N], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=100, N2=50)
    negfe.setVoltage(0.2, fermi=0.0)     # biased: includes the G< window

    log(f"N={N} solver={solver}: warm cycle (compiles)")
    t0 = time.time()
    negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
    log(f"N={N} {solver}: warm cycle {time.time() - t0:.1f}s")

    times = []
    for c in range(cycles):
        t0 = time.time()
        negfe.FockToP()
        negfe.PMix(0.02)
        negfe.PToFock()
        dt = time.time() - t0
        times.append(dt)
        log(f"N={N} {solver}: cycle {c + 1}/{cycles} {dt:.2f}s")
    return float(np.median(times))


def main():
    prep()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = {}
    for solver in ("lu", "spectral"):
        try:
            out[solver] = cycle_time(N, solver)
        except Exception as e:
            log(f"solver={solver} failed: {e!r}")
    for solver, t in out.items():
        print(f"RESULT N={N} solver={solver}: {t:.2f} s/cycle", flush=True)


if __name__ == "__main__":
    main()
