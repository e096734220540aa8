"""e62: N=2000 biased NEGFE SCF cycle, round-5 configuration (clean walls).

VERDICT r4 item 8: push the N=2000 cycle below 4 s.  Round-4 session 7
measured 4.71 s/cycle with the HOST spectral basis, ~1.5 s of which was
the per-Fock host f64 eigh; the round-5 device-basis flip (e60) removes
it from the critical path.  Three arms, 3 timed cycles each (median),
one warm cycle discarded per arm:

1. spectral, default config ('auto' basis -> device on TPU, cold per Fock);
2. spectral + spectral_warm_basis=True (previous-Fock seeded refinement);
3. LU ('lu', mixed) -- the e33 reference arm.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e62_scf2000_cycle.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.scfe import NEGFE

    N = 2000
    H0 = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))

    def arm(name, cfg):
        backend = TightBindingFock(H0, n_electrons=N, U=0.2,
                                   n0=0.5 * np.ones(N))
        negfe = NEGFE(backend, name=f"/tmp/e62_{name}", verbose=False,
                      exec_cfg=cfg)
        negfe.setSigma([1, 2], [N - 1, N], sig=-0.1j, T=0)
        negfe.setIntegralLimits(N1=100, N2=50)
        negfe.setVoltage(0.2, fermi=0.0)
        t0 = time.time()
        negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
        log(f"{name}: warm cycle {time.time() - t0:.1f}s")
        ts = []
        for c in range(3):
            t0 = time.time()
            negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
            dt = time.time() - t0
            ts.append(dt)
            log(f"{name}: cycle {c + 1}/3 {dt:.2f}s")
        print(f"RESULT N=2000 cycle, {name}: "
              f"{float(np.median(ts)):.2f} s/cycle", flush=True)

    arm("spectral_default", ExecutionConfig(
        precision="mixed", energy_chunk=16, solver="spectral"))
    arm("spectral_warm", ExecutionConfig(
        precision="mixed", energy_chunk=16, solver="spectral",
        spectral_warm_basis=True))
    arm("lu", ExecutionConfig(
        precision="mixed", energy_chunk=16, solver="lu",
        near_pole_warn=False))


if __name__ == "__main__":
    main()
