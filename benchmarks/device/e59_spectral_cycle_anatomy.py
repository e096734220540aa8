"""e59: phase-timing of the N=2000 HOST-basis spectral SCF cycle.

e33 (round-4 session 7) measured the biased NEGFE cycle at N=2000 with
the recalled default (spectral_basis='host'): spectral 9.20 s/cycle vs
LU 8.05 -- yet the bench clocks the spectral gr_sum at ~72 pts/s, so the
cycle's ~250 grid points should cost ~3.5 s.  This script monkeypatches
wall timers around the suspected per-cycle costs:

  - sp.spectral_basis      (host f64 evd eigh per new Fock)
  - SpectralRunner.__init__ (structure probes + basis split + upload)
  - density_neq_sum        (the fused dispatch incl. partition host work)
  - runner partition hosts (_dists/_near_idx)

and reports the residual (cycle - sum of phases) = Pulay/Fock/engine
machinery.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
     python benchmarks/device/e59_spectral_cycle_anatomy.py [N]
"""

import sys
import time
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep

ACC = defaultdict(float)


def _wrap(obj, name, key):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t0 = time.time()
        out = orig(*a, **k)
        ACC[key] += time.time() - t0
        return out

    setattr(obj, name, timed)
    return orig


def main():
    prep()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from gaunegf_tpu import density as dens
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.ops import spectral as sp
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.scfe import NEGFE

    _wrap(sp, "spectral_basis", "host_eigh")
    _wrap(sp.SpectralRunner, "__init__", "runner_init")
    _wrap(sp.SpectralRunner, "_dists", "partition_dists")
    _wrap(sp.SpectralRunner, "_near_idx", "partition_near_idx")
    _wrap(EnergyEngine, "__init__", "engine_init")
    _wrap(EnergyEngine, "density_neq_sum", "density_dispatch")
    _wrap(dens, "density_neq_n", "density_neq_n_total")

    H0 = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1))
    backend = TightBindingFock(H0, n_electrons=N, U=0.2,
                               n0=0.5 * np.ones(N))
    chunk = 64 if N <= 1300 else 16
    negfe = NEGFE(backend, name=f"/tmp/e59_{N}", verbose=False,
                  exec_cfg=ExecutionConfig(precision="mixed",
                                           energy_chunk=chunk,
                                           solver="spectral",
                                           spectral_basis="host"))
    negfe.setSigma([1, 2], [N - 1, N], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=100, N2=50)
    negfe.setVoltage(0.2, fermi=0.0)

    t0 = time.time()
    negfe.FockToP(); negfe.PMix(0.02); negfe.PToFock()
    log(f"N={N}: warm cycle {time.time() - t0:.1f}s (compiles)")

    for c in range(3):
        for k in list(ACC):
            ACC[k] = 0.0
        t0 = time.time()
        negfe.FockToP()
        t_fock_to_p = time.time() - t0
        t1 = time.time()
        negfe.PMix(0.02)
        t_pmix = time.time() - t1
        t2 = time.time()
        negfe.PToFock()
        t_ptofock = time.time() - t2
        total = time.time() - t0
        # nested keys: runner_init includes host_eigh + upload;
        # density_neq_n_total includes engine_init + dispatch
        inner = (ACC["density_neq_n_total"] + t_pmix + t_ptofock)
        print(f"RESULT cycle {c + 1}: total {total:.2f}s | "
              f"FockToP {t_fock_to_p:.2f} "
              f"(density_neq_n {ACC['density_neq_n_total']:.2f}: "
              f"engine_init {ACC['engine_init']:.2f} "
              f"[runner_init {ACC['runner_init']:.2f}, "
              f"host_eigh {ACC['host_eigh']:.2f}], "
              f"dispatch {ACC['density_dispatch']:.2f} "
              f"[dists {ACC['partition_dists']:.3f}, "
              f"near_idx {ACC['partition_near_idx']:.3f}]) | "
              f"PMix {t_pmix:.2f} | PToFock {t_ptofock:.2f} | "
              f"other {total - inner - (t_fock_to_p - ACC['density_neq_n_total']):.2f}",
              flush=True)


if __name__ == "__main__":
    main()
