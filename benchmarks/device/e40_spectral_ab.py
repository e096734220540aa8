"""e40: spectral vs LU A/B on device (same grids as bench.py).

The round-4 flagship question: does the one-eigh-per-Fock + rank-k
Woodbury route (ops/spectral.py) beat the per-point blocked LU on chip,
and by how much, at N=1000 and the N=2000 north-star config?

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e40_spectral_ab.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, median_rate, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    results = {}
    for N, n_E, chunk in ((1000, 512, 64), (2000, 128, 16)):
        H, S, g = tb_system(N)
        E = np.linspace(-2.0, 2.0, n_E)
        w = np.ones(n_E)

        log(f"N={N}: LU engine (mixed, chunk {chunk})")
        eng_lu = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=chunk))
        lu, lu_raw = median_rate(lambda: eng_lu.gr_sum(E, w), n_E)
        log(f"N={N} LU: {lu:.1f} pts/s  raw={['%.1f' % r for r in lu_raw]}")

        log(f"N={N}: spectral engine setup (host eigh)")
        t0 = time.time()
        eng_sp = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=chunk, solver="spectral"))
        runner = eng_sp._spectral_runner()
        setup = time.time() - t0
        if runner is None:
            log(f"N={N}: spectral route DECLINED")
            continue
        sp, sp_raw = median_rate(lambda: eng_sp.gr_sum(E, w), n_E)
        log(f"N={N} spectral: {sp:.1f} pts/s (setup {setup:.1f}s)  "
            f"raw={['%.1f' % r for r in sp_raw]}")

        d = np.max(np.abs(eng_sp.gr_sum(E, w) - eng_lu.gr_sum(E, w)))
        scale = np.max(np.abs(eng_lu.gr_sum(E, w)))
        log(f"N={N} agreement: {d / scale:.2e} rel")
        results[N] = (lu, sp, setup, d / scale)

    for N, (lu, sp, setup, rel) in results.items():
        print(f"RESULT N={N}: lu={lu:.1f} spectral={sp:.1f} pts/s "
              f"({sp / lu:.2f}x), setup={setup:.1f}s, agree={rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
