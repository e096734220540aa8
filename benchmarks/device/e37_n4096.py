"""e37: N=4096 single-chip mixed gr_sum row (VERDICT r3 #9 stretch).

HBM-chunked (auto energy_chunk picks 4 at N=4096); anchors the
zsolve_dist / 'm'-axis story with a single-chip number at the size
where distribution starts to matter.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e37_n4096.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, median_rate, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    N, n_E = 4096, 16
    H, S, g = tb_system(N)
    E = np.linspace(-2.0, 2.0, n_E)
    w = np.ones(n_E)

    results = {}
    for solver in ("spectral", "lu"):
        log(f"N={N} solver={solver} (mixed, auto chunk)")
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", solver=solver))
        try:
            rate, raw = median_rate(lambda: eng.gr_sum(E, w), n_E)
        except Exception as e:
            log(f"solver={solver} FAILED: {e!r}")
            continue
        results[solver] = rate
        log(f"N={N} {solver}: {rate:.3f} pts/s  "
            f"raw={['%.3f' % r for r in raw]}")

    for solver, rate in results.items():
        print(f"RESULT N={N} solver={solver}: {rate:.3f} pts/s", flush=True)


if __name__ == "__main__":
    main()
