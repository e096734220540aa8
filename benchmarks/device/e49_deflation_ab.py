"""e49: deflation A/B on the bench grids (round-4 session 4).

Same-session comparison the committed default rests on:
  (a) spectral_deflate=8 (one f32 + one defl segment, no fallback)
  (b) spectral_deflate=0 (f32 + dwl segments + exact-LU fallback
      dispatch for sub-dist_lu points -- the session-3 ladder)
  (c) the LU mixed engine (known 1.66e-1 truth error on this grid at
      N=1000, e41 -- timed for the throughput row only)
at N=1000 (512 pts, 5 sub-dist_lu + 17 dw points) and N=2000 (128 pts,
4 dw points, no sub-dist_lu).  Accuracy cross-check: defl vs ladder
(the ladder's spectral+exact-fallback measured 1.72e-8 vs x64 truth on
the N=1000 grid, e41, so agreement with it bounds the defl error
without paying 512 host inverses again).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e49_deflation_ab.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, median_rate, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    for N, n_E, chunk in ((1000, 512, 64), (2000, 128, 16)):
        H, S, g = tb_system(N)
        E = np.linspace(-2.0, 2.0, n_E)
        w = np.ones(n_E)
        rates, outs = {}, {}
        for tag, cfg in (
                ("defl", ExecutionConfig(precision="mixed",
                                         energy_chunk=chunk,
                                         solver="spectral")),
                ("ladder", ExecutionConfig(precision="mixed",
                                           energy_chunk=chunk,
                                           solver="spectral",
                                           spectral_deflate=0)),
                ("lu", ExecutionConfig(precision="mixed",
                                       energy_chunk=chunk)),
        ):
            log(f"N={N} {tag}: build + compile")
            eng = EnergyEngine(H, S, g, cfg)
            rate, raw = median_rate(lambda: eng.gr_sum(E, w), n_E)
            rates[tag] = rate
            outs[tag] = eng.gr_sum(E, w)
            log(f"N={N} {tag}: {rate:.1f} pts/s  "
                f"raw={['%.1f' % r for r in raw]}")
        scale = np.abs(outs["ladder"]).max()
        d_dl = float(np.abs(outs["defl"] - outs["ladder"]).max() / scale)
        print(f"RESULT N={N}: " + "  ".join(
            f"{k}={v:.1f}pts/s" for k, v in rates.items())
            + f"  |  defl_vs_ladder={d_dl:.2e}", flush=True)


if __name__ == "__main__":
    main()
