"""e46: N=4096 spectral anatomy -- why did e37 measure 1.14 pts/s?

CPU diagnosis (round-4 session 4): the e37 grid (16 real-axis points) is
100% f32-tier at N=4096, so the "all-dwl grid" theory is falsified.  The
remaining suspects are fixed per-dispatch costs (the O(N^3) rotation,
H2D of the segment grids, D2H of the 4096^2 result) amortized over only
16 points, plus the one-time basis setup leaking into the timed region.

Measures, in order:
1. basis setup wall (device eigh + OA refinement + structure probes);
2. gr_sum wall at n_E = 16 / 64 / 128 on the same runner (amortization
   curve -> fixed-vs-per-point split by least squares);
3. per-op device-time profile of one warm n_E=16 dispatch (rotation vs
   scan vs copies), reusing e44's self-time parser;
4. the LU engine at n_E=16 for the same fixture (e37 parity check).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e46_n4096_anatomy.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system
from e44_spectral_profile import parse_trace


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.utils.logging import profile_trace

    N = 4096
    H, S, g = tb_system(N)

    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="spectral"))
    t0 = time.time()
    runner = eng._spectral_runner()
    setup = time.time() - t0
    assert runner is not None, "spectral route unavailable at N=4096"
    print(f"RESULT setup: {setup:.1f}s", flush=True)

    walls = {}
    for n_E in (16, 64, 128):
        E = np.linspace(-2.0, 2.0, n_E)
        w = np.ones(n_E)
        mode = runner._mode(E)
        out = eng.gr_sum(E, w)           # compile + warm
        assert np.isfinite(out).all()
        t0 = time.time()
        eng.gr_sum(E, w)
        wall = time.time() - t0
        walls[n_E] = wall
        print(f"RESULT n_E={n_E}: mode={mode} wall={wall:.2f}s "
              f"({n_E / wall:.2f} pts/s)", flush=True)

    # fixed + per-point split from the 16/128 pair
    a = (walls[128] - walls[16]) / (128 - 16)
    b = walls[16] - 16 * a
    print(f"RESULT fit: per_point={a * 1e3:.1f} ms fixed={b:.2f} s "
          f"(crossover vs LU at ~{b / max(1e-9, 0.45 - a):.0f} pts "
          "taking LU ~0.45 s/pt from e37)", flush=True)

    logdir = "/tmp/e46_trace"
    E = np.linspace(-2.0, 2.0, 16)
    with profile_trace(logdir):
        eng.gr_sum(E, np.ones(16))
    parse_trace(logdir)

    log("LU reference at n_E=16 (e37 parity)")
    eng_lu = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", solver="lu"))
    out = eng_lu.gr_sum(E, np.ones(16))
    assert np.isfinite(out).all()
    t0 = time.time()
    eng_lu.gr_sum(E, np.ones(16))
    wall = time.time() - t0
    print(f"RESULT lu n_E=16: wall={wall:.2f}s ({16 / wall:.2f} pts/s)",
          flush=True)


if __name__ == "__main__":
    main()
