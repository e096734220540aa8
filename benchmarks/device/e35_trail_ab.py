"""e35: lu_trail A/B at N=2000 (VERDICT r3 #3 -- the bandwidth-starved
trailing-update bucket).

Modes: 'hi' (f32 HIGHEST, 6 passes/product), 'high' (3 passes),
'bf3' (3 one-pass bf16 products via bit-masked splits), 'kar'
(Karatsuba 3-mult complex HIGHEST), 'kar_high'.  Mixed tier; the Newton
polish absorbs seed error, so the factor quality question is whether
refinement still reaches ~2e-6.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e35_trail_ab.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, median_rate, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    N, n_E = 2000, 64
    H, S, g = tb_system(N)
    E = np.linspace(-2.0, 2.0, n_E)
    w = np.ones(n_E)

    # x64 CPU truth is too slow at N=2000 for in-session accuracy checks;
    # compare modes against the 'hi' device result instead.
    ref = None
    results = {}
    for mode in ("hi", "high", "bf3", "kar", "kar_high"):
        log(f"lu_trail={mode}: building engine")
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=16, lu_trail=mode))
        try:
            rate, raw = median_rate(lambda: eng.gr_sum(E, w), n_E)
        except Exception as e:
            log(f"lu_trail={mode} FAILED: {e!r}")
            continue
        out = eng.gr_sum(E, w)
        if ref is None:
            ref = out
        rel = float(np.max(np.abs(out - ref)) / np.max(np.abs(ref)))
        results[mode] = (rate, rel)
        log(f"lu_trail={mode}: {rate:.2f} pts/s, vs-hi {rel:.2e}  "
            f"raw={['%.2f' % r for r in raw]}")

    for mode, (rate, rel) in results.items():
        print(f"RESULT lu_trail={mode}: {rate:.2f} pts/s (vs hi {rel:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
