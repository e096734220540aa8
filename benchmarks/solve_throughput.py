"""G(E) solve throughput sweep: sizes x grid lengths x precision tiers.

Parity with the reference's user-run benchmark harnesses
(tests/gpu_benchmark.py: inversion/solve/matmul at N=1000-5000, f32 vs
f64).  Run on any backend:

    python benchmarks/solve_throughput.py [--sizes 500 1000 2000]
                                          [--n-e 32 128] [--chunk 32]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[500, 1000])
    ap.add_argument("--n-e", type=int, nargs="+", default=[64])
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--precisions", nargs="+", default=["fast", "mixed"])
    args = ap.parse_args()

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    results = []
    for n in args.sizes:
        H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
        S = np.eye(n)
        g = ConstantSelfEnergy(H, S, [np.arange(8), np.arange(n - 8, n)],
                               sig1=-0.1j)
        for prec in args.precisions:
            eng = EnergyEngine(H, S, g, ExecutionConfig(
                precision=prec, energy_chunk=min(args.chunk, max(args.n_e)),
                ))
            for n_e in args.n_e:
                E = np.linspace(-2, 2, n_e)
                w = np.ones(n_e)
                eng.gr_sum(E, w)                 # warmup/compile
                t0 = time.time()
                eng.gr_sum(E, w)
                dt = time.time() - t0
                rec = {"N": n, "n_E": n_e, "precision": prec,
                       "pts_per_s": round(n_e / dt, 2)}
                results.append(rec)
                print(json.dumps(rec))
    return results


if __name__ == "__main__":
    main()
