"""Surface-GF solver benchmark: Sancho decimation vs relaxed Dyson.

Parity with tests/jax_vs_numpy_benchmark.py and
tests/benchmark_sigma_parallelization.py in the reference (which compare
jitted vs numpy sigma and pool-parallel energy loops): measures converged
fixed-point quality and batched throughput over an energy grid.

    python benchmarks/surface_gf_bench.py [--n-cell 8] [--n-e 256]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-cell", type=int, default=8)
    ap.add_argument("--n-e", type=int, default=256)
    ap.add_argument("--eta", type=float, default=1e-4)
    args = ap.parse_args()

    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.config import ExecutionConfig

    nc = args.n_cell
    n = 2 * nc
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    E = np.linspace(-3, 3, args.n_e)

    for method in ("sancho", "dyson"):
        g = Chain1DSelfEnergy(H, S, [np.arange(nc), np.arange(nc, n)],
                              eta=args.eta, method=method)
        eng = EnergyEngine(H, S, g, ExecutionConfig(precision="fast",
                                                    energy_chunk=32))
        eng.transmission(E[:32])    # warmup
        t0 = time.time()
        T = eng.transmission(E)
        dt = time.time() - t0
        # fixed-point residual at a hard (in-band) energy
        import jax.numpy as jnp
        gs = np.asarray(g.surface_g(-1.3, 0))
        c = g.params()["contacts"][0]
        A = np.asarray((-1.3 + 1j * args.eta) * c["Salpha"] - c["alpha"])
        B = np.asarray((-1.3 + 1j * args.eta) * c["Sbeta"] - c["beta"])
        resid = np.max(np.abs(np.linalg.inv(A - B @ gs @ B.conj().T) - gs))
        print(f"{method:7s}: {args.n_e / dt:8.1f} T(E) pts/s, "
              f"in-band fixed-point residual {resid:.2e}")


if __name__ == "__main__":
    main()
