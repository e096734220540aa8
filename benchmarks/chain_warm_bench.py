"""Chain-contact T(E) sweep: warm-started vs cold provider paths.

Measures the round-3 chain warm start (previous-energy surface-GF seeding
+ one shared solve per energy, models/chain1d.contacts_warm_apply) against
the cold low-rank path on the same junction -- the chain twin of the
round-1 Bethe warm measurement (3.8 -> 7.2 pts/s).  The reference has no
chain warm start at all (its sigmaKprev trick is surfG3D-only,
surfG3D.py:877-879).

    python benchmarks/chain_warm_bench.py [--n 512] [--n-e 512] [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--n-c", type=int, default=8)
    ap.add_argument("--n-e", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    n, nc = args.n, args.n_c
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    inds = [np.arange(nc), np.arange(n - nc, n)]
    taus = [np.arange(nc, 2 * nc), np.arange(n - 2 * nc, n - nc)]
    g = Chain1DSelfEnergy(H, S, inds, taus=taus, eta=1e-4)
    E = np.linspace(-1.9, 1.9, args.n_e)

    results = {}
    for label, warm in [("cold", False), ("warm", True)]:
        eng = EnergyEngine(H, S, g, ExecutionConfig(warm_start="force" if warm else False))
        T = eng.transmission(E)          # compile + warm call
        t0 = time.time()
        T = eng.transmission(E)
        dt = time.time() - t0
        results[label] = (args.n_e / dt, T)
        print(f"{label:5s}: {args.n_e / dt:8.1f} pts/s "
              f"(T range [{T.min():.3f}, {T.max():.3f}])")

    diff = np.max(np.abs(results["warm"][1] - results["cold"][1]))
    print(f"warm/cold speedup: "
          f"{results['warm'][0] / results['cold'][0]:.2f}x, "
          f"max |dT| = {diff:.2e}")


if __name__ == "__main__":
    main()
