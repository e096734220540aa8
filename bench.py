"""Headline benchmark: energy points/sec for 1000-orbital G(E) solves.

Matches the driver-defined metric (BASELINE.json): throughput of dense
complex retarded Green's function solves G(E) = (E*S - H - Sigma)^-1 at
N = 1000 orbitals, batched over the energy grid, in the production 'mixed'
precision (blocked complex LU + double-float-residual refinement,
forward error ~1e-6 vs f64).

vs_baseline compares against the measured reference-equivalent CPU path on
this host (jax CPU, complex128 vmapped jnp.linalg.solve exactly like
gauNEGF/integrate.py:67-109's vmap branch): 5.0 points/s on the 1 available
CPU core (see BASELINE.md for methodology and a 64-core extrapolation).

Prints ONE JSON line.
"""

import json
import sys
import time

import numpy as np

# Measured on this host (single CPU core, reference _GInt-equivalent path,
# N=1000, complex128): see BASELINE.md.
CPU_BASELINE_PTS_PER_SEC = 5.0

N = 1000
N_E = 512           # long grid amortizes the tunnel's fixed ~1.2s D2H cost
CHUNK = 64          # (device compute ~2 ms/point at N=1000; the axon
WARMUP_E = N_E      # tunnel moves the 8 MB result at ~7 MB/s)


def main():
    import jax

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    rng = np.random.default_rng(0)
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(8), np.arange(N - 8, N)],
                           sig1=-0.1j)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=CHUNK, lu_block=128))

    E = np.linspace(-2.0, 2.0, N_E)
    w = np.ones(N_E)
    # warmup / compile
    eng.gr_sum(E[:WARMUP_E], np.ones(WARMUP_E))
    # best of 3: the tunnel to the device adds jittery per-call latency
    # (same executable; spread observed up to ~15%)
    pts = 0.0
    for _ in range(3):
        t0 = time.time()
        out = eng.gr_sum(E, w)
        dt = time.time() - t0
        assert np.isfinite(out).all()
        pts = max(pts, N_E / dt)
    print(json.dumps({
        "metric": "energy points/sec, 1000-orbital G(E) solves (mixed precision)",
        "value": round(pts, 2),
        "unit": "points/s",
        "vs_baseline": round(pts / CPU_BASELINE_PTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
