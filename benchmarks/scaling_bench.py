"""Mesh-scaling benchmark: energy-sharded density build vs device count.

No reference equivalent exists (the reference has no distributed backend,
SURVEY.md section 2.2); this harness measures strong scaling of the sharded
weighted G(E) sum.  On a CPU host it uses virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python benchmarks/scaling_bench.py
"""

import time

import numpy as np


def main():
    import jax

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.parallel.mesh import energy_mesh

    n = 256
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    g = ConstantSelfEnergy(H, S, [np.arange(8), np.arange(n - 8, n)],
                           sig1=-0.1j)
    n_e = 256
    E = np.linspace(-2, 2, n_e)
    w = np.ones(n_e)

    n_avail = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8, 16) if d <= n_avail]
    base = None
    for nd in counts:
        mesh = energy_mesh(nd)
        eng = EnergyEngine(H, S, g,
                           ExecutionConfig(precision="fast",
                                           energy_chunk=16), mesh)
        eng.gr_sum(E, w)            # warmup
        t0 = time.time()
        eng.gr_sum(E, w)
        dt = time.time() - t0
        base = base or dt
        print(f"{nd:2d} device(s): {n_e / dt:8.1f} pts/s  "
              f"speedup x{base / dt:.2f}")


if __name__ == "__main__":
    main()
