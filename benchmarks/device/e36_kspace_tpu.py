"""e36: on-chip k-space contact validation (VERDICT r3 #8).

One Lattice3D k-space T(E) sweep at nk=4 and nk=6 with and without the
C3v BZ reduction, confirming the ~3.6x decimation saving translates to
wall clock on the TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e36_kspace_tpu.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep


def _plane_geometry(d=2.88):
    from gaunegf_tpu.models import bethe as bt

    u1 = np.array([1.0, 0.0, 0.0]) * d
    u2 = np.array([0.5, np.sqrt(3) / 2, 0.0]) * d
    top = [np.zeros(3), u1, u2, u1 + u2]
    device = [np.array([1.0, 0.6, -5.0])]
    coords = np.stack(top + device)
    orb_atoms = []
    for atom in range(1, len(coords) + 1):
        orb_atoms += [atom] * (9 if atom <= 4 else 4)
    return bt.BetheGeometry(coords, np.asarray(orb_atoms), None)


def main():
    prep()
    import gaunegf_tpu
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.lattice3d import Lattice3DSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    lat = os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                       "Au.bethe")
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    E = np.linspace(-11.0, -7.0, 32)

    results = {}
    base = None
    for nk in (4, 6):
        for reduce_ in (True, False):
            key = f"nk={nk} bz_symmetry={reduce_}"
            log(f"{key}: provider build")
            prov = Lattice3DSelfEnergy(
                F, S, [[1, 2, 3, 4]], geom, lat_file=lat, eta=1e-5,
                T=0.0, fermi=0.0, verbose=False, gamma_point_only=False,
                nk=nk, bz_symmetry=reduce_)
            eng = EnergyEngine(F, S, prov,
                               ExecutionConfig(energy_chunk=8))
            t0 = time.time()
            T1 = eng.transmission(E)          # compile + warm
            warm = time.time() - t0
            t0 = time.time()
            T1 = eng.transmission(E)
            dt = time.time() - t0
            assert np.isfinite(T1).all()
            if base is None:
                base = T1
            rel = float(np.max(np.abs(T1 - base)) /
                        max(np.max(np.abs(base)), 1e-30))
            results[key] = (len(E) / dt, warm, rel)
            log(f"{key}: {len(E) / dt:.2f} pts/s (warm {warm:.0f}s, "
                f"vs first {rel:.2e})")

    for key, (rate, warm, rel) in results.items():
        print(f"RESULT {key}: {rate:.2f} pts/s (compile {warm:.0f}s, "
              f"agree {rel:.2e})", flush=True)


if __name__ == "__main__":
    main()
