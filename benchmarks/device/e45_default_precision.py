"""e45: what does a bare complex `@` (DEFAULT precision) do on this TPU?

Round-4 session 3 found every provider fixed point (Sancho, Bethe
Jacobi, k-space) and the LU engines' G< sandwich running bare-@ complex
products.  On TPU, DEFAULT f32 matmuls are one-pass bf16; whether the
complex decomposition inherits that decides if prior-round device
G</T(E) numbers carried ~1e-3 noise.  This probes it directly, then
re-runs the e36 k-space T(E) config that produced non-finite values on
device (now with explicit-HIGHEST provider products).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e45_default_precision.py
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep


def probe_precisions():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 512
    ar = rng.standard_normal((n, n)).astype(np.float32)
    br = rng.standard_normal((n, n)).astype(np.float32)
    ref_r = ar.astype(np.float64) @ br.astype(np.float64)

    for prec in ("default", "high", "highest"):
        f = jax.jit(lambda a, b: jnp.matmul(a, b, precision=prec))
        got = np.asarray(f(ar, br), np.float64)
        rel = np.abs(got - ref_r).max() / np.abs(ref_r).max()
        print(f"RESULT real f32 @ {prec}: {rel:.2e}", flush=True)

    from gaunegf_tpu.ops.complexio import call_complex_safe
    ac = (ar + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    bc = (br + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    ref_c = ac.astype(np.complex128) @ bc.astype(np.complex128)
    for prec in ("default", "high", "highest"):
        f = lambda a, b: jnp.matmul(a, b, precision=prec)
        got = np.asarray(call_complex_safe(f, ac, bc), np.complex128)
        rel = np.abs(got - ref_c).max() / np.abs(ref_c).max()
        print(f"RESULT complex64 @ {prec}: {rel:.2e}", flush=True)


def rerun_e36_case():
    import gaunegf_tpu
    from e36_kspace_tpu import _plane_geometry
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
    for nk, reduce_ in ((4, True), (6, True), (6, False)):
        log(f"e36 rerun nk={nk} bz={reduce_}: provider build")
        prov = Lattice3DSelfEnergy(
            F, S, [[1, 2, 3, 4]], geom, lat_file=lat, eta=1e-5,
            T=0.0, fermi=0.0, verbose=False, gamma_point_only=False,
            nk=nk, bz_symmetry=reduce_)
        eng = EnergyEngine(F, S, prov, ExecutionConfig(energy_chunk=8))
        t0 = time.time()
        T1 = eng.transmission(E)
        warm = time.time() - t0
        t0 = time.time()
        T1 = eng.transmission(E)
        dt = time.time() - t0
        finite = bool(np.isfinite(T1).all())
        print(f"RESULT e36 nk={nk} bz={reduce_}: finite={finite} "
              f"{len(E) / dt:.2f} pts/s (compile {warm:.0f}s) "
              f"Tmax={np.nanmax(T1):.3f}", flush=True)


def main():
    prep()
    probe_precisions()
    rerun_e36_case()


if __name__ == "__main__":
    main()
