"""e53: device validation of the union Rayleigh-Ritz deflation fix.

e51 attributed the deflated route's device error (4.45e-5 vs the host
basis's 4.05e-7 on the N=1000 bench grid's 22 near points) to the
device basis's cluster-mixed VECTORS (f64-lambda splicing changed
nothing).  e52 (CPU) showed a Rayleigh-Ritz rotation of the near-mode
union + cluster padding recovers the host floor (4.45e-6 -> 4.09e-7).
The fix is now integrated (SpectralRunner._defl_basis, cached per
padded union).  This experiment measures on TPU:

1. truth error of the deflated near-sum with the DEVICE basis (now
   auto-refined) -- expect ~4e-7 (e51 raw device: 4.45e-5);
2. wall cost of the first _defl_basis call (project + host eigh +
   rotate) and of a cached repeat;
3. full 512-pt bench-grid throughput with deflation, to confirm the
   refinement does not eat e49's 1343.9 pts/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e53_ritz_device.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.complexio import call_complex_safe
    from gaunegf_tpu.ops.greens import EnergyEngine

    N = 1000
    H, S, g = tb_system(N)
    E_all = np.linspace(-2.0, 2.0, 512)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4,
                          solver="spectral", spectral_basis="device")
    eng = EnergyEngine(H, S, g, cfg)
    r = eng._spectral_runner()
    assert r is not None and r._basis_is_device

    d = r._dists(E_all)
    sel = d < 1e-4
    Eb, wb = E_all[sel], np.ones(int(sel.sum()))
    log(f"near points: {int(sel.sum())} dmin={d.min():.1e}; x64 truth...")
    fn, params = g.total_apply()
    t0 = time.time()
    truth = np.zeros((N, N), np.complex128)
    for e in Eb:
        sig = np.asarray(call_complex_safe(fn, params, complex(e)),
                         np.complex128)
        truth += np.linalg.inv(e * S.astype(np.complex128)
                               - H.astype(np.complex128) - sig)
    log(f"truth done ({time.time() - t0:.0f}s)")
    scale = np.abs(truth).max()

    # 2. refinement cost (first call compiles project/rotate too)
    m = r._deflate_m()
    idx = r._near_idx(Eb, m)
    t0 = time.time()
    r._defl_basis(idx)
    t1 = time.time()
    r._ritz_cache.clear()
    t2 = time.time()
    r._defl_basis(idx)
    t3 = time.time()
    tree = r._defl_basis(idx)   # cached
    t4 = time.time()
    u = tree["lam_hi"].shape  # noqa: F841 - touch to sync
    print(f"RESULT ritz cost: first {t1 - t0:.2f}s (incl compile), "
          f"warm {t3 - t2:.2f}s, cached {t4 - t3:.4f}s", flush=True)

    # 1. near-sum truth error with the refined device basis
    out = r.gr_sum(eng.provider, eng._params_split, Eb, wb)
    err = float(np.abs(np.asarray(out) - truth).max() / scale)
    print(f"RESULT defl near-sum truth err, refined device basis: "
          f"{err:.2e}", flush=True)

    # 3. full bench-grid throughput (e49 comparison: defl 1343.9 pts/s)
    w_all = np.ones(E_all.size)
    eng2 = EnergyEngine(H, S, g, cfg)   # fresh: include refine in warm
    r2 = eng2._spectral_runner()
    t0 = time.time()
    out = r2.gr_sum(eng2.provider, eng2._params_split, E_all, w_all)
    _ = np.asarray(out)
    t_warm = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = r2.gr_sum(eng2.provider, eng2._params_split, E_all, w_all)
        _ = np.asarray(out)
        best = min(best, time.time() - t0)
    print(f"RESULT bench-grid 512 pts: {E_all.size / best:.1f} pts/s "
          f"(warm {t_warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
