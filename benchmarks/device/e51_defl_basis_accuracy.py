"""e51: attribute e49's defl-vs-ladder 4.5e-5 (device) -- basis or kernel?

e49 measured defl at 1343.9 pts/s but defl_vs_ladder = 4.46e-05 on the
N=1000 bench grid.  CPU validation (host f64 basis) put the deflated
kernel at 4e-7 of the grid scale, so the prime suspect is the device
basis (spectral_basis='auto' -> device as of this session): deflation
needs lam to ~|delta| * 2e-6 ABSOLUTE accuracy near poles (delta down
to 4.4e-7 on this grid -> lam to ~1e-12), and an OA-refined f32-eigh
lambda error of ~2e-11 reproduces the observed 4.5e-5 exactly.

Measures, in order:
1. max |lam_device - lam_host_f64| at N=1000 (all modes + the grid's
   near modes), for oa_steps = 2 (default) and 3;
2. truth error of the deflated route on the 22 near points (x64 host
   inverses) with the HOST basis vs the DEVICE basis.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e51_defl_basis_accuracy.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    import dataclasses

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops import spectral as sp
    from gaunegf_tpu.ops.complexio import call_complex_safe
    from gaunegf_tpu.ops.greens import EnergyEngine

    N = 1000
    H, S, g = tb_system(N)
    lam_host = np.linalg.eigvalsh(H)
    log("host eigvalsh done")

    for steps in (2, 3):
        out = sp.device_basis(H, S, oa_steps=steps)
        lam_dev = out[0]
        err = np.abs(lam_dev - lam_host).max()
        print(f"RESULT lam_dev oa_steps={steps}: max|dlam|={err:.2e}",
              flush=True)

    E_all = np.linspace(-2.0, 2.0, 512)
    cfg = ExecutionConfig(precision="mixed", energy_chunk=4,
                          solver="spectral")
    eng_probe = EnergyEngine(H, S, g, dataclasses.replace(
        cfg, spectral_basis="host"))
    r = eng_probe._spectral_runner()
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
    # grid-scale denominator: the near-sum dominates the full-grid sum
    scale = np.abs(truth).max()

    for basis in ("host", "device"):
        eng = EnergyEngine(H, S, g, dataclasses.replace(
            cfg, spectral_basis=basis))
        rr = eng._spectral_runner()
        out = rr.gr_sum(eng.provider, eng._params_split, Eb, wb)
        err = float(np.abs(out - truth).max() / scale)
        print(f"RESULT defl near-sum truth err, basis={basis}: {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
