"""e58b (CPU): end-to-end contract check of the ROBUST device basis.

e58 established that the clamped to-tolerance refinement (refine_loop)
converges from a bf16-grade seed (the e57-measured TPU QDWH eigh error,
backward-error model 5e-3*scale) to err_s ~ 1e-7.  This study asks the
question that decides whether spectral_basis='auto' may return to the
device: does a basis of THAT quality meet the mixed contract end-to-end,
including the adversarial geometry the gauge cannot see -- far-segment
points (d >= dist_f32, NOT deflated) sitting near tight band-edge
clusters whose eigenvalue errors saturate at the s-level?

Method (all arithmetic f32/dw, backend-identical between CPU and MXU;
only the SEED differs between backends, and the device's seed error is
injected exactly):
1. bench-like N-orbital chain + diagonal disorder;
2. seed = f32 eigh of A + E_sym, ||E||_2 = 5e-3*scale;
3. the SEEDED robust pipeline (refine_loop + gauge), then the
   device_basis post-processing (sort perm) by hand;
4. a SpectralRunner built with basis='device' has its basis tree
   REPLACED by the simulated-device basis;
5. per-geometry gr_sum truth errors (x64 host inverses):
   - uniform real-axis grid (the bench geometry);
   - per-distance probes: 4 points at d in {2e-4, 5e-4, 1e-3, 1e-2}
     from (a) band-edge cluster modes, (b) mid-band modes;
   - near-pole probes at d in {1e-6, 1e-5} (deflated segment + Ritz).
   Each compared against the HOST-basis runner on the same grid.

Run: PYTHONPATH=/root/repo python benchmarks/e58b_robust_end_to_end_cpu.py [N]
"""

import sys
import time

import numpy as np

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops import spectral as sp
    from gaunegf_tpu.ops.complexio import call_complex_safe
    from gaunegf_tpu.ops.greens import EnergyEngine

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(0)
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(H, S, [np.arange(8), np.arange(N - 8, N)],
                           sig1=-0.1j)
    lam_true = np.linalg.eigvalsh(H)
    scale = np.abs(lam_true).max()
    gaps = np.diff(lam_true)
    print(f"# N={N} scale={scale:.3f} min/median gap rel "
          f"{gaps.min()/scale:.1e}/{np.median(gaps)/scale:.1e}", flush=True)

    # --- simulated device seed + robust refinement ----------------------
    E = rng.standard_normal((N, N))
    E = 0.5 * (E + E.T)
    E *= 5e-3 * scale / np.linalg.norm(E, 2)
    _, X_pert = np.linalg.eigh(H + E)
    seed = (X_pert.astype(np.float32), np.zeros((N, N), np.float32))
    H_dw = sp._dw_split_real(H.astype(np.float64))
    fn = sp._build_device_basis_fn(False, 1, 1e-3, seeded=True)
    t0 = time.time()
    lam_dw, X_dw, C_dw, err_lam, err_s, n_steps = fn(H_dw, seed)
    wall = time.time() - t0
    err_lam, err_s = float(err_lam), float(err_s)
    ok = err_lam <= sp._ROBUST_LAM_TOL and err_s <= sp._WARM_S_TOL
    lam64 = (np.asarray(lam_dw[0], np.float64)
             + np.asarray(lam_dw[1], np.float64))
    perm = np.argsort(lam64, kind="stable")
    lam_err = np.abs(lam64[perm] - lam_true).max() / scale
    print(f"RESULT robust refine: steps={int(n_steps)} gauge "
          f"err_lam {err_lam:.2e} err_s {err_s:.2e} pass={ok} "
          f"| true lam err {lam_err:.2e} ({wall:.0f}s)", flush=True)
    if not ok:
        print("RESULT gauge refused the bf16-grade seed -- host fallback "
              "path would engage; study ends", flush=True)
        return
    import jax.numpy as jnp
    lam_dw, X_dw, C_dw = sp._build_perm_fn()(
        lam_dw, X_dw, C_dw, jnp.asarray(perm.astype(np.int32)))
    lam64 = lam64[perm]

    # --- runners: host basis vs injected simulated-device basis ---------
    cfg = ExecutionConfig(precision="mixed", energy_chunk=8,
                          solver="spectral")
    eng_host = EnergyEngine(H, S, g, dataclasses.replace(
        cfg, spectral_basis="host"))
    r_host = eng_host._spectral_runner()
    assert r_host is not None
    eng_dev = EnergyEngine(H, S, g, dataclasses.replace(
        cfg, spectral_basis="device"))
    r_dev = eng_dev._spectral_runner()
    assert r_dev is not None and r_dev._basis_is_device
    C64 = (np.asarray(C_dw[0], np.float64)
           + np.asarray(C_dw[1], np.float64))
    r_dev.basis = {
        "lam_hi": np.asarray(lam_dw[0]), "lam_lo": np.asarray(lam_dw[1]),
        "C_hi": np.asarray(C_dw[0]), "C_lo": np.asarray(C_dw[1]),
        "Cc": C64[np.asarray(r_dev.c), :].astype(np.float32),
    }
    r_dev.lam64 = lam64
    r_dev._ritz_cache.clear()

    # --- probe grids -----------------------------------------------------
    # band-edge cluster modes (tightest local gaps) and mid-band modes
    local_gap = np.minimum(np.r_[gaps, np.inf], np.r_[np.inf, gaps])
    edge_modes = np.argsort(local_gap)[:4]
    mid = np.searchsorted(lam_true, 0.0)
    mid_modes = np.array([mid - 1, mid, mid + 7, mid - 7])
    grids = [("uniform", np.linspace(-2.0, 2.0, 48))]
    for d in (2e-4, 5e-4, 1e-3, 1e-2):
        grids.append((f"edge+{d:.0e}", lam_true[edge_modes] + d))
        grids.append((f"mid+{d:.0e}", lam_true[mid_modes] + d))
    for d in (1e-6, 1e-5):
        grids.append((f"defl edge+{d:.0e}", lam_true[edge_modes] + d))

    fnp, params = g.total_apply()

    def truth_sum(E_pts):
        acc = np.zeros((N, N), np.complex128)
        for e in E_pts:
            sig = np.asarray(call_complex_safe(fnp, params, complex(e)),
                             np.complex128)
            acc += np.linalg.inv(e * S.astype(np.complex128)
                                 - H.astype(np.complex128) - sig)
        return acc

    for name, E_pts in grids:
        w = np.ones(E_pts.size)
        t0 = time.time()
        truth = truth_sum(E_pts)
        tscale = np.abs(truth).max()
        e_host = float(np.abs(
            r_host.gr_sum(eng_host.provider, eng_host._params_split,
                          E_pts, w) - truth).max() / tscale)
        e_dev = float(np.abs(
            r_dev.gr_sum(eng_dev.provider, eng_dev._params_split,
                         E_pts, w) - truth).max() / tscale)
        print(f"RESULT {name:>16}: host {e_host:.2e}  device-sim "
              f"{e_dev:.2e}  ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
