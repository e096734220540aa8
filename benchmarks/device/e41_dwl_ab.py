"""e41: spectral dw 'lite' product tier -- device validation + A/B.

Three questions, in order:
1. Is the lite tier's core assumption TRUE ON DEVICE: are DEFAULT
   (one-pass bf16) slice products exact for <= 8-significant-bit Ozaki
   slices?  (matmul_ozaki_lite vs host f64 on wildly-scaled operands.)
2. How much faster is spectral_dw='lite' than 'full' on the bench grids
   (N=1000 512 pts, N=2000 128 pts, both force the dw family)?
3. Accuracy ownership of the e40 spectral-vs-LU disagreement (6.1e-4 at
   N=2000): compare spectral-lite / spectral-full / LU-mixed sums against
   host x64 truth on a small stratified subgrid (closest-to-spectrum,
   mid, far points).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e41_dwl_ab.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, median_rate, prep, tb_system


def validate_ozaki_lite():
    import jax.numpy as jnp
    from gaunegf_tpu.ops import zlinalg as zl

    rng = np.random.default_rng(7)
    worst = 0.0
    for (m, K, n) in ((256, 512, 256), (128, 2000, 128), (96, 32, 96)):
        a = rng.standard_normal((m, K)).astype(np.float32)
        b = rng.standard_normal((K, n)).astype(np.float32)
        a *= np.exp2(rng.integers(-8, 8, (m, 1))).astype(np.float32)
        b *= np.exp2(rng.integers(-8, 8, (1, n))).astype(np.float32)
        hi, lo = zl.matmul_ozaki_lite(jnp.asarray(a), jnp.asarray(b))
        got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
        ref = a.astype(np.float64) @ b.astype(np.float64)
        scale = (np.abs(a).astype(np.float64)
                 @ np.abs(b).astype(np.float64)).max()
        rel = np.abs(got - ref).max() / scale
        log(f"ozaki_lite K={K}: {rel:.2e} (device)")
        worst = max(worst, rel)
    return worst


def host_truth_sum(H, S, g, E, w):
    from gaunegf_tpu.ops.complexio import call_complex_safe

    fn, params = g.total_apply()
    out = np.zeros(H.shape, np.complex128)
    for e, ww in zip(E, w):
        sig = np.asarray(call_complex_safe(fn, params, complex(e)),
                         dtype=np.complex128)
        out += ww * np.linalg.inv(e * S.astype(np.complex128)
                                  - H.astype(np.complex128) - sig)
    return out


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops.greens import EnergyEngine

    worst = validate_ozaki_lite()
    if worst > 5e-12:
        print(f"RESULT ozaki_lite_device INVALID: {worst:.2e}", flush=True)
        log("lite slice products NOT exact on device -- aborting A/B")
        return
    print(f"RESULT ozaki_lite_device OK: {worst:.2e}", flush=True)

    for N, n_E, chunk in ((1000, 512, 64), (2000, 128, 16)):
        H, S, g = tb_system(N)
        E = np.linspace(-2.0, 2.0, n_E)
        w = np.ones(n_E)
        rates = {}
        engines = {}
        for tier in ("lite", "full"):
            log(f"N={N} spectral_dw={tier}: build + compile")
            eng = EnergyEngine(H, S, g, ExecutionConfig(
                precision="mixed", energy_chunk=chunk, solver="spectral",
                spectral_dw=tier))
            mode = eng._spectral_runner()._mode(E)
            rate, raw = median_rate(lambda: eng.gr_sum(E, w), n_E)
            rates[tier] = rate
            engines[tier] = eng
            log(f"N={N} {tier} (mode {mode}): {rate:.1f} pts/s  "
                f"raw={['%.1f' % r for r in raw]}")

        # chunk-size probe on the lite tier at N=2000
        if N == 2000:
            for ch2 in (32,):
                eng32 = EnergyEngine(H, S, g, ExecutionConfig(
                    precision="mixed", energy_chunk=ch2, solver="spectral",
                    spectral_dw="lite"))
                rate32, raw32 = median_rate(lambda: eng32.gr_sum(E, w), n_E)
                rates[f"lite_chunk{ch2}"] = rate32
                log(f"N={N} lite chunk={ch2}: {rate32:.1f} pts/s  "
                    f"raw={['%.1f' % r for r in raw32]}")

        # --- truth probe: the FULL bench grid (reuses the compiled
        # executables; host x64 inverses are the one-time cost) ----------
        runner = engines["lite"]._spectral_runner()
        d = runner._dists(E)
        log(f"N={N} truth probe on all {n_E} pts, dists "
            f"[{d.min():.1e}, {d.max():.1e}] (host x64 solves)")
        t0 = time.time()
        truth = host_truth_sum(H, S, g, E, w)
        log(f"N={N} truth done ({time.time() - t0:.0f}s)")
        tscale = np.abs(truth).max()
        errs = {}
        for tier in ("lite", "full"):
            out = engines[tier].gr_sum(E, w)
            errs[f"spectral_{tier}"] = float(
                np.abs(out - truth).max() / tscale)
        eng_lu = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=chunk))
        out = eng_lu.gr_sum(E, w)
        errs["lu_mixed"] = float(np.abs(out - truth).max() / tscale)
        log(f"N={N} truth errors: " + "  ".join(
            f"{k}={v:.2e}" for k, v in errs.items()))

        print(f"RESULT N={N}: " + "  ".join(
            f"{k}={v:.1f}pts/s" for k, v in rates.items())
            + "  |  " + "  ".join(f"err_{k}={v:.2e}"
                                  for k, v in errs.items()), flush=True)


if __name__ == "__main__":
    main()
