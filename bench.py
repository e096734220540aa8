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

Prints ONE JSON line.  The primary value is the N=1000 mixed-precision
density-sum throughput (median of 5 timed runs -- the tunnel adds ~15%
per-call jitter that best-of-N under-reports and single runs over-report);
"extra" carries the N=2000 north-star config and the low-rank T(E) sweep so
per-round regressions anywhere on the hot surface are visible to the driver.
"""

import json
import sys
import time

import numpy as np

# Measured on this host (single CPU core, reference _GInt-equivalent path,
# N=1000, complex128): see BASELINE.md.
CPU_BASELINE_PTS_PER_SEC = 5.0

# North-star accounting (BASELINE.json: ">=10x a 64-core CPU at N=2000").
# No 64-core box exists in this environment, so the denominator is modeled
# UP, i.e. conservatively against us: measured single-core complex128
# LAPACK at N=2000 on this host = 0.623 pts/s (round 4; N=1000 measured
# 4.3-5.0), x30 for 64-core zgesv parallel scaling (typical published
# range is 20-30x; we take the top).  See BASELINE.md "north-star
# accounting" for the derivation.
CPU_64CORE_N2000_EST = 18.8

# Cross-session anchors (VERDICT r2 item 6): chip/tunnel throughput drifts
# up to ~7x between sessions on identical code (BASELINE.md), so the
# headline number alone cannot distinguish a regression from a slow
# session.  Two fixed probes are timed every run and their ratio to the
# round-3 reference session is reported, plus value_normalized =
# value / anchor_ratio.  ANCHOR_REF_* were measured in the same round-3
# calibration run that produced {N1000: 214.2, N2000: 32.5, T(E): 335.3}
# (a slow-service session; ratios > 1 mean a faster session than that).
# None disables normalization.
ANCHOR_REF_MATMUL_GFLOPS = 1961.7   # 32 chained 1024^2 f32 HIGHEST matmuls
ANCHOR_REF_SOLVE_PTS = 458.5        # N=512 fast-tier gr_sum, 128 points


def _measure_anchor_matmul():
    """Achieved GFLOP/s of 32 dependent 1024^2 f32 matmuls in ONE
    dispatch (dependency chain defeats dead-code elimination; the scalar
    readback forces completion through the async tunnel)."""
    import jax
    import jax.numpy as jnp

    K, n = 32, 1024

    @jax.jit
    def chain(x):
        for _ in range(K):
            x = jnp.matmul(x, x, precision=jax.lax.Precision.HIGHEST)
            x = x * (1.0 / jnp.max(jnp.abs(x)))
        return jnp.sum(x)

    x = jnp.eye(n, dtype=jnp.float32) + 0.01
    float(chain(x))                       # compile + warm
    t0 = time.time()
    float(chain(x))
    dt = time.time() - t0
    return K * 2 * n**3 / dt / 1e9


def _measure_anchor_solve(EnergyEngine, ExecutionConfig, system):
    """Pinned-config solve probe: N=512 fast-tier density sum."""
    H, S, g = system(512)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="fast", energy_chunk=32, lu_block=128, solver="lu"))
    E = np.linspace(-2.0, 2.0, 128)
    w = np.ones(128)
    return _median_rate(lambda: eng.gr_sum(E, w), 128, repeats=3)


def _subprocess_health_probe(timeout=600, attempts=2, spacing=120):
    """Probe TPU health in a SUBPROCESS before the parent touches JAX.

    The round-3/4 outage mode is an UNINTERRUPTIBLE hang inside the axon
    plugin's device-client creation: SIGALRM never fires (the hang is in
    native init, before any Python bytecode runs again), so an in-process
    guard cannot convert the hang into a fast failure -- the driver would
    record a silent timeout instead of rc=2.  A subprocess with a kill
    timeout is immune.  On repeated failure, exit 2 with a diagnosis."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "x = jnp.ones((128,128), jnp.float32)\n"
        "assert np.asarray(x @ x)[0,0] == 128.0\n"
        "print('HEALTHY', jax.devices()[0], flush=True)\n")
    for i in range(attempts):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout)
            if "HEALTHY" in r.stdout:
                print(f"# subprocess health probe OK "
                      f"({time.time() - t0:.1f}s): "
                      f"{r.stdout.strip()}", file=sys.stderr, flush=True)
                return
            print(f"# health probe attempt {i + 1}/{attempts} failed "
                  f"(rc={r.returncode}): {r.stderr.strip()[-400:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# health probe attempt {i + 1}/{attempts} timed out "
                  f"after {timeout}s (tunnel wedged in plugin init)",
                  file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(spacing)
    print("# FATAL: TPU tunnel unhealthy after "
          f"{attempts} subprocess probes -- aborting bench",
          file=sys.stderr, flush=True)
    sys.exit(2)


def _prep_backend():
    """Persistent compile cache (first compiles are minutes through the
    remote compiler; reruns should not repay them) + a tiny health check
    so a wedged remote service fails fast and visibly instead of hanging
    inside the first engine compile.  The check runs under SIGALRM: a
    wedged-but-connected tunnel otherwise blocks jnp dispatch FOREVER
    (observed round 3: multi-hour service outage where even a 128x128
    matmul never returned), and the driver would record a silent hang
    instead of an actionable error."""
    _subprocess_health_probe()
    import signal
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/gaunegf_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:                      # cache is best-effort
        print(f"# compile cache unavailable: {e}", file=sys.stderr)

    def _alarm(signum, frame):
        raise TimeoutError("TPU health check exceeded 600 s")

    t0 = time.time()
    old = None
    try:
        old = signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(600)
    except ValueError:                          # non-main thread
        pass
    try:
        x = jnp.ones((128, 128), jnp.float32)
        assert np.asarray(x @ x)[0, 0] == 128.0
    except TimeoutError as e:
        print(f"# FATAL: {e} -- backend/tunnel wedged, aborting bench",
              file=sys.stderr)
        sys.exit(2)
    finally:
        if old is not None:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)
    print(f"# health check OK ({time.time() - t0:.1f}s, "
          f"{jax.devices()[0]})", file=sys.stderr)


def _median_rate(fn, n_points, repeats):
    """Median points/s over `repeats` timed calls (one warm call first)."""
    fn()                                  # compile + warm
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        assert np.isfinite(out).all()
        rates.append(n_points / dt)
    return float(np.median(rates))


class _stage:
    """Flushed progress + watchdog: a tunnel wedge mid-bench otherwise
    hangs silently past the driver's timeout with an empty tail (the
    MULTICHIP_r03 failure mode).  SIGALRM can only fire between native
    calls, but dispatch through the tunnel returns to Python regularly
    enough in practice; the progress line alone makes a hard hang
    diagnosable."""

    def __init__(self, name, limit=2400):
        self.name, self.limit = name, limit

    def __enter__(self):
        import signal
        print(f"# stage: {self.name} (limit {self.limit}s)",
              file=sys.stderr, flush=True)
        self.t0 = time.time()

        def _alarm(signum, frame):
            raise TimeoutError(
                f"stage '{self.name}' exceeded {self.limit}s")
        try:
            self.old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(self.limit)
        except ValueError:
            self.old = None
        return self

    def __exit__(self, exc_type, exc, tb):
        import signal
        if self.old is not None:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, self.old)
        if exc_type is TimeoutError:
            print(f"# FATAL: {exc} -- aborting bench", file=sys.stderr,
                  flush=True)
            sys.exit(2)
        print(f"# stage done: {self.name} ({time.time() - self.t0:.0f}s)",
              file=sys.stderr, flush=True)


def main():
    _prep_backend()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine

    rng = np.random.default_rng(0)

    def system(N):
        H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
            + np.diag(0.2 * rng.standard_normal(N))
        S = np.eye(N)
        g = ConstantSelfEnergy(H, S, [np.arange(8), np.arange(N - 8, N)],
                               sig1=-0.1j)
        return H, S, g

    # --- primary: N=1000 mixed-precision density sums ------------------
    N, n_E = 1000, 512      # long grid amortizes the ~1.2 s tunnel D2H
    H, S, g = system(N)
    eng = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=64, solver="lu"))
    E = np.linspace(-2.0, 2.0, n_E)
    w = np.ones(n_E)
    with _stage("N=1000 mixed gr_sum"):
        pts_1000 = _median_rate(lambda: eng.gr_sum(E, w), n_E, repeats=5)

    # --- extra 1: N=2000 (the north-star junction size) ----------------
    N2, n_E2 = 2000, 128
    H2, S2, g2 = system(N2)
    eng2 = EnergyEngine(H2, S2, g2, ExecutionConfig(
        precision="mixed", energy_chunk=16, solver="lu"))
    E2 = np.linspace(-2.0, 2.0, n_E2)
    with _stage("N=2000 mixed gr_sum"):
        pts_2000 = _median_rate(lambda: eng2.gr_sum(E2, np.ones(n_E2)),
                                n_E2, repeats=5)

    # --- extra 2: N=2000 production density path (device-side Im epilog:
    # the transfer is half of extra 1's -- this is what SCF actually runs)
    with _stage("N=2000 mixed gr_sum, Im epilog"):
        pts_2000_im = _median_rate(
            lambda: eng2.gr_sum(E2, np.ones(n_E2), epilog="im"),
            n_E2, repeats=3)

    # --- extra 3: low-rank T(E) sweep on the N=1000 junction -----------
    with _stage("N=1000 low-rank T(E)"):
        pts_trans = _median_rate(lambda: eng.transmission(E), n_E,
                                 repeats=3)

    # --- spectral solver (round 4): one host eigh per Fock + rank-k
    # Woodbury per point (ops/spectral.py).  Timed on the SAME grids; the
    # headline takes the better of the two solvers (the metric is G(E)
    # throughput at the mixed contract, solver-agnostic).  Falls back to
    # the LU numbers if the route declines.
    pts_1000_sp = pts_2000_sp = pts_trans_sp = None
    eigh_s_1000 = eigh_s_2000 = None
    try:
        with _stage("N=1000 spectral gr_sum"):
            t0 = time.time()
            eng_sp = EnergyEngine(H, S, g, ExecutionConfig(
                precision="mixed", energy_chunk=64, solver="spectral"))
            if eng_sp._spectral_runner() is not None:
                eigh_s_1000 = round(time.time() - t0, 1)  # once per Fock
                pts_1000_sp = _median_rate(lambda: eng_sp.gr_sum(E, w),
                                           n_E, repeats=5)
        if pts_1000_sp is not None:
            with _stage("N=1000 spectral T(E)"):
                pts_trans_sp = _median_rate(
                    lambda: eng_sp.transmission(E), n_E, repeats=3)
        with _stage("N=2000 spectral gr_sum"):
            t0 = time.time()
            eng2_sp = EnergyEngine(H2, S2, g2, ExecutionConfig(
                precision="mixed", energy_chunk=16, solver="spectral"))
            if eng2_sp._spectral_runner() is not None:
                eigh_s_2000 = round(time.time() - t0, 1)
                pts_2000_sp = _median_rate(
                    lambda: eng2_sp.gr_sum(E2, np.ones(n_E2)),
                    n_E2, repeats=5)
    except Exception as e:                       # never lose the LU numbers
        print(f"# spectral solver stage failed: {e!r}", file=sys.stderr,
              flush=True)

    # --- anchors: separate session variance from code regressions ------
    with _stage("anchors"):
        anchor_mm = _measure_anchor_matmul()
        anchor_solve = _measure_anchor_solve(EnergyEngine, ExecutionConfig,
                                             system)
    # Normalize by the MATMUL anchor only: it is code-independent (raw
    # jnp.matmul), so its ratio isolates session/tunnel variance.  The
    # solve anchor goes through EnergyEngine and therefore moves with
    # genuine code improvements (round 3: device-resident operands lifted
    # it 458 -> 629 pts/s on a session whose matmul anchor was 0.80x) --
    # averaging it in would divide real gains away.  It stays reported as
    # a solve-path regression probe.
    anchor_ratio = (anchor_mm / ANCHOR_REF_MATMUL_GFLOPS
                    if ANCHOR_REF_MATMUL_GFLOPS else 1.0)

    best_1000 = max(pts_1000, pts_1000_sp or 0.0)
    best_2000 = max(pts_2000, pts_2000_sp or 0.0)
    print(json.dumps({
        "metric": "energy points/sec, 1000-orbital G(E) solves (mixed precision)",
        "value": round(best_1000, 2),
        "unit": "points/s",
        "vs_baseline": round(best_1000 / CPU_BASELINE_PTS_PER_SEC, 2),
        "extra": {
            "n1000_lu_pts_per_s": round(pts_1000, 2),
            "n1000_spectral_pts_per_s":
                None if pts_1000_sp is None else round(pts_1000_sp, 2),
            "n2000_spectral_pts_per_s":
                None if pts_2000_sp is None else round(pts_2000_sp, 2),
            # host eigh + detection, paid once per Fock matrix (amortized
            # across an SCF cycle's grids; excluded from the rates above)
            "spectral_setup_s_n1000": eigh_s_1000,
            "spectral_setup_s_n2000": eigh_s_2000,
            "headline_solver":
                "spectral" if best_1000 != pts_1000 else "lu",
            "n2000_mixed_pts_per_s": round(pts_2000, 2),
            "n2000_mixed_im_pts_per_s": round(pts_2000_im, 2),
            "transmission_lowrank_pts_per_s": round(pts_trans, 2),
            "transmission_spectral_pts_per_s":
                None if pts_trans_sp is None else round(pts_trans_sp, 2),
            "anchor_matmul_gflops": round(anchor_mm, 1),
            "anchor_solve_pts_per_s": round(anchor_solve, 2),
            "anchor_ratio": round(anchor_ratio, 4),
            "value_normalized": round(best_1000 / anchor_ratio, 2),
            "n2000_mixed_normalized": round(pts_2000 / anchor_ratio, 2),
            "n2000_best_normalized": round(best_2000 / anchor_ratio, 2),
            # North star: >=10x a 64-core CPU at N=2000 (modeled
            # denominator, see CPU_64CORE_N2000_EST).  The 8-chip
            # projection assumes linear energy-axis scaling: the sharded
            # engine is one psum of an (N,N) partial sum per dispatch
            # (sharded==serial proven by dryrun_multichip), so for long
            # grids the collective cost is amortized to ~0.
            "vs_64core_est": round(best_2000 / CPU_64CORE_N2000_EST, 2),
            "vs_64core_est_8chip_proj": round(
                8 * best_2000 / CPU_64CORE_N2000_EST, 2),
        },
    }))


if __name__ == "__main__":
    main()
