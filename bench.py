"""Headline benchmark: energy points/sec for 1000-orbital G(E) solves.

Matches the driver-defined metric (BASELINE.json): throughput of dense
complex retarded Green's function solves G(E) = (E*S - H - Sigma)^-1 at
N = 1000 orbitals, batched over the energy grid, at the production 'mixed'
accuracy contract (~1e-6 vs f64), best of the two production solvers
(spectral: one host eigh per Fock + rank-k Woodbury per point; LU: blocked
complex LU + double-float-residual refinement).

vs_baseline compares against the measured reference-equivalent CPU path on
this host (jax CPU, complex128 vmapped jnp.linalg.solve exactly like
gauNEGF/integrate.py:67-109's vmap branch): 5.0 points/s on the 1 available
CPU core (see BASELINE.md for methodology and a 64-core extrapolation).

Emission protocol (round 5): the JSON result line is printed after EVERY
completed stage with the best numbers so far -- a driver timeout mid-run
still leaves a parseable final line (BENCH_r03/r04 were lost to a single
end-of-run emission).  Stages are ordered headline-first (spectral, the
faster solver) and LU stages last; two consecutive stage timeouts end the
run early with whatever was measured.
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
# session.  The matmul anchor is code-independent (raw jnp.matmul), so its
# ratio to the round-3 calibration session isolates session/tunnel
# variance; value_normalized = value / anchor_ratio.  The solve anchor
# goes through EnergyEngine and moves with genuine code improvements, so
# it is reported but NOT folded into the normalization.
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


def _subprocess_health_probe(timeout=480, attempts=2, spacing=60):
    """Probe TPU health in a SUBPROCESS before the parent touches JAX.

    The round-3/4 outage mode is an UNINTERRUPTIBLE hang inside the axon
    plugin's device-client creation: SIGALRM never fires (the hang is in
    native init, before any Python bytecode runs again), so an in-process
    guard cannot convert the hang into a fast failure -- the driver would
    record a silent timeout instead of rc=2.  A subprocess with a kill
    timeout is immune.  On repeated failure, exit 2 with a diagnosis.
    Budget is capped (round-4 postmortem: a 381 s probe + end-only JSON
    emission left the driver with nothing parseable)."""
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
    remote compiler; reruns should not repay them) + a tiny in-process
    health check so a wedged remote service fails fast and visibly
    instead of hanging inside the first engine compile."""
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


class _StageTimeout(Exception):
    pass


class _Bench:
    """Stage runner with incremental JSON emission.

    Every completed stage re-prints the (updated) result line to stdout,
    so the last JSON line is always the best-so-far snapshot.  A stage
    timeout or error skips that stage; two CONSECUTIVE timeouts mean the
    tunnel has degenerated -- stop and keep what we have."""

    def __init__(self):
        self.r = {}          # raw measurements by key
        self.consec_timeouts = 0
        self.emitted = False

    def run(self, name, fn, limit=1200):
        import signal
        print(f"# stage: {name} (limit {limit}s)", file=sys.stderr,
              flush=True)
        t0 = time.time()

        def _alarm(signum, frame):
            raise _StageTimeout(f"stage '{name}' exceeded {limit}s")
        try:
            old = signal.signal(signal.SIGALRM, _alarm)
            signal.alarm(limit)
        except ValueError:
            old = None
        try:
            fn()
        except _StageTimeout as e:
            self.consec_timeouts += 1
            print(f"# TIMEOUT: {e} (consecutive: {self.consec_timeouts})",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"# stage '{name}' failed: {e!r}", file=sys.stderr,
                  flush=True)
        else:
            self.consec_timeouts = 0
            print(f"# stage done: {name} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
        finally:
            if old is not None:
                signal.alarm(0)
                signal.signal(signal.SIGALRM, old)
        self.emit()
        if self.consec_timeouts >= 2:
            print("# two consecutive stage timeouts -- ending bench early "
                  "with the numbers measured so far", file=sys.stderr,
                  flush=True)
            sys.exit(0 if self.emitted and self._best_1000() else 2)

    def _best_1000(self):
        vals = [self.r.get("n1000_lu"), self.r.get("n1000_sp")]
        vals = [v for v in vals if v]
        return max(vals) if vals else None

    def emit(self):
        r = self.r
        best_1000 = self._best_1000()
        if best_1000 is None:
            return                       # nothing headline-worthy yet
        vals_2000 = [v for v in (r.get("n2000_lu"), r.get("n2000_sp")) if v]
        best_2000 = max(vals_2000) if vals_2000 else None
        anchor_mm = r.get("anchor_mm")
        anchor_ratio = (anchor_mm / ANCHOR_REF_MATMUL_GFLOPS
                        if anchor_mm else None)

        def rnd(x, k=2):
            return None if x is None else round(x, k)

        extra = {
            "n1000_spectral_pts_per_s": rnd(r.get("n1000_sp")),
            "n1000_lu_pts_per_s": rnd(r.get("n1000_lu")),
            "n2000_spectral_pts_per_s": rnd(r.get("n2000_sp")),
            "n2000_mixed_pts_per_s": rnd(r.get("n2000_lu")),
            "n2000_mixed_im_pts_per_s": rnd(r.get("n2000_im")),
            # host eigh + detection, paid once per Fock matrix (amortized
            # across an SCF cycle's grids; excluded from the rates above)
            "spectral_setup_s_n1000": r.get("setup_1000"),
            "spectral_setup_s_n2000": r.get("setup_2000"),
            "headline_solver": ("spectral"
                                if best_1000 == r.get("n1000_sp") else "lu"),
            "transmission_spectral_pts_per_s": rnd(r.get("trans_sp")),
            "transmission_lowrank_pts_per_s": rnd(r.get("trans_lu")),
            # energy-dependent Sigma workload (VERDICT r4 item 4): 1D-chain
            # decimation contacts, Sancho fixed point per energy point
            # inside the batched dispatch (ref surfG1D.py:223-295 workload)
            "sigmaE_chain_transmission_pts_per_s": rnd(r.get("chain_T")),
            "anchor_matmul_gflops": rnd(anchor_mm, 1),
            "anchor_solve_pts_per_s": rnd(r.get("anchor_solve")),
            "anchor_ratio": rnd(anchor_ratio, 4),
            "value_normalized": rnd(best_1000 / anchor_ratio
                                    if anchor_ratio else None),
            "n2000_best_normalized": rnd(
                best_2000 / anchor_ratio
                if (anchor_ratio and best_2000) else None),
            # North star: >=10x a 64-core CPU at N=2000 (modeled
            # denominator, see CPU_64CORE_N2000_EST).  The 8-chip
            # projection assumes linear energy-axis scaling: the sharded
            # engine is one psum of an (N,N) partial sum per dispatch
            # (sharded==serial proven by dryrun_multichip), so for long
            # grids the collective cost is amortized to ~0.
            "vs_64core_est": rnd(best_2000 / CPU_64CORE_N2000_EST
                                 if best_2000 else None),
            "vs_64core_est_8chip_proj": rnd(
                8 * best_2000 / CPU_64CORE_N2000_EST if best_2000 else None),
        }
        print(json.dumps({
            "metric": "energy points/sec, 1000-orbital G(E) solves "
                      "(mixed precision)",
            "value": round(best_1000, 2),
            "unit": "points/s",
            "vs_baseline": round(best_1000 / CPU_BASELINE_PTS_PER_SEC, 2),
            "extra": extra,
        }), flush=True)
        self.emitted = True


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

    b = _Bench()
    N, n_E = 1000, 512      # long grid amortizes the ~1.2 s tunnel D2H
    H, S, g = system(N)
    E = np.linspace(-2.0, 2.0, n_E)
    w = np.ones(n_E)
    N2, n_E2 = 2000, 128
    H2, S2, g2 = system(N2)
    E2 = np.linspace(-2.0, 2.0, n_E2)
    w2 = np.ones(n_E2)
    holder = {}

    # --- headline: N=1000 spectral gr_sum (the faster solver, round 4) --
    def st_spectral_1000():
        t0 = time.time()
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", energy_chunk=64, solver="spectral"))
        if eng._spectral_runner() is None:
            raise RuntimeError("spectral route declined the system")
        holder["eng_sp"] = eng
        b.r["setup_1000"] = round(time.time() - t0, 1)
        b.r["n1000_sp"] = _median_rate(lambda: eng.gr_sum(E, w), n_E,
                                       repeats=5)
    b.run("N=1000 spectral gr_sum", st_spectral_1000, limit=2000)

    # If spectral declined/hung, get a headline from the LU path NOW so
    # every later emission carries a value.
    if b._best_1000() is None:
        def st_lu_1000_early():
            eng = EnergyEngine(H, S, g, ExecutionConfig(
                precision="mixed", energy_chunk=64, solver="lu"))
            holder["eng_lu"] = eng
            b.r["n1000_lu"] = _median_rate(lambda: eng.gr_sum(E, w), n_E,
                                           repeats=5)
        b.run("N=1000 mixed gr_sum (early fallback)", st_lu_1000_early,
              limit=2000)

    # --- session anchor: normalization available from here on ----------
    def st_anchor_mm():
        b.r["anchor_mm"] = _measure_anchor_matmul()
    b.run("anchor matmul", st_anchor_mm, limit=600)

    # --- N=2000: the north-star junction size --------------------------
    def st_spectral_2000():
        t0 = time.time()
        eng = EnergyEngine(H2, S2, g2, ExecutionConfig(
            precision="mixed", energy_chunk=16, solver="spectral"))
        if eng._spectral_runner() is None:
            raise RuntimeError("spectral route declined the system")
        b.r["setup_2000"] = round(time.time() - t0, 1)
        b.r["n2000_sp"] = _median_rate(lambda: eng.gr_sum(E2, w2), n_E2,
                                       repeats=5)
    b.run("N=2000 spectral gr_sum", st_spectral_2000, limit=1800)

    # --- spectral T(E) on the N=1000 junction --------------------------
    def st_trans_sp():
        eng = holder.get("eng_sp")
        if eng is None:
            raise RuntimeError("no spectral engine")
        b.r["trans_sp"] = _median_rate(lambda: eng.transmission(E), n_E,
                                       repeats=3)
    b.run("N=1000 spectral T(E)", st_trans_sp, limit=1200)

    # --- energy-dependent Sigma stage (VERDICT r4 item 4) --------------
    # 1D-chain junction: two interior unit cells define semi-infinite
    # leads; every energy point runs the Sancho-Rubio decimation fixed
    # point (cell x cell) inside the batched dispatch, then the low-rank
    # transmission.  This is the reference's actual production workload
    # shape (surfG1D.py:223-295 + transport.py:150-157).
    def st_chain():
        from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
        cell = 64
        n = 2 * cell
        Hc = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) + 0.3 * np.eye(n)
        Sc = np.eye(n) + 0.05 * (np.eye(n, k=1) + np.eye(n, k=-1))
        gc = Chain1DSelfEnergy(Hc, Sc, [np.arange(cell),
                                        np.arange(cell, n)], eta=1e-4)
        engc = EnergyEngine(Hc, Sc, gc, ExecutionConfig(
            precision="fast", energy_chunk=64))
        Ec = np.linspace(-3.0, 3.0, 256)
        b.r["chain_T"] = _median_rate(lambda: engc.transmission(Ec),
                                      256, repeats=3)
    b.run("chain-1D Sigma(E) T(E)", st_chain, limit=1200)

    # --- LU solver stages (the slower production solver; kept last) ----
    def st_lu_1000():
        eng = holder.get("eng_lu")
        if eng is None:
            eng = EnergyEngine(H, S, g, ExecutionConfig(
                precision="mixed", energy_chunk=64, solver="lu"))
            holder["eng_lu"] = eng
        b.r["n1000_lu"] = _median_rate(lambda: eng.gr_sum(E, w), n_E,
                                       repeats=5)
    if "n1000_lu" not in b.r:
        b.run("N=1000 mixed gr_sum", st_lu_1000, limit=1800)

    def st_lu_trans():
        eng = holder["eng_lu"]
        b.r["trans_lu"] = _median_rate(lambda: eng.transmission(E), n_E,
                                       repeats=3)
    if "eng_lu" in holder:
        b.run("N=1000 low-rank T(E)", st_lu_trans, limit=1200)

    def st_lu_2000():
        eng = EnergyEngine(H2, S2, g2, ExecutionConfig(
            precision="mixed", energy_chunk=16, solver="lu"))
        holder["eng2_lu"] = eng
        b.r["n2000_lu"] = _median_rate(lambda: eng.gr_sum(E2, w2), n_E2,
                                       repeats=5)
    b.run("N=2000 mixed gr_sum", st_lu_2000, limit=1800)

    def st_lu_2000_im():
        eng = holder["eng2_lu"]
        b.r["n2000_im"] = _median_rate(
            lambda: eng.gr_sum(E2, w2, epilog="im"), n_E2, repeats=3)
    if "eng2_lu" in holder:
        b.run("N=2000 mixed gr_sum, Im epilog", st_lu_2000_im, limit=1200)

    # --- solve-path regression probe (reported, not normalized) --------
    def st_anchor_solve():
        Ha, Sa, ga = system(512)
        eng = EnergyEngine(Ha, Sa, ga, ExecutionConfig(
            precision="fast", energy_chunk=32, lu_block=128, solver="lu"))
        Ea = np.linspace(-2.0, 2.0, 128)
        b.r["anchor_solve"] = _median_rate(
            lambda: eng.gr_sum(Ea, np.ones(128)), 128, repeats=3)
    b.run("anchor solve", st_anchor_solve, limit=900)

    if not b.emitted:
        print("# FATAL: no stage produced a headline number",
              file=sys.stderr, flush=True)
        sys.exit(2)


if __name__ == "__main__":
    main()
