"""Shared scaffolding for one-experiment-per-process device scripts.

Protocol (CLAUDE.md "TPU backend facts" #5): every script health-checks
with a tiny f32 matmul before any real work, enables the persistent
compile cache, and prints flushed progress so a mid-run tunnel wedge is
diagnosable from the log tail.  Timings force a host transfer
(np.asarray) because dispatch is asynchronous through the tunnel.
"""

import sys
import time

import numpy as np


def prep(health_limit=900):
    """Health check + compile cache.  Exits rc=2 on a wedged tunnel."""
    import signal

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/gaunegf_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"compile cache unavailable: {e}")

    def _alarm(signum, frame):
        raise TimeoutError(f"health check exceeded {health_limit}s")

    t0 = time.time()
    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(health_limit)
    try:
        x = jnp.ones((128, 128), jnp.float32)
        assert np.asarray(x @ x)[0, 0] == 128.0
    except TimeoutError as e:
        log(f"FATAL: {e} -- tunnel wedged")
        sys.exit(2)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    log(f"health OK ({time.time() - t0:.1f}s, {jax.devices()[0]})")


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def median_rate(fn, n_points, repeats=3):
    """Median points/s over repeats (one warm call first; asarray-forced)."""
    fn()
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        assert np.isfinite(out).all()
        rates.append(n_points / dt)
    return float(np.median(rates)), rates


def tb_system(N, seed=0, n_contact=8):
    """The bench.py junction fixture (same seed -> comparable numbers)."""
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy

    rng = np.random.default_rng(seed)
    H = -1.0 * (np.eye(N, k=1) + np.eye(N, k=-1)) \
        + np.diag(0.2 * rng.standard_normal(N))
    S = np.eye(N)
    g = ConstantSelfEnergy(
        H, S, [np.arange(n_contact), np.arange(N - n_contact, N)],
        sig1=-0.1j)
    return H, S, g
