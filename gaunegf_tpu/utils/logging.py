"""Structured logging, performance spans and profiler hooks.

Replaces the reference's ad-hoc per-host/per-PID file logger
(integrate.py:22-49) with a first-class observability module (SURVEY.md
section 5 "tracing/profiling"):

* ``get_logger``   -- namespaced loggers, configured once from config
  (LOG_LEVEL / LOG_PERFORMANCE); when performance logging is enabled, a
  per-host per-PID file ``gaunegf_perf_<host>_<pid>.log`` is attached
  (same discoverability as the reference's integrate_performance files).
* ``perf_span``    -- context manager timing a labelled region, logging
  wall time and device count; used by the energy engines to record each
  dispatch (sizes, chunking, mesh shape) like integrate.py:103-141 logs
  its vmap/batched decisions.
* ``profile_trace``-- context manager around jax.profiler.trace for
  on-demand XLA traces (the reference has no profiler integration).
"""

from __future__ import annotations

import contextlib
import logging
import os
import socket
import tempfile
import time

__all__ = ["get_logger", "perf_span", "profile_trace"]

_CONFIGURED = False


def _configure_root():
    global _CONFIGURED
    if _CONFIGURED:
        return
    from gaunegf_tpu.config import LOG_LEVEL, LOG_PERFORMANCE

    root = logging.getLogger("gaunegf_tpu")
    root.setLevel(getattr(logging, str(LOG_LEVEL).upper(), logging.INFO))
    if LOG_PERFORMANCE and not root.handlers:
        host = socket.gethostname()
        pid = os.getpid()
        path = os.path.join(os.getcwd(), f"gaunegf_perf_{host}_{pid}.log")
        try:
            handler = logging.FileHandler(path, mode="a")
        except OSError:
            path = os.path.join(tempfile.gettempdir(),
                                f"gaunegf_perf_{host}_{pid}.log")
            handler = logging.FileHandler(path, mode="a")
        handler.setFormatter(logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s"))
        root.addHandler(handler)
    _CONFIGURED = True


def get_logger(name: str = "gaunegf_tpu") -> logging.Logger:
    _configure_root()
    if not name.startswith("gaunegf_tpu"):
        name = f"gaunegf_tpu.{name}"
    return logging.getLogger(name)


@contextlib.contextmanager
def perf_span(label: str, logger: logging.Logger | None = None, **fields):
    """Time a region and log '<label> took <dt>s <fields>' at DEBUG."""
    log = logger or get_logger("perf")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        extra = " ".join(f"{k}={v}" for k, v in fields.items())
        log.debug(f"{label} took {dt:.3f}s {extra}".rstrip())


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
