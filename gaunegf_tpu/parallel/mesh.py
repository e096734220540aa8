"""Device-mesh construction, sharding helpers and the multi-host bootstrap.

The reference has no distributed backend at all (SURVEY.md section 2.2: its only
parallelism is one host's multiprocessing.Pool, density.py:121-210; it logs
``jax.devices()`` once and never uses them, integrate.py:48-49).  Here the
energy grid -- the workload's "long axis" -- is sharded across the 'e' axis
of a ``jax.sharding.Mesh``; the only collectives the physics needs are
``psum`` of partial weighted density sums and ``all_gather`` of per-energy
observables, both emitted by shard_map in ops/greens.py.

The 'm' (model) axis column-shards the identity RHS of the blocked solve
(ops/zlinalg.zinv_refined_cols) for junctions whose solve should be split
within one energy point.  Axis placement on hardware follows the standard
TPU recipe: 'm' exchanges an O(N^2) all_gather per refinement step, so it
must ride ICI (innermost, within a slice); 'e' reduces once per dispatch,
so it tolerates DCN (outermost, across slices/hosts).

Multi-host: ``initialize_distributed()`` bootstraps ``jax.distributed``
from standard environment variables (explicit JAX_* ones, or a SLURM
allocation), after which ``energy_mesh()`` arranges the *global* device
set.  Every process executes the same program; shard_map + jit handle the
cross-host addressing.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = [
    "energy_mesh", "local_device_count", "initialize_distributed",
    "distributed_env", "ENERGY_AXIS", "MODEL_AXIS",
]

ENERGY_AXIS = "e"
MODEL_AXIS = "m"

_initialized = False


def local_device_count() -> int:
    return len(jax.local_devices())


def distributed_env(environ=None) -> Optional[dict]:
    """Detect a multi-process launch from the environment.

    Recognized (first match wins):
    * explicit: GAUNEGF_COORDINATOR / JAX_COORDINATOR_ADDRESS with
      GAUNEGF_NUM_PROCESSES / JAX_NUM_PROCESSES and GAUNEGF_PROCESS_ID /
      JAX_PROCESS_ID;
    * SLURM: SLURM_STEP_NODELIST/SLURM_JOB_NODELIST + SLURM_NTASKS +
      SLURM_PROCID (coordinator = first node, port 8476 like jax's own
      SLURM cluster detector).

    Returns {"coordinator_address", "num_processes", "process_id"} or
    None for a single-process run.  Pure function of ``environ`` so the
    detection logic is unit-testable without a cluster.
    """
    env = os.environ if environ is None else environ
    coord = env.get("GAUNEGF_COORDINATOR") or env.get(
        "JAX_COORDINATOR_ADDRESS")
    nproc = env.get("GAUNEGF_NUM_PROCESSES") or env.get("JAX_NUM_PROCESSES")
    pid = env.get("GAUNEGF_PROCESS_ID") or env.get("JAX_PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        return {"coordinator_address": coord,
                "num_processes": int(nproc),
                "process_id": int(pid)}
    nodelist = env.get("SLURM_STEP_NODELIST") or env.get(
        "SLURM_JOB_NODELIST")
    if nodelist and env.get("SLURM_NTASKS") and int(env["SLURM_NTASKS"]) > 1:
        first = _first_slurm_node(nodelist)
        return {"coordinator_address": f"{first}:8476",
                "num_processes": int(env["SLURM_NTASKS"]),
                "process_id": int(env.get("SLURM_PROCID", 0))}
    return None


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist ('n[001-004,007],m1' -> 'n001')."""
    base = nodelist.split(",")[0]
    if "[" not in base:
        return base
    prefix, rest = base.split("[", 1)
    first = rest.rstrip("]").split(",")[0].split("-")[0]
    return prefix + first


def initialize_distributed(environ=None, force: bool = False) -> bool:
    """Bootstrap jax.distributed from the environment (idempotent).

    Returns True when running multi-process (after initialize), False for
    a plain single-process session.  Must be called before any jax device
    use when multi-host; ``energy_mesh`` calls it automatically.
    """
    global _initialized
    spec = distributed_env(environ)
    if spec is None:
        return False
    if _initialized and not force:
        return True
    try:
        jax.distributed.initialize(
            coordinator_address=spec["coordinator_address"],
            num_processes=spec["num_processes"],
            process_id=spec["process_id"])
    except RuntimeError as e:
        # the user may have called jax.distributed.initialize() themselves
        # before us; treat an already-initialized client as success
        if "already initialized" not in str(e).lower():
            raise
    _initialized = True
    return True


def device_grid(devices: Sequence, model_parallel: int = 1,
                procs_of=None) -> np.ndarray:
    """Arrange devices into an (e, m) grid, 'm' innermost within a host.

    'm' ranks exchange O(N^2) bytes per refinement step, so the m-axis
    must never straddle hosts/slices: devices are grouped by owning
    process and each group is split into contiguous m-tuples.  Pure
    function (``procs_of`` maps device -> process id; defaults to the
    .process_index attribute) so multi-host layouts are unit-testable
    with mock device objects.
    """
    if procs_of is None:
        procs_of = lambda d: getattr(d, "process_index", 0)
    devices = list(devices)
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by m={model_parallel}")
    by_proc = {}
    for d in devices:
        by_proc.setdefault(procs_of(d), []).append(d)
    rows = []
    for proc in sorted(by_proc):
        group = by_proc[proc]
        if len(group) % model_parallel:
            raise ValueError(
                f"process {proc} has {len(group)} devices, not divisible "
                f"by m={model_parallel}: the model axis must stay within "
                "one host (it rides ICI)")
        for i in range(0, len(group), model_parallel):
            rows.append(group[i:i + model_parallel])
    return np.asarray(rows, dtype=object)


def energy_mesh(n_devices: Optional[int] = None,
                devices=None,
                model_parallel: int = 1) -> Mesh:
    """Build the ('e', 'm') mesh; energy axis spans n_total // model_parallel.

    With the default ``model_parallel=1`` this is a pure energy-data-parallel
    mesh -- each device owns a slice of the quadrature grid.  Multi-host
    launches (detected from the environment, see ``distributed_env``) are
    bootstrapped automatically; the grid then spans the global device set
    with the model axis confined to intra-host ICI groups.
    """
    if devices is None:
        multi = initialize_distributed()
        devices = jax.devices()
        if n_devices is not None:
            if multi and n_devices != len(devices):
                # slicing the global list could drop some processes' local
                # devices, wedging their shard_map calls -- n_devices is a
                # single-host convenience only
                raise ValueError(
                    f"n_devices={n_devices} is not supported in a "
                    f"multi-process run ({len(devices)} global devices); "
                    "pass an explicit `devices` list instead")
            devices = devices[:n_devices]
    grid = device_grid(devices, model_parallel)
    return Mesh(grid, (ENERGY_AXIS, MODEL_AXIS))
