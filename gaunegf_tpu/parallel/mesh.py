"""Device-mesh construction and sharding helpers.

The reference has no distributed backend at all (SURVEY.md section 2.2: its only
parallelism is one host's multiprocessing.Pool, density.py:121-210).  Here
the energy grid -- the workload's "long axis" -- is sharded across a 1-D
``jax.sharding.Mesh`` over ICI; the only collectives the physics needs are
``psum`` of partial weighted density sums and ``all_gather`` of per-energy
observables, both emitted by shard_map in ops/greens.py.

A second 'm' (model) axis is reserved for sharding the orbital dimension of
very large junctions (column-sharded RHS solves); energy sharding is the
primary axis (embarrassingly parallel, zero communication until the final
reduction).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["energy_mesh", "local_device_count", "ENERGY_AXIS", "MODEL_AXIS"]

ENERGY_AXIS = "e"
MODEL_AXIS = "m"


def local_device_count() -> int:
    return len(jax.devices())


def energy_mesh(n_devices: Optional[int] = None,
                devices=None,
                model_parallel: int = 1) -> Mesh:
    """Build an ('e', 'm') mesh; energy axis spans n_devices // model_parallel.

    With the default ``model_parallel=1`` this is a pure energy-data-parallel
    mesh -- each device owns a slice of the quadrature grid.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    n = devices.size
    assert n % model_parallel == 0, (n, model_parallel)
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (ENERGY_AXIS, MODEL_AXIS))
