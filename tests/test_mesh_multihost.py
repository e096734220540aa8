"""Multi-host bootstrap logic: env detection + device-grid construction.

VERDICT round-1 item 5 / SURVEY.md section 2.2 "Distributed communication
backend": the mesh layer must arrange a *global* device set (energy axis
across hosts/DCN, model axis within a host/ICI) and bootstrap
jax.distributed from standard environment variables.  These tests exercise
the pure construction logic with mocked devices and environments -- no
cluster needed.
"""

import numpy as np
import pytest

from gaunegf_tpu.parallel import mesh as pm


class FakeDev:
    def __init__(self, i, proc):
        self.id = i
        self.process_index = proc

    def __repr__(self):
        return f"d{self.id}@p{self.process_index}"


def _fleet(n_procs, per_proc):
    return [FakeDev(p * per_proc + i, p)
            for p in range(n_procs) for i in range(per_proc)]


def test_device_grid_single_host():
    devs = _fleet(1, 8)
    grid = pm.device_grid(devs, model_parallel=2)
    assert grid.shape == (4, 2)
    # m-tuples are contiguous device pairs
    assert [d.id for d in grid[0]] == [0, 1]


def test_device_grid_multihost_m_axis_stays_intra_host():
    devs = _fleet(4, 4)                    # 4 processes x 4 local devices
    grid = pm.device_grid(devs, model_parallel=4)
    assert grid.shape == (4, 4)
    for row in grid:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, "m axis must not straddle hosts"


def test_device_grid_rejects_m_straddling_hosts():
    devs = _fleet(2, 4)                    # 8 devices, 4 per host
    with pytest.raises(ValueError, match="model axis"):
        pm.device_grid(devs, model_parallel=8)


def test_device_grid_energy_axis_spans_hosts():
    devs = _fleet(2, 4)
    grid = pm.device_grid(devs, model_parallel=2)
    assert grid.shape == (4, 2)
    procs_by_row = [row[0].process_index for row in grid]
    assert procs_by_row == [0, 0, 1, 1]    # energy axis crosses hosts


def test_distributed_env_explicit():
    env = {"GAUNEGF_COORDINATOR": "10.0.0.1:1234",
           "GAUNEGF_NUM_PROCESSES": "4", "GAUNEGF_PROCESS_ID": "2"}
    spec = pm.distributed_env(env)
    assert spec == {"coordinator_address": "10.0.0.1:1234",
                    "num_processes": 4, "process_id": 2}


def test_distributed_env_jax_vars():
    env = {"JAX_COORDINATOR_ADDRESS": "head:99",
           "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "0"}
    assert pm.distributed_env(env)["num_processes"] == 2


def test_distributed_env_slurm():
    env = {"SLURM_JOB_NODELIST": "tpu[001-004]", "SLURM_NTASKS": "4",
           "SLURM_PROCID": "3"}
    spec = pm.distributed_env(env)
    assert spec["coordinator_address"] == "tpu001:8476"
    assert spec["num_processes"] == 4 and spec["process_id"] == 3


def test_distributed_env_single_process():
    assert pm.distributed_env({}) is None
    # single-task SLURM allocations are not distributed
    assert pm.distributed_env({"SLURM_JOB_NODELIST": "n1",
                               "SLURM_NTASKS": "1"}) is None


def test_first_slurm_node_forms():
    assert pm._first_slurm_node("n1") == "n1"
    assert pm._first_slurm_node("n[007-009]") == "n007"
    assert pm._first_slurm_node("gpu[3,5-9],cpu1") == "gpu3"


def test_initialize_distributed_calls_jax(monkeypatch):
    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    import jax
    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setattr(pm, "_initialized", False)
    env = {"GAUNEGF_COORDINATOR": "c:1", "GAUNEGF_NUM_PROCESSES": "2",
           "GAUNEGF_PROCESS_ID": "1"}
    assert pm.initialize_distributed(env) is True
    assert calls == {"addr": "c:1", "n": 2, "pid": 1}
    # idempotent: second call must not re-initialize
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: (_ for _ in ()).throw(
                            AssertionError("re-initialized")))
    assert pm.initialize_distributed(env) is True


def test_initialize_distributed_noop_single_process(monkeypatch):
    import jax
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: (_ for _ in ()).throw(AssertionError("initialized")))
    assert pm.initialize_distributed({}) is False


def test_energy_mesh_shape_unchanged():
    """Regression: the public single-host construction is unchanged."""
    m = pm.energy_mesh()
    assert m.shape[pm.ENERGY_AXIS] * m.shape[pm.MODEL_AXIS] == 8
    m2 = pm.energy_mesh(model_parallel=2)
    assert m2.shape[pm.MODEL_AXIS] == 2
