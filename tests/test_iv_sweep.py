"""Finite-bias I-V sweep with per-point SCF, sharded over the mesh
(BASELINE config 5 at test scale)."""

import numpy as np
import pytest

from gaunegf_tpu import transport as tr
from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.fock import TightBindingFock
from gaunegf_tpu.parallel.mesh import energy_mesh
from gaunegf_tpu.scfe import NEGFE


def test_iv_sweep_sharded(tmp_path):
    n = 10
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    be = TightBindingFock(H0, n_electrons=n, U=0.3, n0=0.5 * np.ones(n))
    mesh = energy_mesh()
    negfe = NEGFE(be, name=str(tmp_path / "iv"), verbose=False,
                  exec_cfg=ExecutionConfig(energy_chunk=8), mesh=mesh)
    negfe.setSigma([1, 2], [9, 10], sig=-0.15j, T=0)
    negfe.setIntegralLimits(N1=64, N2=32, Nnegf=48)
    currents = []
    for qV in (0.0, 0.2, 0.4):
        negfe.setVoltage(qV, fermi=0.0)
        negfe.SCF(conv=1e-3, damping=0.05, max_cycles=60, checkpoint=False)
        assert negfe.conv_level < 1e-3, qV
        I = tr.calculate_current(negfe.F_eV, negfe.S,
                                 tr.SigmaSource(negfe.g),
                                 fermi=0.0, qV=qV, T=0, dE=0.01, mesh=mesh)
        currents.append(I)
    assert currents[0] == 0.0
    # monotone increase over this window for a clean conductor
    assert currents[2] > currents[1] > 0

    # sharded I-V equals unsharded
    negfe.setVoltage(0.4, fermi=0.0)
    I_serial = tr.calculate_current(negfe.F_eV, negfe.S,
                                    tr.SigmaSource(negfe.g),
                                    fermi=0.0, qV=0.4, T=0, dE=0.01)
    assert abs(I_serial - currents[2]) < 1e-12
