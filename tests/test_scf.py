"""SCF drivers: Gaussian-free self-consistency with the TB mean-field
backend; analytic (NEGF) vs contour (NEGFE) equivalence; checkpoints."""

import numpy as np
import pytest

from gaunegf_tpu.models.fock import MatrixFock, TightBindingFock
from gaunegf_tpu.scf import NEGF
from gaunegf_tpu.scfe import NEGFE


def make_backend(n=12, U=0.5, ne=None):
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    H0 += np.diag(0.3 * np.cos(np.arange(n)))      # mild disorder
    return TightBindingFock(H0, n_electrons=(n if ne is None else ne), U=U,
                            n0=0.5 * np.ones(n))


def test_scf_converges_fixed_fermi(tmp_path):
    be = make_backend(U=0.5)
    negf = NEGF(be, name=str(tmp_path / "tb"), verbose=False)
    negf.setSigma(lContact := [1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    counts, electrons, energies = negf.SCF(conv=1e-6, damping=0.05,
                                           max_cycles=200)
    assert negf.conv_level < 1e-6
    # density must be self-consistent: rebuild F and recompute P
    F1 = negf.F.copy()
    negf.FockToP()
    negf.backend.store_density(negf.P)
    F2, _ = negf.backend.fock(negf.P)
    assert np.max(np.abs(F1 - F2)) < 1e-4


def test_scf_updates_fermi_to_match_electrons(tmp_path):
    be = make_backend(U=0.3)
    negf = NEGF(be, name=str(tmp_path / "tbf"), verbose=False)
    negf.setSigma([1], [12], sig=-0.1j)
    negf.setVoltage(0.0)           # fermi=nan -> update each cycle
    negf.SCF(conv=1e-5, damping=0.05, max_cycles=200)
    assert abs(negf.nelec - be.n_electrons) < 1e-2


def test_negf_vs_negfe_equivalence(tmp_path):
    """Analytic constant-sigma density (NEGF) must equal the contour-
    integrated density (NEGFE) for the same system at T=0."""
    be1 = make_backend(U=0.0)
    negf = NEGF(be1, name=str(tmp_path / "a"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.4, Eminf=-1000.0)
    negf.FockToP()
    P_analytic = negf.P.copy()

    be2 = make_backend(U=0.0)
    negfe = NEGFE(be2, name=str(tmp_path / "b"), verbose=False)
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=256, N2=512)
    negfe.setVoltage(0.0, fermi=0.4, Eminf=-1000.0)
    negfe.FockToP()
    P_contour = negfe.P.copy()
    assert np.max(np.abs(P_analytic - P_contour)) < 1e-4


def test_negfe_scf_constant_sigma(tmp_path):
    be = make_backend(U=0.4)
    negfe = NEGFE(be, name=str(tmp_path / "e"), verbose=False)
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=100, N2=64)
    negfe.setVoltage(0.0, fermi=0.3)
    negfe.SCF(conv=1e-5, damping=0.05, max_cycles=200)
    assert negfe.conv_level < 1e-5


def test_negfe_bias_window(tmp_path):
    """Finite bias adds the G< window; total electron count grows with the
    left-contact filling (sanity, not a golden)."""
    be = make_backend(U=0.0)
    negfe = NEGFE(be, name=str(tmp_path / "v"), verbose=False)
    negfe.setSigma([1, 2], [11, 12], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=100, N2=64)
    negfe.setVoltage(0.4, fermi=0.0)
    assert negfe.mu1 == pytest.approx(0.2)
    assert negfe.mu2 == pytest.approx(-0.2)
    negfe.FockToP()
    assert np.isfinite(negfe.P).all()
    # Hermiticity of the density to reasonable accuracy
    assert np.max(np.abs(negfe.P - negfe.P.conj().T)) < 1e-3


def test_scf_checkpoint_roundtrip(tmp_path):
    name = str(tmp_path / "ck")
    be = make_backend(U=0.5)
    negf = NEGF(be, name=name, verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-3, damping=0.05, max_cycles=4, checkpoint=True)
    import os
    assert os.path.exists(name + "_P.mat")

    # resume: a fresh driver picks up the checkpoint density
    be2 = make_backend(U=0.5)
    negf2 = NEGF(be2, name=name, verbose=False)
    negf2.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf2.setVoltage(0.0, fermi=0.0)
    negf2.SCF(conv=1e-6, damping=0.05, max_cycles=300, checkpoint=True)
    assert negf2.conv_level < 1e-6
    assert os.path.exists(name + "_Final.mat")


def test_final_checkpoint_holds_converged_density(tmp_path):
    """*_Final.mat must contain the density the run converged to, not the
    previous cycle's (ADVICE round 1: save must precede the break)."""
    from gaunegf_tpu.io import checkpoint as ckpt
    name = str(tmp_path / "fin")
    be = make_backend(U=0.5)
    negf = NEGF(be, name=name, verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-6, damping=0.05, max_cycles=300, checkpoint=True)
    assert negf.conv_level < 1e-6
    P_final, conv = ckpt.load_density(name + "_Final.mat")
    assert np.max(np.abs(P_final - negf.P)) < 1e-10
    assert conv == pytest.approx(negf.conv_level)


def test_save_mat_roundtrip(tmp_path):
    from gaunegf_tpu import transport as tr
    be = make_backend(U=0.0)
    negf = NEGF(be, name=str(tmp_path / "sm"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.1, fermi=0.0)
    negf.FockToP()
    mat = str(tmp_path / "out.mat")
    negf.saveMAT(mat)
    I = tr.currentF(mat, dE=0.01)
    assert np.isfinite(I)

    mf = MatrixFock(filename=mat)
    assert mf.F0.shape == negf.F.shape


def test_matrix_fock_backend(tmp_path):
    n = 8
    F = np.diag(np.linspace(-1, 1, n))
    mf = MatrixFock(F=F, n_electrons=4)
    negf = NEGF(mf, name=str(tmp_path / "m"), verbose=False)
    negf.setSigma([1], [8], sig=-0.05j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-6, max_cycles=5)
    # fixed Fock: converges immediately (dE = 0 after first rebuild)
    assert negf.conv_level < 1e-6


def test_pulay_degenerate_window_falls_back_to_damping(tmp_path):
    """A converged-to-noise-floor density makes the DIIS residual window
    singular (identical residual vectors); PMix must fall back to the
    damped step instead of raising LinAlgError (the continuation engines
    converge densities to ~1e-15, unlike the reference's scf.py:646)."""
    be = make_backend(U=0.2)
    negf = NEGF(be, name=str(tmp_path / "pd"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.FockToP()
    negf.PMix(0.05, pulay=False)
    P_fixed = negf.P.copy()
    # feed the window identical densities: every residual is identical,
    # p_mat is exactly singular by construction
    for _ in range(len(negf.p_list) + 1):
        negf.P = P_fixed.copy()
        rmsdp, maxdp = negf.PMix(0.05, pulay=True)   # must not raise
    assert np.all(np.isfinite(negf.P))
    np.testing.assert_allclose(negf.P, P_fixed, rtol=0, atol=1e-12)


class FlakyFock:
    """Backend whose fock() raises on chosen calls (a crashed QC
    subprocess mid-SCF) -- the run must skip the cycle and recover
    (reference scf.py:674-679)."""

    def __init__(self, inner, fail_on=(1,)):
        self._inner = inner
        self._fail_on = set(fail_on)
        self._calls = 0

    def __getattr__(self, name):                 # delegate everything else
        return getattr(self._inner, name)

    def fock(self, P):
        self._calls += 1
        if self._calls in self._fail_on:
            raise RuntimeError("simulated backend crash")
        return self._inner.fock(P)


def test_scf_survives_transient_backend_failure(tmp_path, capsys):
    be = FlakyFock(make_backend(U=0.5), fail_on=(2, 3))
    negf = NEGF(be, name=str(tmp_path / "flaky"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    negf.SCF(conv=1e-6, damping=0.05, max_cycles=200)
    assert negf.conv_level < 1e-6          # converged despite the crashes
    assert "CYCLE INVALID" in capsys.readouterr().out
    # and the converged point is genuinely self-consistent
    F1 = negf.F.copy()
    negf.FockToP()
    negf.backend.store_density(negf.P)
    F2, _ = negf.backend.fock(negf.P)
    assert np.max(np.abs(F1 - F2)) < 1e-4


def test_scf_failed_cycle_never_reports_convergence(tmp_path, capsys):
    """An invalid cycle's dE=0 must not satisfy the convergence check:
    with a huge conv every valid cycle converges instantly, so the loop
    must run exactly one extra cycle past the simulated crash."""
    be = FlakyFock(make_backend(U=0.5), fail_on=(1,))
    negf = NEGF(be, name=str(tmp_path / "noearly"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    counts, _, _ = negf.SCF(conv=1e9, damping=0.05, max_cycles=50)
    assert "CYCLE INVALID" in capsys.readouterr().out
    assert len(counts) == 2                # failed cycle + one valid cycle


def test_scf_dead_backend_raises_after_three_failures(tmp_path):
    """A permanently dead backend must error out, not silently iterate to
    the stale-Fock fixed point."""
    be = FlakyFock(make_backend(U=0.5), fail_on=set(range(1, 1000)))
    negf = NEGF(be, name=str(tmp_path / "dead"), verbose=False)
    negf.setSigma([1, 2], [11, 12], sig=-0.1j)
    negf.setVoltage(0.0, fermi=0.0)
    with pytest.raises(RuntimeError, match="simulated backend crash"):
        negf.SCF(conv=1e-6, damping=0.05, max_cycles=50)


def test_set_fock_and_run_dft_parity(tmp_path):
    """setFock converts eV -> backend units (ref scf.py:268-277); runDFT
    reloads the backend's initial Fock (ref scf.py:210-246)."""
    be = make_backend(U=0.5)
    negf = NEGF(be, name=str(tmp_path / "setf"), verbose=False)
    F0 = negf.F.copy()
    F_eV = (F0 + 0.25 * np.eye(negf.nsto)) * negf.f_to_eV
    negf.setFock(F_eV)
    assert np.allclose(negf.F, F0 + 0.25 * np.eye(negf.nsto))
    assert negf.runDFT().shape == F0.shape
    assert np.allclose(negf.F, be.initial_fock())   # refreshed, not stale
