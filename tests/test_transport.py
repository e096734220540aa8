"""Transport layer vs reference goldens + checkpoint/resume roundtrips
(model: tests/test_transport_checkpointing.py in the reference)."""

import os

import numpy as np
import pytest

from gaunegf_tpu import transport as tr
from gaunegf_tpu.config import ExecutionConfig
from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
from gaunegf_tpu.parallel.mesh import energy_mesh

# The stored goldens were generated from the reference's f64 path; the
# 1e-9 asserts hold on the LU engines (pinned below).  The default route
# ('auto' = spectral since round 4) is re-checked once at its own 2e-6
# mixed contract in test_transmission_matches_reference.
_LU = ExecutionConfig(solver="lu")

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden",
                            "golden_v1.npz"))


def _static_system():
    H = GOLD["dens_H"]
    S = np.eye(H.shape[0])
    return H, S, GOLD["trans_sig1"], GOLD["trans_sig2"]


def test_transmission_matches_reference():
    H, S, s1, s2 = _static_system()
    T = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2),
                                  GOLD["trans_E"], exec_cfg=_LU)
    assert np.max(np.abs(T - GOLD["trans_T"])) < 1e-9
    # default route (auto -> spectral) at its own contract
    T_def = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2),
                                      GOLD["trans_E"])
    assert np.max(np.abs(T_def - GOLD["trans_T"])) < 2e-6


def test_transmission_sharded():
    H, S, s1, s2 = _static_system()
    mesh = energy_mesh()
    T = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2),
                                  GOLD["trans_E"], mesh=mesh, exec_cfg=_LU)
    assert np.max(np.abs(T - GOLD["trans_T"])) < 1e-9


def test_dos_matches_reference():
    H, S, s1, s2 = _static_system()
    d, site = tr.calculate_dos(H, S, tr.SigmaSource(s1, s2), GOLD["trans_E"])
    assert np.max(np.abs(d - GOLD["trans_dos_tot"])) < 1e-9
    assert np.max(np.abs(site - GOLD["trans_dos_site"])) < 1e-9


def test_current_matches_reference():
    H, S, s1, s2 = _static_system()
    I = tr.calculate_current(H, S, tr.SigmaSource(s1, s2), fermi=0.0, qV=0.5,
                             T=0, spin="r", dE=0.01)
    assert abs(I - float(GOLD["trans_I"])) < 1e-10
    I300 = tr.calculate_current(H, S, tr.SigmaSource(s1, s2), fermi=0.0,
                                qV=0.5, T=300.0, spin="r", dE=0.01)
    assert abs(I300 - float(GOLD["trans_I_300K"])) < 1e-10


def test_spin_unrestricted_matches_reference():
    H = GOLD["dens_H"]
    n = H.shape[0]
    H2 = np.block([[H, np.zeros_like(H)],
                   [np.zeros_like(H), H + 0.2 * np.eye(n)]])
    S2 = np.eye(2 * n)
    s1u = np.kron(np.eye(2), GOLD["trans_sig1"])
    s2u = np.kron(np.eye(2), GOLD["trans_sig2"])
    Tu, Tspin = tr.calculate_transmission(H2, S2, tr.SigmaSource(s1u, s2u),
                                          GOLD["trans_E"], spin="u")
    assert np.max(np.abs(Tu - GOLD["trans_Tu"])) < 1e-9
    assert np.max(np.abs(Tspin - GOLD["trans_Tspin"])) < 1e-9


def test_spin_expansion_from_nxn():
    """N x N sigmas against 2N x 2N matrices are auto-kron-expanded."""
    H = GOLD["dens_H"]
    n = H.shape[0]
    H2 = np.block([[H, np.zeros_like(H)],
                   [np.zeros_like(H), H + 0.2 * np.eye(n)]])
    S2 = np.eye(2 * n)
    Tu, Tspin = tr.calculate_transmission(
        H2, S2, tr.SigmaSource(GOLD["trans_sig1"], GOLD["trans_sig2"]),
        GOLD["trans_E"], spin="u")
    assert np.max(np.abs(Tu - GOLD["trans_Tu"])) < 1e-9


def test_generalized_spinor_layout():
    """'g' layout: interleaved spinor H related to block form by the fixed
    permutation must give identical total transmission."""
    H = GOLD["dens_H"]
    n = H.shape[0]
    Hb = np.block([[H, np.zeros_like(H)],
                   [np.zeros_like(H), H + 0.2 * np.eye(n)]])
    perm = np.argsort(np.concatenate([np.arange(0, 2 * n, 2),
                                      np.arange(1, 2 * n, 2)]))
    # build the interleaved (spinor) version: block -> spinor reorder
    from gaunegf_tpu.spin import spinor_block_perm
    p = spinor_block_perm(n)
    inv = np.argsort(p)
    Hg = Hb[np.ix_(inv, inv)]
    Sg = np.eye(2 * n)
    s1g = np.kron(GOLD["trans_sig1"], np.eye(2))
    s2g = np.kron(GOLD["trans_sig2"], np.eye(2))
    Tg, Tgspin = tr.calculate_transmission(Hg, Sg, tr.SigmaSource(s1g, s2g),
                                           GOLD["trans_E"], spin="g")
    Tu, _ = tr.calculate_transmission(
        Hb, Sg, tr.SigmaSource(np.kron(np.eye(2), GOLD["trans_sig1"]),
                               np.kron(np.eye(2), GOLD["trans_sig2"])),
        GOLD["trans_E"], spin="u")
    assert np.max(np.abs(Tg - Tu)) < 1e-9


def test_energy_dependent_transmission_dyson_parity():
    """surfG1D-backed transmission vs reference golden (SiNEGF workflow).

    In 'dyson' mode we replicate the reference's surface-GF iteration, so
    the sweep must match its golden everywhere, including the in-band
    energies where that iteration stalls short of the true fixed point."""
    H, S = GOLD["chain_H"], GOLD["chain_S"]
    g = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(4, 8)], eta=1e-4,
                          method="dyson")
    T = tr.calculate_transmission(H, S, tr.SigmaSource(g), GOLD["transE_E"])
    assert np.max(np.abs(T - GOLD["transE_T"])) < 5e-4


def test_energy_dependent_transmission_sancho_physical():
    """In 'sancho' mode (default) the surface GF is exact; transmission must
    agree with the reference away from its non-converged energies and stay
    within physical bounds [0, n_channels] everywhere."""
    H, S = GOLD["chain_H"], GOLD["chain_S"]
    g = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(4, 8)], eta=1e-4)
    T = tr.calculate_transmission(H, S, tr.SigmaSource(g), GOLD["transE_E"])
    diff = np.abs(T - GOLD["transE_T"])
    assert np.median(diff) < 1e-8          # agree where reference converged
    assert np.all(T >= -1e-10)
    assert np.all(T <= 4 + 1e-6)           # 4 orbitals per cell


def test_checkpoint_resume(tmp_path):
    """Write, interrupt, resume: resumed run computes only remaining points
    and the final result matches an uninterrupted run."""
    H, S, s1, s2 = _static_system()
    ckpt = str(tmp_path / "trans.npz")
    E = GOLD["trans_E"]
    full = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2), E)
    # simulate a partial run: mark half the energies done, half placeholder
    part = full.copy()
    part[12:] = -1
    np.savez(ckpt, transmission=part, energy_list=E)
    resumed = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2), E,
                                        checkpoint_file=ckpt,
                                        checkpoint_interval=5)
    assert np.max(np.abs(resumed - full)) < 1e-12
    saved = np.load(ckpt)
    assert np.all(saved["transmission"] != -1)


def test_checkpoint_grid_mismatch(tmp_path):
    """A checkpoint on a different grid is invalidated (fresh restart)."""
    H, S, s1, s2 = _static_system()
    ckpt = str(tmp_path / "trans.npz")
    np.savez(ckpt, transmission=np.zeros(7), energy_list=np.linspace(0, 1, 7))
    E = GOLD["trans_E"]
    T = tr.calculate_transmission(H, S, tr.SigmaSource(s1, s2), E,
                                  checkpoint_file=ckpt, exec_cfg=_LU)
    assert np.max(np.abs(T - GOLD["trans_T"])) < 1e-9


def test_dos_checkpoint_resume(tmp_path):
    H, S, s1, s2 = _static_system()
    ckpt = str(tmp_path / "dos.npz")
    E = GOLD["trans_E"]
    d_full, site_full = tr.calculate_dos(H, S, tr.SigmaSource(s1, s2), E)
    d_part = d_full.copy()
    d_part[10:] = -1
    site_part = site_full.copy()
    site_part[10:] = -1
    np.savez(ckpt, dos_total=d_part, dos_per_site=site_part, energy_list=E)
    d_res, site_res = tr.calculate_dos(H, S, tr.SigmaSource(s1, s2), E,
                                       checkpoint_file=ckpt)
    assert np.max(np.abs(d_res - d_full)) < 1e-12
    assert np.max(np.abs(site_res - site_full)) < 1e-12


def test_legacy_api():
    H, S, s1, s2 = _static_system()
    T = tr.cohTrans(GOLD["trans_E"][:5], H, S, s1, s2, exec_cfg=_LU)
    assert np.max(np.abs(np.asarray(T) - GOLD["trans_T"][:5])) < 1e-9
    d, site = tr.DOS(GOLD["trans_E"][:5], H, S, s1, s2, exec_cfg=_LU)
    assert np.max(np.abs(np.asarray(d) - GOLD["trans_dos_tot"][:5])) < 1e-9
    I = tr.current(H, S, s1, s2, 0.0, 0.5, T=0, spin="r", dE=0.01)
    assert abs(I - float(GOLD["trans_I"])) < 1e-10


def test_current_sign_conventions():
    H, S, s1, s2 = _static_system()
    Ip = tr.calculate_current(H, S, tr.SigmaSource(s1, s2), 0.0, 0.5,
                              T=0, dE=0.01)
    Im = tr.calculate_current(H, S, tr.SigmaSource(s1, s2), 0.0, -0.5,
                              T=0, dE=0.01)
    assert Ip > 0 and Im < 0
    z = tr.calculate_current(H, S, tr.SigmaSource(s1, s2), 0.0, 0.0)
    assert z == 0.0


def test_contact_inds_threshold_boundary():
    """_StaticSigma.contact_inds: weak-but-real couplings stay in the
    support; sub-threshold rows truncate with a bounded (<=1e-6 relative)
    effect on T(E); dense fallback when the support is too wide."""
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.transport import SigmaSource, calculate_transmission

    n, nc = 32, 3
    sig1 = np.zeros((n, n), complex)
    sig1[np.ix_(range(nc), range(nc))] = -0.1j * np.eye(nc)
    sig1[nc, nc] = -0.1j * 1e-5          # weak but ABOVE the 1e-6 cutoff
    sig1[nc + 1, nc + 1] = -0.1j * 1e-8  # below the cutoff: truncated
    sig2 = np.zeros((n, n), complex)
    sig2[np.ix_(range(n - nc, n), range(n - nc, n))] = -0.1j * np.eye(nc)

    src = SigmaSource(sig1, sig2)
    inds1 = src.provider.contact_inds(0)
    assert nc in inds1, "1e-5-relative coupling must stay in the support"
    assert nc + 1 not in inds1, "sub-threshold row must be truncated"

    # truncation error bound: low-rank vs dense transmission
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)
    E = np.linspace(-1.5, 1.5, 16)
    T_lr = calculate_transmission(H, S, src, E)
    T_dense = calculate_transmission(H, S, src, E,
                                     exec_cfg=ExecutionConfig(
                                         use_lowrank=False))
    rel = np.abs(T_lr - T_dense).max() / max(np.abs(T_dense).max(), 1e-30)
    assert rel < 1e-5, rel

    # support wider than half the orbitals -> dense (None)
    wide = np.diag(np.full(n, -0.1j))
    assert SigmaSource(wide, sig2).provider.contact_inds(0) is None
    # empty Gamma -> None
    assert SigmaSource(np.zeros((n, n)), sig2).provider.contact_inds(0) \
        is None


def test_single_energy_wrappers_match_sweeps():
    """transmission_single_energy / dos_single_energy (reference
    transport.py:193-375) agree with the batched sweeps and return the
    reference's shapes: float / (float, per_site) for 'r', 4-channel
    lists and per-spin site arrays for 'u'."""
    H, S, s1, s2 = _static_system()
    src = tr.SigmaSource(s1, s2)
    E0 = float(GOLD["trans_E"][3])
    T0 = tr.transmission_single_energy(E0, H, S, src)
    assert isinstance(T0, float)
    assert abs(T0 - GOLD["trans_T"][3]) < 1e-9
    d0, site0 = tr.dos_single_energy(E0, H, S, src)
    assert abs(d0 - GOLD["trans_dos_tot"][3]) < 1e-9
    assert np.max(np.abs(site0 - GOLD["trans_dos_site"][3])) < 1e-9

    n = H.shape[0]
    H2 = np.block([[H, np.zeros_like(H)],
                   [np.zeros_like(H), H + 0.2 * np.eye(n)]])
    S2 = np.eye(2 * n)
    srcu = tr.SigmaSource(np.kron(np.eye(2), s1), np.kron(np.eye(2), s2))
    Tu, Tch = tr.transmission_single_energy(E0, H2, S2, srcu, spin="u")
    assert len(Tch) == 4 and abs(Tu - sum(Tch)) < 1e-12
    assert abs(Tu - GOLD["trans_Tu"][3]) < 1e-9
    du, siteu, up, dn = tr.dos_single_energy(E0, H2, S2, srcu, spin="u")
    assert siteu.shape == (2 * n,) and up.shape == (n,) and dn.shape == (n,)
    assert abs(du - (up.sum() + dn.sum())) < 1e-10
