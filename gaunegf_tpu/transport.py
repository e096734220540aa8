"""Transport analysis: transmission, DOS, Landauer current.

Functional parity with gauNEGF/transport.py (SigmaCalculator, the jit
kernels, calculate_transmission/dos/current with npz checkpoint-resume, and
the legacy API).  TPU-first difference: the reference loops energies in
Python one at a time (transport.py:452-454); here every batch of remaining
energies runs through the sharded, vmapped engine (ops/greens.py), and
checkpoints are written per batch.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaunegf_tpu import spin as spinmod
from gaunegf_tpu.config import ENERGY_STEP, N_KT, TEMPERATURE, ExecutionConfig
from gaunegf_tpu.ops.greens import EnergyEngine, _gr_point
from gaunegf_tpu.units import EOVERH, KB

__all__ = [
    "SigmaSource", "calculate_transmission", "calculate_dos",
    "calculate_current", "current", "currentSpin", "currentE", "currentF",
    "cohTrans", "cohTransSpin", "DOS", "cohTransE", "cohTransSpinE", "DOSE",
]

_DEFAULT_EXEC = ExecutionConfig()


# ---------------------------------------------------------------------------
# Static-array provider + unified sigma source (SigmaCalculator parity)
# ---------------------------------------------------------------------------

class _StaticSigma:
    """Provider over two constant self-energy matrices."""

    def __init__(self, sig1, sig2):
        def to_mat(s):
            s = np.asarray(s)
            return np.diag(s) if s.ndim == 1 else s
        self._sigs = np.stack([to_mat(sig1), to_mat(sig2)]).astype(complex)

    def params(self):
        return {"sigs": self._sigs}

    def total_apply(self):
        return _static_total, self.params()

    def contact_apply(self, i):
        return _static_contact(i % 2), self.params()

    REL_SUPPORT_TOL = 1e-6      # relative Gamma row cutoff (see below)

    def contact_inds(self, i=None):
        """Support of Gamma_i for the low-rank contact fast path.

        A row belongs to the support when its Gamma row-max exceeds
        ``REL_SUPPORT_TOL`` (1e-6) of the global peak -- above the
        formSigma ``-1j*1e-9*S`` broadening background for any physical
        coupling scale.  Rows BELOW the cutoff are truncated from the
        low-rank solve: their relative contribution to T(E)/G< is bounded
        by the same 1e-6, i.e. the truncation error matches the 'mixed'
        precision tier's floor (pinned by
        tests/test_transport.py::test_contact_inds_threshold_boundary).
        Returns None (dense path) for an empty Gamma or when the support
        exceeds half the orbitals (no low-rank win); set
        ``ExecutionConfig(use_lowrank=False)`` to force dense exactly."""
        sigs = self._sigs if i is None else self._sigs[i % 2:i % 2 + 1]
        gam = np.abs(1j * (sigs - np.conj(np.swapaxes(sigs, -1, -2))))
        rowmax = gam.max(axis=(0, 2))
        peak = rowmax.max()
        if peak == 0:
            return None
        support = np.where(rowmax > self.REL_SUPPORT_TOL * peak)[0]
        if len(support) > len(rowmax) // 2:
            return None
        return tuple(int(j) for j in support)

    def num_contacts(self):
        return 2


def _static_total(params, E):
    return params["sigs"][0] + params["sigs"][1]


@lru_cache(maxsize=None)
def _static_contact(i: int):
    def fn(params, E):
        return params["sigs"][i]
    return fn


class SigmaSource:
    """Unified interface over static arrays and energy-dependent providers.

    Parity with transport.SigmaCalculator (transport.py:40-146) including
    auto-detection of energy dependence (duck-typing on .sigma/.sigmaTot or
    the native total_apply protocol) and spin expansion when the device
    matrices are 2N x 2N but the sigmas are N x N.
    """

    def __init__(self, sig1, sig2=None, energy_dependent: Optional[bool] = None):
        self.raw1, self.raw2 = sig1, sig2
        if energy_dependent is None:
            energy_dependent = hasattr(sig1, "total_apply") or (
                hasattr(sig1, "sigma") and hasattr(sig1, "sigmaTot"))
        self.energy_dependent = bool(energy_dependent)
        if self.energy_dependent:
            if sig2 is not None:
                raise ValueError("For energy-dependent calculations, provide "
                                 "only the provider as sig1")
            self.provider = sig1
        else:
            if sig2 is None:
                raise ValueError("For energy-independent calculations, "
                                 "provide both sig1 and sig2")
            self.provider = _StaticSigma(sig1, sig2)

    def provider_for(self, spin: str, matrix_size: int):
        """Return a provider whose sigmas act at the full matrix size."""
        base = self.provider
        probe = np.asarray(base.params()["sigs"][0]) if isinstance(
            base, _StaticSigma) else None
        if probe is not None:
            n_sig = probe.shape[0]
        else:
            # energy-dependent: trust the provider's Fock size
            n_sig = np.asarray(getattr(base, "F")).shape[0] \
                if hasattr(base, "F") else matrix_size
        if spin in ("u", "ro", "g") and matrix_size == 2 * n_sig:
            return _ExpandedProvider(base, spin)
        return base

    # reference-compatible helpers ------------------------------------
    def get_sigma_total(self, E, spin=None, matrix_size=None):
        from gaunegf_tpu.ops.complexio import call_complex_safe
        prov = self.provider_for(spin or "r", matrix_size or 0)
        fn, params = prov.total_apply()
        return call_complex_safe(fn, params, complex(E))

    def get_sigma(self, E, contact_index, spin=None, matrix_size=None):
        from gaunegf_tpu.ops.complexio import call_complex_safe
        prov = self.provider_for(spin or "r", matrix_size or 0)
        fn, params = prov.contact_apply(contact_index)
        return call_complex_safe(fn, params, complex(E))

    def get_gamma(self, E, contact_index, spin=None, matrix_size=None):
        s = self.get_sigma(E, contact_index, spin, matrix_size)
        return 1j * (s - np.conj(s).T)


class _ExpandedProvider:
    """Wraps a provider with the spin kron-expansion (stable fn ids)."""

    def __init__(self, base, spin: str):
        self.base = base
        self.spin = spin

    def params(self):
        return self.base.params()

    def total_apply(self):
        fn, params = self.base.total_apply()
        return spinmod.wrap_expand_fn(fn, self.spin), params

    def contact_apply(self, i):
        fn, params = self.base.contact_apply(i)
        return spinmod.wrap_expand_fn(fn, self.spin), params

    def contact_inds(self, i=None):
        getter = getattr(self.base, "contact_inds", None)
        if getter is None:
            return None
        inds = getter(i)
        if inds is None:
            return None
        inds = np.asarray(inds, dtype=int)
        nF = np.asarray(getattr(self.base, "F", None)).shape[0] \
            if hasattr(self.base, "F") else None
        if nF is None:
            ps = self.base.params()
            nF = np.asarray(jax.tree_util.tree_leaves(ps)[0]).shape[-1]
        if self.spin in ("u", "ro"):
            out = np.concatenate([inds, inds + nF])
        else:                        # 'g': spinor interleave
            out = np.concatenate([2 * inds, 2 * inds + 1])
        return tuple(int(j) for j in np.sort(out))

    def num_contacts(self):
        return self.base.num_contacts()


# ---------------------------------------------------------------------------
# Spin-resolved transmission / DOS point kernels
# ---------------------------------------------------------------------------

def _point_transmission_spin(E, H, S, params, sig_tot_fn, g1_fn, g2_fn,
                             exec_cfg):
    """4-channel spin-block transmission (transport.py:159-181 pattern)."""
    sig_tot = sig_tot_fn(params, E)
    Gr = _gr_point(E, H, S, sig_tot, exec_cfg)
    Ga = jnp.conj(Gr).T
    s1 = g1_fn(params, E)
    s2 = g2_fn(params, E)
    g1 = 1j * (s1 - jnp.conj(s1).T)
    g2 = 1j * (s2 - jnp.conj(s2).T)
    N = H.shape[0] // 2
    Gr_b = (Gr[:N, :N], Gr[:N, N:], Gr[N:, :N], Gr[N:, N:])
    Ga_b = (Ga[:N, :N], Ga[:N, N:], Ga[N:, :N], Ga[N:, N:])
    g1_b = (g1[:N, :N], g1[:N, :N], g1[N:, N:], g1[N:, N:])
    g2_b = (g2[:N, :N], g2[N:, N:], g2[:N, :N], g2[N:, N:])
    T = jnp.stack([
        jnp.real(jnp.trace(g1_b[i] @ Gr_b[i] @ g2_b[i] @ Ga_b[i]))
        for i in range(4)])
    return T


def _point_dos_spin(E, H, S, params, sig_tot_fn, exec_cfg):
    """diag(Gr) -- spin-resolved splitting happens host-side."""
    sig_tot = sig_tot_fn(params, E)
    Gr = _gr_point(E, H, S, sig_tot, exec_cfg)
    return jnp.diagonal(Gr)


# ---------------------------------------------------------------------------
# Checkpointed sweeps
# ---------------------------------------------------------------------------

def _load_or_init(checkpoint_file, energy_list, keys_shapes):
    """-1-placeholder checkpoint init/load (transport.py:421-449 scheme)."""
    n = len(energy_list)
    fresh = {k: -1 * np.ones(s if isinstance(s, tuple) else (n,))
             for k, s in keys_shapes.items()}
    if checkpoint_file and os.path.exists(checkpoint_file):
        data = np.load(checkpoint_file, allow_pickle=True)
        if ("energy_list" in data
                and data["energy_list"].shape == np.shape(energy_list)
                and np.allclose(data["energy_list"], energy_list, rtol=1e-10)):
            out = {}
            for k, s in keys_shapes.items():
                out[k] = data[k] if k in data else fresh[k]
            return out
        print("Warning: energy_list in checkpoint doesn't match. "
              "Starting fresh.")
    return fresh


def _save(checkpoint_file, energy_list, arrays):
    if checkpoint_file:
        np.savez(checkpoint_file, energy_list=energy_list, **arrays)


def _batched_sweep(remaining, batch):
    """Yield index batches of remaining energies."""
    for i in range(0, len(remaining), batch):
        yield remaining[i:i + batch]


def _prep_spin(F, S, sigma_source, spin):
    """Expand/permute host matrices and pick the provider for the layout."""
    F = np.asarray(F)
    S = np.asarray(S)
    matrix_size = F.shape[0]
    prov = sigma_source.provider_for(spin, matrix_size)
    if spin == "g":
        # spinor -> block permutation so block kernels apply
        perm = spinmod.spinor_block_perm(matrix_size // 2)
        ix = np.ix_(perm, perm)
        F = F[ix]
        S = S[ix]
        prov = _PermutedProvider(prov, matrix_size // 2)
    return F, S, prov


class _PermutedProvider:
    def __init__(self, base, n_orb):
        self.base = base
        self.n_orb = n_orb

    def params(self):
        return self.base.params()

    def total_apply(self):
        fn, params = self.base.total_apply()
        return spinmod.wrap_permute_fn(fn, self.n_orb), params

    def contact_apply(self, i):
        fn, params = self.base.contact_apply(i)
        return spinmod.wrap_permute_fn(fn, self.n_orb), params

    def contact_inds(self, i=None):
        getter = getattr(self.base, "contact_inds", None)
        if getter is None:
            return None
        inds = getter(i)
        if inds is None:
            return None
        inv = np.argsort(spinmod.spinor_block_perm(self.n_orb))
        return tuple(int(j) for j in np.sort(inv[np.asarray(inds,
                                                            dtype=int)]))

    def num_contacts(self):
        return self.base.num_contacts()


def calculate_transmission(F, S, sigma_source, energy_list, spin=None,
                           checkpoint_file=None, checkpoint_interval=10,
                           exec_cfg=_DEFAULT_EXEC, mesh=None):
    """T(E) sweep with -1-placeholder checkpointing.

    Returns transmission (n,) for 'r', or (transmission, spin_transmission
    (n, 4)) for 'u'/'ro'/'g' -- matching transport.calculate_transmission.
    Unlike the reference's per-energy Python loop, remaining energies are
    evaluated in sharded batches.
    """
    spin = spin or "r"
    energy_list = np.asarray(energy_list, dtype=float)
    n = len(energy_list)
    is_spin = spin in ("u", "ro", "g")
    shapes = {"transmission": (n,)}
    if is_spin:
        shapes["spin_transmission"] = (n, 4)
    state = _load_or_init(checkpoint_file, energy_list, shapes)
    remaining = np.where(state["transmission"] == -1)[0]

    if len(remaining):
        Fx, Sx, prov = _prep_spin(F, S, sigma_source, spin)
        eng = EnergyEngine(Fx, Sx, prov, exec_cfg, mesh)
        batch = max(checkpoint_interval, eng.exec_cfg.energy_chunk) \
            if checkpoint_file else len(remaining)
        for idx in _batched_sweep(remaining, batch):
            E = energy_list[idx]
            if is_spin:
                tot_fn, _ = prov.total_apply()
                g1_fn, _ = prov.contact_apply(0)
                g2_fn, _ = prov.contact_apply(-1)
                out = eng.map_engine(_point_transmission_spin,
                                     (tot_fn, g1_fn, g2_fn), E)
                state["spin_transmission"][idx] = out
                state["transmission"][idx] = out.sum(axis=-1)
            else:
                state["transmission"][idx] = eng.transmission(E)
            _save(checkpoint_file, energy_list,
                  {k: v for k, v in state.items()})
    _save(checkpoint_file, energy_list, {k: v for k, v in state.items()})

    if is_spin:
        return state["transmission"], state["spin_transmission"]
    return state["transmission"]


def calculate_dos(F, S, sigma_source, energy_list, spin=None,
                  checkpoint_file=None, checkpoint_interval=10,
                  exec_cfg=_DEFAULT_EXEC, mesh=None):
    """DOS sweep with checkpointing (transport.py:486-607 parity).

    Returns (dos_total, dos_per_site[, dos_spin]) with dos_per_site in the
    *original* orbital ordering (for 'g' the spinor interleaving is
    restored after the block-form solve).
    """
    spin = spin or "r"
    energy_list = np.asarray(energy_list, dtype=float)
    n = len(energy_list)
    n_sites = np.asarray(F).shape[0]
    is_spin = spin in ("u", "ro", "g")
    shapes = {"dos_total": (n,), "dos_per_site": (n, n_sites)}
    if is_spin:
        shapes["dos_spin"] = (n, 2)
    state = _load_or_init(checkpoint_file, energy_list, shapes)
    remaining = np.where(state["dos_total"] == -1)[0]

    if len(remaining):
        Fx, Sx, prov = _prep_spin(F, S, sigma_source, spin)
        eng = EnergyEngine(Fx, Sx, prov, exec_cfg, mesh)
        batch = max(checkpoint_interval, eng.exec_cfg.energy_chunk) \
            if checkpoint_file else len(remaining)
        if spin == "g":
            inv_perm = np.argsort(spinmod.spinor_block_perm(n_sites // 2))
        for idx in _batched_sweep(remaining, batch):
            E = energy_list[idx]
            diag = eng.gr_diag(E)           # block layout for spin cases
            per_site = -np.imag(diag) / np.pi
            if spin == "g":
                per_site = per_site[:, inv_perm]
            state["dos_per_site"][idx] = per_site
            state["dos_total"][idx] = per_site.sum(axis=-1)
            if is_spin:
                N2 = n_sites // 2
                if spin == "g":
                    up = per_site[:, 0::2].sum(axis=-1)
                    dn = per_site[:, 1::2].sum(axis=-1)
                else:
                    up = per_site[:, :N2].sum(axis=-1)
                    dn = per_site[:, N2:].sum(axis=-1)
                state["dos_spin"][idx] = np.stack([up, dn], axis=-1)
            _save(checkpoint_file, energy_list,
                  {k: v for k, v in state.items()})
    _save(checkpoint_file, energy_list, {k: v for k, v in state.items()})

    if is_spin:
        return state["dos_total"], state["dos_per_site"], state["dos_spin"]
    return state["dos_total"], state["dos_per_site"]


def transmission_single_energy(E, F, S, sigma_source, spin=None,
                               exec_cfg=_DEFAULT_EXEC):
    """Single-point T(E) (reference transport.py:193-273 contract).

    Returns a float for 'r'; (total, [T_uu, T_ud, T_du, T_dd]) for
    'u'/'ro'/'g'.  Thin wrapper over the batched sweep so single-point
    probes share the engine cache with full sweeps.
    """
    spin = spin or "r"
    res = calculate_transmission(F, S, sigma_source, [float(E)], spin=spin,
                                 exec_cfg=exec_cfg)
    if spin == "r":
        return float(np.asarray(res)[0])
    tot, tspin = res
    return float(tot[0]), [float(x) for x in np.asarray(tspin)[0]]


def dos_single_energy(E, F, S, sigma_source, spin=None,
                      exec_cfg=_DEFAULT_EXEC):
    """Single-point DOS (reference transport.py:274-375 contract).

    'r' -> (total_dos, dos_per_site); 'u'/'ro'/'g' -> (total_dos,
    dos_per_site, dos_up_per_site, dos_down_per_site), with dos_per_site
    in the original orbital ordering (spinor interleaving preserved for
    'g', where up/down are the even/odd spinor components).
    """
    spin = spin or "r"
    res = calculate_dos(F, S, sigma_source, [float(E)], spin=spin,
                        exec_cfg=exec_cfg)
    if spin == "r":
        tot, per_site = res
        return float(tot[0]), np.asarray(per_site)[0]
    tot, per_site, _ = res
    per = np.asarray(per_site)[0]
    n2 = per.shape[0] // 2
    if spin == "g":
        up, dn = per[0::2], per[1::2]
    else:
        up, dn = per[:n2], per[n2:]
    return float(tot[0]), per, up, dn


def calculate_current(F, S, sigma_source, fermi, qV, T=TEMPERATURE,
                      spin=None, dE=ENERGY_STEP, exec_cfg=_DEFAULT_EXEC,
                      mesh=None, **kwargs):
    """Landauer current at bias qV (transport.py:610-720 parity).

    Grid conventions match the reference exactly: muL = fermi - qV/2,
    muR = fermi + qV/2, np.arange grid with dE sign following qV, +/-
    N_KT*kT spread at finite T, trapezoid integration, x2 spin factor for
    restricted.
    """
    spin = spin or "r"
    if fermi is None or qV is None:
        raise ValueError("fermi and qV must be provided for current "
                         "calculations")
    if np.allclose(0, qV):
        return 0.0 if spin == "r" else (0.0, [0.0, 0.0, 0.0, 0.0])
    dE = -abs(dE) if qV < 0 else abs(dE)
    muL = fermi - qV / 2
    muR = fermi + qV / 2
    if T == 0:
        E = np.arange(muL, muR, dE)
    else:
        spread = np.sign(dE) * N_KT * KB * T
        E = np.arange(muL - spread, muR + spread, dE)
    if len(E) == 0:
        raise ValueError("No energies in integration window. Check fermi, "
                         "qV, and dE.")

    res = calculate_transmission(F, S, sigma_source, E, spin=spin,
                                 exec_cfg=exec_cfg, mesh=mesh, **kwargs)
    if isinstance(res, tuple):
        Ttot, Tspin = np.asarray(res[0]), np.asarray(res[1])
    else:
        Ttot, Tspin = np.asarray(res), None

    if T == 0:
        df = np.ones_like(E)
    else:
        df = np.abs(1 / (np.exp((E - muR) / (KB * T)) + 1)
                    - 1 / (np.exp((E - muL) / (KB * T)) + 1))
    if Tspin is not None:
        I_spin = [EOVERH * np.trapezoid(Tspin[:, i] * df, E) for i in range(4)]
        return float(sum(I_spin)), I_spin
    I = EOVERH * np.trapezoid(Ttot * df, E)
    if spin == "r":
        I *= 2
    return float(I)


# ---------------------------------------------------------------------------
# Legacy API (transport.py:723-1107)
# ---------------------------------------------------------------------------

def current(F, S, sig1, sig2, fermi, qV, T=TEMPERATURE, spin="r",
            dE=ENERGY_STEP, **kw):
    return calculate_current(F, S, SigmaSource(sig1, sig2, False),
                             fermi=fermi, qV=qV, T=T, spin=spin, dE=dE, **kw)


def currentSpin(F, S, sig1, sig2, fermi, qV, T=TEMPERATURE, spin="r",
                dE=ENERGY_STEP, **kw):
    res = calculate_current(F, S, SigmaSource(sig1, sig2, False),
                            fermi=fermi, qV=qV, T=T, spin=spin, dE=dE, **kw)
    if isinstance(res, tuple):
        return res[1]
    return [0, 0, 0, 0]


def currentE(F, S, g, fermi, qV, T=TEMPERATURE, spin="r", dE=ENERGY_STEP,
             **kw):
    return calculate_current(F, S, SigmaSource(g, energy_dependent=True),
                             fermi=fermi, qV=qV, T=T, spin=spin, dE=dE, **kw)


def currentF(fn, dE=ENERGY_STEP, T=TEMPERATURE, **kw):
    """Current from a saved SCF .mat file (transport.py:847-875)."""
    import scipy.io as sio
    m = sio.loadmat(fn)
    return current(m["F"], m["S"], m["sig1"], m["sig2"], m["fermi"][0, 0],
                   m["qV"][0, 0], T, m["spin"][0], dE=dE, **kw)


def cohTrans(Elist, F, S, sig1, sig2, **kw):
    T = calculate_transmission(F, S, SigmaSource(sig1, sig2, False),
                               Elist, spin="r", **kw)
    for E, t in zip(Elist, T):
        print("Energy:", E, "eV, Transmission=", t)
    return list(T)


def cohTransSpin(Elist, F, S, sig1, sig2, spin="u", **kw):
    res = calculate_transmission(F, S, SigmaSource(sig1, sig2, False),
                                 Elist, spin=spin, **kw)
    if isinstance(res, tuple):
        return list(res[0]), res[1]
    return list(res), np.zeros((len(Elist), 4))


def DOS(Elist, F, S, sig1, sig2, **kw):
    d, site = calculate_dos(F, S, SigmaSource(sig1, sig2, False), Elist,
                            spin="r", **kw)
    return list(d), site


def cohTransE(Elist, F, S, g, **kw):
    T = calculate_transmission(F, S, SigmaSource(g, energy_dependent=True),
                               Elist, spin="r", **kw)
    return list(T)


def cohTransSpinE(Elist, F, S, g, spin="u", **kw):
    res = calculate_transmission(F, S, SigmaSource(g, energy_dependent=True),
                                 Elist, spin=spin, **kw)
    if isinstance(res, tuple):
        return res
    return res, np.zeros((len(Elist), 4))


def DOSE(Elist, F, S, g, **kw):
    d, site = calculate_dos(F, S, SigmaSource(g, energy_dependent=True),
                            Elist, spin="r", **kw)
    return list(d), site
