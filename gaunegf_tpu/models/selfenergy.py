"""Self-energy provider protocol and the constant-Sigma provider.

Design (SURVEY.md section 2.3, section 7.1): providers are *pure-function + params*
pairs.  Each provider class exposes

* ``params()``            -> pytree of arrays (jit-traceable)
* ``sigma_total(params, E)``   (staticmethod, traceable, vmappable over E)
* ``sigma_contact(params, E, i)`` (staticmethod, i static)

so the integration engines jit once per (class, shape) and never re-trace
across SCF iterations.  For drop-in familiarity the classic duck-typed
interface of the reference (``sigma(E, i)`` / ``sigmaTot(E)`` /
``setF(F, mu1, mu2)`` / ``.F`` / ``.S``, see surfG1D.py:344-399) is provided
on top as thin host-side wrappers.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax.numpy as jnp
import numpy as np

from gaunegf_tpu.config import SURFACE_GREEN_CONVERGENCE

__all__ = ["SelfEnergyProvider", "ConstantSelfEnergy", "form_sigma"]


def form_sigma(inds, V, nsto: int, S=None):
    """Embed a contact self-energy into an (nsto, nsto) matrix.

    Semantics match matTools.formSigma (matTools.py:39-74): the background is
    a small anti-Hermitian broadening ``-1j * 1e-9 * S`` (identity if S not
    given); V may be a scalar (placed on the diagonal at ``inds``), a vector
    (diagonal values) or a full (len(inds), len(inds)) matrix.
    """
    inds = np.asarray(inds, dtype=int)
    if S is None or (isinstance(S, int) and S == 0):
        S = np.eye(nsto)
    sigma = np.array(-1j * 1e-9 * np.asarray(S), dtype=complex)
    V = np.asarray(V)
    if V.ndim == 0:
        sigma[inds, inds] = complex(V)
    elif V.ndim == 1:
        sigma[inds, inds] = V
    else:
        sigma[np.ix_(inds, inds)] = V
    return sigma


@runtime_checkable
class SelfEnergyProvider(Protocol):
    """Typed version of the duck-typed contract in SURVEY.md section 2.3."""

    F: np.ndarray
    S: np.ndarray

    def params(self): ...

    @staticmethod
    def sigma_total(params, E): ...

    @staticmethod
    def sigma_contact(params, E, i: int): ...

    def num_contacts(self) -> int: ...

    def set_fock(self, F, mu1=None, mu2=None) -> None: ...


class _CompatMixin:
    """Reference-compatible method names on top of the pure API.

    All host-facing sigma calls go through the complex-safe jit boundary
    (ops/complexio.py) so they work on backends without complex transfers.
    """

    def sigma(self, E, i, conv=SURFACE_GREEN_CONVERGENCE):
        from gaunegf_tpu.ops.complexio import call_complex_safe
        fn, params = self.contact_apply(i)
        return call_complex_safe(fn, params, complex(E))

    def sigmaTot(self, E, conv=SURFACE_GREEN_CONVERGENCE):
        from gaunegf_tpu.ops.complexio import call_complex_safe
        fn, params = self.total_apply()
        return call_complex_safe(fn, params, complex(E))

    def setF(self, F, mu1=None, mu2=None):
        self.set_fock(F, mu1, mu2)


class ConstantSelfEnergy(_CompatMixin):
    """Energy-independent contact self-energies.

    Capability parity with surfGTester.surfGTest (surfGTester.py:62-152):
    used both for testing and for production constant-Sigma runs.  Defaults
    to ``-0.05j`` diagonals on the contact orbitals when no values given.
    """

    def __init__(self, Fock, Overlap, inds_list, sig1=None, sig2=None):
        self.F = np.asarray(Fock)
        self.S = np.asarray(Overlap)
        self.N = self.F.shape[0]
        self.inds_list = [np.asarray(i, dtype=int) for i in inds_list]
        sigs = []
        if sig1 is not None:
            sigs.append(form_sigma(self.inds_list[0], sig1, self.N, self.S))
            sigs.append(form_sigma(self.inds_list[1],
                                   sig1 if sig2 is None else sig2,
                                   self.N, self.S))
        else:
            for inds in self.inds_list[:2]:
                s = np.zeros((self.N, self.N), dtype=complex)
                s[np.ix_(inds, inds)] = np.diag([-0.05j] * len(inds))
                sigs.append(s)
        # params stay host-side NumPy: the engines split them into re/im
        # float pairs at the device boundary (no complex transfers)
        self._sigs = np.stack(sigs)

    # --- pure API -----------------------------------------------------
    def params(self):
        return {"sigs": self._sigs}

    @staticmethod
    def sigma_total(params, E):
        return jnp.sum(params["sigs"], axis=0)

    @staticmethod
    def sigma_contact(params, E, i: int):
        return params["sigs"][i]

    def num_contacts(self) -> int:
        return int(self._sigs.shape[0])

    def total_apply(self):
        return _const_total, self.params()

    def contact_apply(self, i: int):
        i = i % self.num_contacts()
        return _const_contact(i), self.params()

    # --- double-word API (high/exact tiers) ---------------------------
    # Constant sigmas are known exactly on the host, so the double-word
    # split is exact: this removes the single-word-Sigma floor (~6e-8
    # representation rounding) from the 'exact' tier (VERDICT r1 item 7).
    def params_dw(self):
        s = self._sigs.astype(np.complex128)
        hi = s.astype(np.complex64)
        lo = (s - hi.astype(np.complex128)).astype(np.complex64)
        return {"sigs_hi": hi, "sigs_lo": lo}

    def total_apply_dw(self):
        return _const_total_dw, self.params_dw()

    def contact_apply_dw(self, i: int):
        i = i % self.num_contacts()
        return _const_contact_dw(i), self.params_dw()

    def contact_inds(self, i=None):
        """Static contact support for the low-rank fast path."""
        if i is None:
            return tuple(sorted({int(j) for inds in self.inds_list[:2]
                                 for j in inds}))
        return tuple(int(j) for j in self.inds_list[i % len(self.inds_list)])

    def total_block_apply(self, c):
        """fn(params, E) -> Sigma_total[c, c] without materializing (N, N)
        per energy point (the spectral route's per-point extraction)."""
        return _const_total_block(tuple(int(j) for j in c))

    def set_fock(self, F, mu1=None, mu2=None):
        self.F = np.asarray(F)


def _const_total(params, E):
    return jnp.sum(params["sigs"], axis=0)


from functools import lru_cache


@lru_cache(maxsize=None)
def _const_contact(i: int):
    def fn(params, E):
        return params["sigs"][i]
    return fn


def _const_total_dw(params, E):
    from gaunegf_tpu.ops.zlinalg import ctwo_sum
    hi = params["sigs_hi"]
    lo = params["sigs_lo"]
    h, l = hi[0], lo[0]
    for i in range(1, hi.shape[0]):
        h, e = ctwo_sum(h, hi[i])
        l = l + lo[i] + e
    return h, l


@lru_cache(maxsize=None)
def _const_contact_dw(i: int):
    def fn(params, E):
        return params["sigs_hi"][i], params["sigs_lo"][i]
    return fn


@lru_cache(maxsize=None)
def _const_total_block(c: tuple):
    import numpy as _np
    cix = _np.asarray(c, dtype=_np.int64)

    def fn(params, E):
        return jnp.sum(params["sigs"][:, cix][:, :, cix], axis=0)
    return fn
