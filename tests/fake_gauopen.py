"""A faithful in-memory stand-in for the proprietary ``gauopen`` package.

The reference's Gaussian bridge (matTools.py:39-269) marshals matrices
through gauopen's ``QCOpMat.OpMat`` objects, whose load-bearing behaviors
are:

* symmetric/hermitian square matrices are stored LOWER-TRIANGULAR PACKED
  (``compress``) and reconstructed by ``expand`` -- so a bridge that
  mixes up the triangle or forgets the conjugate transpose fails here;
* 1-D operator records (orbital energies) expand to themselves;
* ``typed='c'`` carries complex data (the generalized-spin density).

``FakeBinAr`` emulates the Gaussian engine itself just enough for
GaussianFock's round trip (models/fock.py:224-318): ``update(dofock=...)``
runs a tiny restricted/unrestricted/generalized mean-field "DFT", the SCF
density written back via ``addobj`` drives the next ``dofock='DENSITY'``
Fock build, and scalars (escf, X/Y/Z-EFIELD) behave like Gaussian's.

``install()`` registers the fake under ``sys.modules['gauopen']`` so the
production import sites (``from gauopen import QCOpMat as qco``) resolve
without Gaussian.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# QCOpMat.OpMat
# ---------------------------------------------------------------------------

class OpMat:
    """Lower-triangular-packed operator record (gauopen QCOpMat.OpMat)."""

    def __init__(self, name, array, dimens=None, typed="d", asym=False):
        self.name = name
        self.array = np.asarray(array)
        self.dimens = tuple(dimens) if dimens is not None \
            else self.array.shape
        self.typed = typed
        self.asym = asym
        self._packed = self.array.ndim == 1 and len(self.dimens) == 2 \
            and self.dimens[0] == self.dimens[1] \
            and self.array.size == self.dimens[0] * (self.dimens[0] + 1) // 2

    @staticmethod
    def _lt_indices(n):
        rows, cols = np.tril_indices(n)
        return rows, cols

    def compress(self):
        """Pack a square symmetric (real) / hermitian (complex) matrix into
        its lower triangle; leave everything else untouched (real gauopen
        refuses to pack non-symmetric data)."""
        if self._packed or self.array.ndim != 2:
            return
        A = self.array
        n, m = A.shape
        if n != m:
            return
        herm = np.allclose(A, A.conj().T, atol=1e-10)
        if not herm:
            return
        r, c = self._lt_indices(n)
        self.array = A[r, c]
        self.dimens = (n, n)
        self._packed = True

    def expand(self):
        """Reconstruct the full record: packed square -> symmetric /
        hermitian matrix; 1-D energy vectors -> themselves."""
        if not self._packed:
            return np.array(self.array)
        n = self.dimens[0]
        M = np.zeros((n, n), dtype=self.array.dtype)
        r, c = self._lt_indices(n)
        M[r, c] = self.array
        upper = np.triu(M.conj().T, 1) if np.iscomplexobj(M) \
            else np.triu(M.T, 1)
        return M + upper


# ---------------------------------------------------------------------------
# QCBinAr.BinAr
# ---------------------------------------------------------------------------

ALPHA_SCF_DEN = "ALPHA SCF DENSITY MATRIX"
BETA_SCF_DEN = "BETA SCF DENSITY MATRIX"
ALPHA_FOCK = "ALPHA FOCK MATRIX"
BETA_FOCK = "BETA FOCK MATRIX"
ALPHA_ENERGIES = "ALPHA ORBITAL ENERGIES"
BETA_ENERGIES = "BETA ORBITAL ENERGIES"

_CONFIG = {}


def configure(H0, S=None, ibfatm=None, ne=None, U=0.5, coords=None):
    """Set the model the next FakeBinAr instance will expose (BinAr is
    constructed inside GaussianFock with only a filename, so the system
    definition must come from module state -- like Gaussian's .gjf)."""
    H0 = np.asarray(H0, float)
    n = H0.shape[0]
    _CONFIG.clear()
    _CONFIG.update(
        H0=H0,
        S=np.eye(n) if S is None else np.asarray(S, float),
        ibfatm=np.arange(1, n + 1) if ibfatm is None
        else np.asarray(ibfatm),
        ne=n if ne is None else int(ne),
        U=float(U),
        coords=np.zeros((int(np.max(ibfatm)) if ibfatm is not None else n,
                         3)) if coords is None else np.asarray(coords),
    )


class BinAr:
    """Mean-field 'Gaussian engine': holds matlist/scalars, rebuilds the
    Fock matrix from the last stored SCF density on update(dofock=...)."""

    def __init__(self, debug=False, lenint=8, inputfile=None):
        if not _CONFIG:
            raise RuntimeError("call fake_gauopen.configure(...) first")
        self.inputfile = inputfile
        self.H0 = _CONFIG["H0"]
        self.S0 = _CONFIG["S"]
        self.ibfatm = np.asarray(_CONFIG["ibfatm"])
        self.ne = _CONFIG["ne"]
        self.U = _CONFIG["U"]
        self.c = np.asarray(_CONFIG["coords"], float).ravel()
        self.matlist = {}
        self.scalars = {"escf": 0.0}
        self.update_calls = []
        self.written = []
        ov = OpMat("OVERLAP", self.S0.copy())
        ov.compress()
        self.matlist["OVERLAP"] = ov

    # -- helpers --------------------------------------------------------
    def _spin_of(self, model):
        m = (model or "r").lower()
        for s in ("ro", "u", "g", "r"):
            if m.startswith(s):
                return s
        return "r"

    def _put(self, name, arr, typed="d"):
        o = OpMat(name, np.asarray(arr), typed=typed)
        o.compress()
        self.matlist[name] = o

    def _fock_of_density(self, spin):
        """F[P] = H0 + U * diag(orbital occupation): a density-dependent
        mean field so the DENSITY round trip is observable."""
        n = self.H0.shape[0]
        if spin == "g":
            P = self.matlist[ALPHA_SCF_DEN].expand().astype(complex)
            Sg = np.kron(self.S0, np.eye(2))
            occ_so = np.real(np.diag(P @ Sg))
            occ = occ_so[0::2] + occ_so[1::2]
            F = np.kron(self.H0 + self.U * np.diag(occ), np.eye(2))
            return F.astype(complex), None
        Pa = self.matlist[ALPHA_SCF_DEN].expand()
        if spin in ("u", "ro"):
            Pb = self.matlist[BETA_SCF_DEN].expand()
        else:
            Pb = Pa          # restricted density is stored halved
        na = np.real(np.diag(Pa @ self.S0))
        nb = np.real(np.diag(Pb @ self.S0))
        Fa = self.H0 + self.U * np.diag(na + nb)
        Fb = self.H0 + self.U * np.diag(na + nb) \
            + 0.01 * np.eye(len(self.H0))       # distinguishable channels
        return Fa, Fb

    def _initial_scf(self, spin):
        n = self.H0.shape[0]
        import scipy.linalg
        w, v = scipy.linalg.eigh(self.H0, self.S0)
        if spin == "g":
            occ = self.ne
            wg = np.repeat(w, 2)
            vg = np.kron(v, np.eye(2))
            order = np.argsort(wg)
            vo = vg[:, order[:occ]]
            P = (vo @ vo.conj().T).astype(complex)
            self._put(ALPHA_SCF_DEN, P, typed="c")
            self._put(ALPHA_FOCK, np.kron(self.H0, np.eye(2)))
            self.matlist[ALPHA_ENERGIES] = OpMat(ALPHA_ENERGIES, wg)
        elif spin in ("u", "ro"):
            na = -(-self.ne // 2)
            nb = self.ne // 2
            Pa = v[:, :na] @ v[:, :na].T
            Pb = v[:, :nb] @ v[:, :nb].T
            self._put(ALPHA_SCF_DEN, Pa)
            self._put(BETA_SCF_DEN, Pb)
            self._put(ALPHA_FOCK, self.H0)
            self._put(BETA_FOCK, self.H0 + 0.01 * np.eye(n))
            self.matlist[ALPHA_ENERGIES] = OpMat(ALPHA_ENERGIES, w)
            self.matlist[BETA_ENERGIES] = OpMat(BETA_ENERGIES, w + 0.01)
        else:
            nocc = self.ne // 2
            # Gaussian stores the HALVED restricted density (per spin)
            Pa = v[:, :nocc] @ v[:, :nocc].T
            self._put(ALPHA_SCF_DEN, Pa)
            self._put(ALPHA_FOCK, self.H0)
            self.matlist[ALPHA_ENERGIES] = OpMat(ALPHA_ENERGIES, w)
        self.scalars["escf"] = float(np.sum(w[: self.ne // 2]) * 2)

    # -- gauopen API ----------------------------------------------------
    def update(self, model=None, basis=None, toutput=None, miscroute=None,
               add_section=None, dofock=None, chkname=None, **kw):
        self.update_calls.append(dict(model=model, dofock=dofock,
                                      chkname=chkname))
        spin = self._spin_of(model)
        mode = dofock if isinstance(dofock, str) else \
            ("SCF" if dofock else None)
        mode = (mode or "SCF").upper()
        if mode in ("SCF", "GUESS", "TRUE"):
            self._initial_scf(spin)
            return
        if mode == "DENSITY":
            Fa, Fb = self._fock_of_density(spin)
            if spin == "g":
                self._put(ALPHA_FOCK, Fa, typed="c")
                import scipy.linalg
                wg = np.linalg.eigvalsh(
                    scipy.linalg.solve(np.kron(self.S0, np.eye(2)), Fa))
                self.matlist[ALPHA_ENERGIES] = OpMat(ALPHA_ENERGIES,
                                                     np.real(wg))
            else:
                self._put(ALPHA_FOCK, Fa)
                import scipy.linalg
                wa = np.real(scipy.linalg.eigvals(
                    scipy.linalg.solve(self.S0, Fa)))
                self.matlist[ALPHA_ENERGIES] = OpMat(ALPHA_ENERGIES,
                                                     np.sort(wa))
                if spin in ("u", "ro"):
                    self._put(BETA_FOCK, Fb)
                    wb = np.real(scipy.linalg.eigvals(
                        scipy.linalg.solve(self.S0, Fb)))
                    self.matlist[BETA_ENERGIES] = OpMat(BETA_ENERGIES,
                                                        np.sort(wb))
            self.scalars["escf"] = float(np.real(np.trace(Fa)))
            return
        raise ValueError(f"unknown dofock mode {dofock!r}")

    def addobj(self, obj):
        self.matlist[obj.name] = obj

    def scalar(self, name, value=None):
        if value is None:
            return self.scalars[name]
        self.scalars[name] = value

    def writefile(self, path):
        self.written.append(path)


# ---------------------------------------------------------------------------
# sys.modules installation
# ---------------------------------------------------------------------------

def install():
    """Register this fake as the importable ``gauopen`` package."""
    pkg = types.ModuleType("gauopen")
    qcb = types.ModuleType("gauopen.QCBinAr")
    qco = types.ModuleType("gauopen.QCOpMat")
    qcb.BinAr = BinAr
    qco.OpMat = OpMat
    pkg.QCBinAr = qcb
    pkg.QCOpMat = qco
    sys.modules["gauopen"] = pkg
    sys.modules["gauopen.QCBinAr"] = qcb
    sys.modules["gauopen.QCOpMat"] = qco
    return pkg


def uninstall():
    for k in ("gauopen", "gauopen.QCBinAr", "gauopen.QCOpMat"):
        sys.modules.pop(k, None)
