"""Reference-named compatibility facade over gaunegf_tpu.

Mirrors the public module/function/class names of wliverno/GauNEGF
(``gauNEGF.density``, ``gauNEGF.scf.NEGF``, ``gauNEGF.transport`` ...)
so existing reference scripts can switch to the TPU framework with an
import change only::

    from gaunegf_tpu.compat import density, transport
    from gaunegf_tpu.compat.scf import NEGF        # Gaussian-backed

or, for verbatim ``import gauNEGF...`` scripts::

    import gaunegf_tpu.compat as compat
    compat.install()                               # registers 'gauNEGF'
    from gauNEGF.scfE import NEGFE                 # now resolves here

Every wrapper translates the reference's camelCase keyword names
(``maxN``, ``showText``, ``fermiGuess`` ...) to the TPU API and delegates;
numerical behaviour is the TPU implementation (parity documented in
PARITY.md, goldens in tests/golden/).  Reference surface: the module list
in SURVEY.md section 2.1 (gauNEGF/*.py public defs).
"""

import sys

from gaunegf_tpu.compat import (  # noqa: F401
    config, density, fermiSearch, integrate, matTools, scf, scfE, surfG1D,
    surfG3D, surfGBethe, surfGTester, transport, utils)

_SUBMODULES = ("config", "density", "fermiSearch", "integrate", "matTools",
               "scf", "scfE", "surfG1D", "surfG3D", "surfGBethe",
               "surfGTester", "transport", "utils")

__all__ = list(_SUBMODULES) + ["install"]


def install(name: str = "gauNEGF") -> None:
    """Register this facade in sys.modules under the reference's package
    name, making ``import gauNEGF.density`` etc. resolve here.  Refuses to
    shadow a genuinely installed package of that name."""
    existing = sys.modules.get(name)
    if existing is not None and existing is not sys.modules[__name__]:
        raise RuntimeError(
            f"refusing to install compat alias: module {name!r} is already "
            "imported; unimport it first or use gaunegf_tpu.compat directly")
    pkg = sys.modules[__name__]
    sys.modules[name] = pkg
    for sub in _SUBMODULES:
        sys.modules[f"{name}.{sub}"] = getattr(pkg, sub)
