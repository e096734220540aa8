"""gaunegf_tpu: a TPU-native NEGF quantum-transport framework.

A from-scratch re-design of the capabilities of wliverno/GauNEGF for
JAX/XLA/Pallas on TPU meshes: dense complex Green's functions batched over
energy grids, surface self-energies as jitted fixed points, contour/adaptive
quadrature, Fermi searches, Pulay-mixed SCF, and Landauer transport -- all
testable without any quantum-chemistry backend.
"""

__version__ = "0.1.0"

# Public API surface (lazy-friendly: these imports are lightweight; heavy
# jit compilation happens on first use).
from gaunegf_tpu.config import (                                  # noqa: F401
    ExecutionConfig, IntegrationConfig, SCFConfig, SurfaceConfig)
from gaunegf_tpu.parallel.mesh import energy_mesh                 # noqa: F401


def __getattr__(name):
    """Lazy submodule access: gaunegf_tpu.transport etc."""
    import importlib

    if name in ("transport", "density", "fermi", "quadrature", "scf",
                "scfe", "spin", "units", "models", "ops", "parallel", "io",
                "fermi_search_dos"):
        return importlib.import_module(f"gaunegf_tpu.{name}")
    raise AttributeError(f"module 'gaunegf_tpu' has no attribute {name!r}")
