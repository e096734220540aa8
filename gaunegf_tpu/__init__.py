"""gaunegf_tpu: a TPU-native NEGF quantum-transport framework.

A from-scratch re-design of the capabilities of wliverno/GauNEGF for
JAX/XLA/Pallas on TPU meshes: dense complex Green's functions batched over
energy grids, surface self-energies as jitted fixed points, contour/adaptive
quadrature, Fermi searches, Pulay-mixed SCF, and Landauer transport -- all
testable without any quantum-chemistry backend.
"""

__version__ = "0.1.0"
