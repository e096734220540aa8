"""gauNEGF.surfGTester parity: energy-independent Sigma provider
(surfGTester.py:62-152), used for testing and production constant-Sigma
runs at finite T."""

from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy


class surfGTest(ConstantSelfEnergy):
    """surfGTester.surfGTest (same signature: Fock, Overlap, indsList,
    sig1=None, sig2=None; defaults to -0.05j contact diagonals)."""
