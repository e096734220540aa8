"""gauNEGF.transport parity.

The TPU transport module already exposes the reference's legacy API under
its original names (current/currentSpin/currentE/currentF/cohTrans/
cohTransSpin/DOS/cohTransE/cohTransSpinE/DOSE, transport.py:723-1107) and
the checkpointing calculators (calculate_transmission/calculate_dos/
calculate_current, transport.py:376-720); SigmaCalculator
(transport.py:40-146) is the SigmaSource auto-detector.
"""

from gaunegf_tpu.transport import (  # noqa: F401
    DOS, DOSE, SigmaSource, calculate_current, calculate_dos,
    calculate_transmission, cohTrans, cohTransE, cohTransSpin,
    cohTransSpinE, current, currentE, currentF, currentSpin,
    dos_single_energy, transmission_single_energy)

SigmaCalculator = SigmaSource
