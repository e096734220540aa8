"""gauNEGF.surfGBethe parity: FCC[111] Bethe-lattice electrode.

surfGB (surfGBethe.py:106-221) takes a gauopen ``bar`` and autodetects
the contact geometry from its atomic coordinates; the TPU provider keeps
that entry point via BetheGeometry.from_backend and runs the batched
(12,9,9) Jacobi fixed point on device (models/bethe.py).
"""

from gaunegf_tpu.config import ETA, TEMPERATURE
from gaunegf_tpu.models.bethe import (
    BetheAtomGF, BetheGeometry, BetheSelfEnergy)


class surfGB(BetheSelfEnergy):
    """surfGBethe.surfGB with the reference's signature (F, S, contacts,
    bar, latFile, spin, eta, T)."""

    def __init__(self, F, S, contacts, bar, latFile="Au", spin="r",
                 eta=ETA, T=TEMPERATURE, **kw):
        geometry = BetheGeometry.from_backend(getattr(bar, "bar", bar))
        super().__init__(F, S, contacts, geometry, lat_file=latFile,
                         spin=spin, eta=eta, T=T, **kw)


class surfGBAt(BetheAtomGF):
    """surfGBethe.surfGBAt parity: single-atom Bethe GF fixed point
    (surfGBethe.py:832-1186)."""

    def __init__(self, H, Slist, Vlist, eta, T=TEMPERATURE):
        super().__init__(H, Slist, Vlist, eta=eta, T=T)
