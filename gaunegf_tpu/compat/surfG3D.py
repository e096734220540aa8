"""gauNEGF.surfG3D parity: explicit 3D-lattice contact plane.

The reference's surfG3 is an unfinished NumPy twin of surfGBethe
("work in progress -- need to implement k-space integration",
surfG3D.py:21-23).  The TPU provider (models/lattice3d.py) completes it:
real 2D Brillouin-zone integration over an nk x nk Monkhorst-Pack surface
grid with optional C3v symmetry reduction.  Gamma-only (the reference's
implemented mode) is the default here for parity.
"""

from gaunegf_tpu.config import ETA, TEMPERATURE
from gaunegf_tpu.models.bethe import BetheGeometry
from gaunegf_tpu.models.lattice3d import Lattice3DSelfEnergy


class surfG3(Lattice3DSelfEnergy):
    """surfG3D.surfG3 with the reference's signature (F, S, contacts, bar,
    latFile, spin, eta, T); pass gamma_point_only=False plus nk for the
    full k-space mode the reference left open."""

    def __init__(self, F, S, contacts, bar, latFile="Au", spin="r",
                 eta=ETA, T=TEMPERATURE, **kw):
        geometry = BetheGeometry.from_backend(getattr(bar, "bar", bar))
        super().__init__(F, S, contacts, geometry, lat_file=latFile,
                         spin=spin, eta=eta, T=T, **kw)
