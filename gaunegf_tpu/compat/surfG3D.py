"""gauNEGF.surfG3D parity: explicit 3D-lattice contact plane.

The reference's surfG3 is an unfinished NumPy twin of surfGBethe
("work in progress -- need to implement k-space integration",
surfG3D.py:21-23).  The TPU provider (models/lattice3d.py) completes it:
real 2D Brillouin-zone integration over an nk x nk Monkhorst-Pack surface
grid with optional C3v symmetry reduction.  Gamma-only (the reference's
implemented mode) is the default here for parity.
"""

from gaunegf_tpu.compat.surfGBethe import _SKMethodsMixin, surfGBAt
from gaunegf_tpu.config import ENERGY_MIN, ETA, TEMPERATURE
from gaunegf_tpu.models import slater_koster as _sk
from gaunegf_tpu.models.bethe import BetheGeometry
from gaunegf_tpu.models.lattice3d import Lattice3DSelfEnergy
from gaunegf_tpu.units import HAR_TO_EV, KB

# Module constants under the reference's names (surfG3D.py:11-14)
kB = KB
dim = _sk.DIM
har_to_eV = HAR_TO_EV
Eminf = ENERGY_MIN


class surfG3(_SKMethodsMixin, Lattice3DSelfEnergy):
    """surfG3D.surfG3 with the reference's signature (F, S, contacts, bar,
    latFile, spin, eta, T); pass gamma_point_only=False plus nk for the
    full k-space mode the reference left open."""

    def __init__(self, F, S, contacts, bar, latFile="Au", spin="r",
                 eta=ETA, T=TEMPERATURE, **kw):
        geometry = BetheGeometry.from_backend(getattr(bar, "bar", bar))
        super().__init__(F, S, contacts, geometry, lat_file=latFile,
                         spin=spin, eta=eta, T=T, **kw)


class surfGAt(surfGBAt):
    """surfG3D.surfGAt parity (surfG3D.py:721-1062): the atomic-level
    fixed point with DOS and calcFermi.  The reference class adds k-space
    neighbor sums over explicit lattice vectors; here the k-resolved path
    lives in Lattice3DSelfEnergy (models/lattice3d.py) and the atomic GF
    keeps the Bethe coordination-number closure."""
