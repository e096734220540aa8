"""3D-lattice surface self-energies (surfG3D equivalent).

Capability parity with gauNEGF/surfG3D.py, which is the reference's
work-in-progress NumPy twin of the Bethe-lattice model ("need to implement
k-space integration (Gamma only)", surfG3D.py:21-23).  Differences from the
Bethe geometry path, mirrored here:

* neighbour search runs over the *contact atoms only* (surfG3D.py:94-100:
  within 1.5x the nearest-neighbour distance), i.e. the contact layer is
  assumed to be a single crystal plane;
* only in-plane matches (direction slots 0,1,2,6,7,8) are legal -- a
  mismatch raises (surfG3D.py:101-105);
* no orientation disambiguation pass.

The fixed points, Slater-Koster construction and device embedding are the
shared jitted machinery from models/bethe.py -- whereas the reference
duplicates ~1000 lines of surfGBethe in NumPy, this implementation reuses
the batched TPU path.  Gamma-point-only: like the reference, no k-space
integration yet (kept as an explicit keyword for forward compatibility).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from gaunegf_tpu.config import ETA, TEMPERATURE
from gaunegf_tpu.models import slater_koster as sk
from gaunegf_tpu.models.bethe import (
    BetheGeometry, BetheSelfEnergy, DIM, PLANE_DIRS)

__all__ = ["Lattice3DSelfEnergy"]


def _detect_contact_3d(geom: BetheGeometry, contact_atoms: Sequence[int]):
    """Contact-plane geometry detection with the surfG3D rules."""
    coords = geom.coords
    orb_map = np.asarray(geom.orbital_atoms)
    pos_mask = orb_map > 0
    orb_map_pos = orb_map[pos_mask]
    orb_typ = (np.asarray(geom.orbital_types)[pos_mask]
               if geom.orbital_types is not None else None)

    inds_list = []
    c_list = []
    for atom in contact_atoms:
        inds = np.where(orb_map_pos == atom)[0]
        assert len(inds) == DIM, \
            f"Atom {atom} has {len(inds)} basis functions, expecting {DIM}"
        if orb_typ is not None:
            inds = inds[np.argsort(np.abs(orb_typ[inds]) // 1000)]
        inds_list.append(inds)
        c_list.append(coords[atom - 1])
    c_list = np.asarray(c_list)

    centred = c_list - c_list.mean(axis=0)
    _, _, Vt = np.linalg.svd(centred)
    normal = Vt[-1]

    d = np.linalg.norm(c_list[1:] - c_list[0], axis=1)
    v_ind = int(np.argmin(d)) + 1
    lat_vec = c_list[v_ind] - c_list[0]
    lat_dist = float(np.linalg.norm(lat_vec))
    n_vecs = sk.fcc111_neighbor_directions(normal, lat_vec / lat_dist)

    plane_ok = set(PLANE_DIRS)
    n_ind_list = []
    for c in c_list:
        n_inds = []
        for c2 in c_list:                      # contact atoms only
            l = np.linalg.norm(c2 - c)
            if 0 < l < 1.5 * lat_dist and not np.allclose(c2, c):
                vec = (c2 - c) / l
                vals = n_vecs @ vec
                best = int(np.argmax(vals))
                if not (vals[best] > 0.9 and best in plane_ok):
                    raise ValueError("Lattice mismatch in contact atoms: "
                                     "contact layer is not a single "
                                     "crystal plane")
                n_inds.append(best)
        n_ind_list.append(n_inds)
    return inds_list, normal, lat_vec / lat_dist, n_vecs, n_ind_list


class Lattice3DSelfEnergy(BetheSelfEnergy):
    """Surface self-energy for an explicit 3D-lattice contact plane."""

    _detector = staticmethod(_detect_contact_3d)

    def __init__(self, F, S, contacts, geometry: BetheGeometry,
                 lat_file: str = "Au", spin: str = "r", eta: float = ETA,
                 T: float = TEMPERATURE, gamma_point_only: bool = True,
                 **kw):
        if not gamma_point_only:
            raise NotImplementedError(
                "k-space integration beyond the Gamma point is not "
                "implemented (matching the reference's status, "
                "surfG3D.py:21-23)")
        super().__init__(F, S, contacts, geometry, lat_file, spin, eta, T,
                         **kw)
