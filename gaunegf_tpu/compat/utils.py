"""gauNEGF.utils parity (utils.py:12-62): jitted linear-algebra helpers.

The TPU implementations route around backend gaps (complex LU has no TPU
lowering; eig host-callbacks) -- see ops/zlinalg.py.
"""

from gaunegf_tpu.ops.zlinalg import (  # noqa: F401
    eig, eigh, fractional_matrix_power, inv)
