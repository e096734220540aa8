"""gauNEGF.integrate parity: weighted Green's-function sums over energy.

GrInt (integrate.py:146-173) and GrLessInt (integrate.py:177-208) map to
the sharded TPU engines in ops/greens.py (vmap/scan dispatch, Kahan sums,
complex-safe IO).
"""

from gaunegf_tpu.ops.greens import weighted_gless_sum, weighted_gr_sum


def GrInt(F, S, g, Elist, weights):
    """sum_k w_k G(E_k) -- integrate.GrInt parity."""
    return weighted_gr_sum(F, S, g, Elist, weights)


def GrLessInt(F, S, g, Elist, weights, ind=None):
    """sum_k w_k [G Gamma_ind G^+](E_k) -- integrate.GrLessInt parity
    (ind=None uses the total Sigma's Gamma)."""
    return weighted_gless_sum(F, S, g, Elist, weights, contact=ind)
