"""e50: bisect the e36 bz_symmetry=False non-finite T(E) (device only).

e45's re-run left one leg non-finite: nk=6, bz_symmetry=False (the
SHIFTED k grid; the gamma-centred reduced grid is clean at 257-286
pts/s).  CPU f32 on the identical path is finite, so a device-specific
rounding difference tips something marginal.  Hypotheses, probed in
order:
1. WHICH energies/k-points go non-finite: per-E provider Sigma scan,
   then per-k surface_g_sancho map at the first bad energy.
2. Marginal decimation: retry the bad (E, k) with eta=1e-4 and
   max_iter=128 -- if finite, the Sancho iteration at eta=1e-5 is
   borderline and needs a robustness guard, not a precision fix.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e50_kspace_nonfinite.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep
from e36_kspace_tpu import _plane_geometry


def main():
    prep()
    import jax
    import jax.numpy as jnp

    import gaunegf_tpu
    from gaunegf_tpu.models import kspace as ks
    from gaunegf_tpu.models.lattice3d import Lattice3DSelfEnergy
    from gaunegf_tpu.ops import zlinalg as zl
    from gaunegf_tpu.ops.complexio import call_complex_safe

    lat = os.path.join(os.path.dirname(gaunegf_tpu.__file__), "data",
                       "Au.bethe")
    geom = _plane_geometry()
    n_orb = 4 * 9 + 4
    F = np.zeros((n_orb, n_orb))
    S = np.eye(n_orb)
    prov = Lattice3DSelfEnergy(
        F, S, [[1, 2, 3, 4]], geom, lat_file=lat, eta=1e-5,
        T=0.0, fermi=0.0, verbose=False, gamma_point_only=False,
        nk=6, bz_symmetry=False)
    fn, params = prov.total_apply()

    E = np.linspace(-11.0, -7.0, 32)
    bad_E = []
    for e in E:
        sig = np.asarray(call_complex_safe(fn, params, complex(e)))
        if not np.isfinite(sig).all():
            bad_E.append(float(e))
    log(f"non-finite Sigma at {len(bad_E)}/32 energies: {bad_E[:6]}")
    if not bad_E:
        if os.environ.get("E50_FORCE_E"):      # CPU path check
            bad_E = [float(os.environ["E50_FORCE_E"])]
        else:
            print("RESULT all finite -- cannot reproduce; exiting",
                  flush=True)
            return
    e0 = bad_E[0]

    # per-k decimation map at e0 (the provider's own Bloch blocks)
    kp = prov.params()["contacts"][0]

    def per_k_map(eta, max_iter):
        def f(params_s, e_s):
            from gaunegf_tpu.ops.complexio import merge_tree, split_traced
            p, e = merge_tree((params_s, e_s))
            cdt = jnp.complex64
            z = e + 1j * eta
            H00, S00, H01, S01 = ks._bloch_blocks(
                p["H"].astype(cdt), p["S"].astype(cdt),
                p["V"].astype(cdt), p["plane_ph"].astype(cdt),
                p["down_ph"].astype(cdt))
            A = z * S00 - H00
            B = z * S01 - H01

            def per_k(Ak, Bk):
                g = ks.surface_g_sancho(Ak, Bk,
                                        ks.SURFACE_GREEN_CONVERGENCE,
                                        max_iter)
                sig = zl._mm(zl._mm(Bk, g), jnp.conj(Bk).T)
                return (jnp.max(jnp.abs(g)), jnp.max(jnp.abs(sig)),
                        jnp.isfinite(jnp.abs(g)).all()
                        & jnp.isfinite(jnp.abs(sig)).all())

            return split_traced(jax.vmap(per_k)(A, B))

        pt = {k: kp[k] for k in ("H", "S", "V", "plane_ph", "down_ph")}
        out = call_complex_safe(f, pt, complex(e0))
        gmax, smax, fin = (np.asarray(x) for x in out)
        return gmax, smax, fin

    gmax, smax, fin = per_k_map(1e-5, 64)
    bad_k = np.where(~fin)[0]
    log(f"E={e0:.3f}: {bad_k.size}/{fin.size} bad k points "
        f"(gmax range {np.nanmin(gmax):.2e}..{np.nanmax(gmax):.2e})")
    print(f"RESULT bad_k={bad_k[:8].tolist()} of {fin.size}", flush=True)

    for eta, mi in ((1e-5, 128), (1e-4, 64), (1e-4, 128)):
        _, _, fin2 = per_k_map(eta, mi)
        print(f"RESULT eta={eta:.0e} max_iter={mi}: "
              f"bad={int((~fin2).sum())}/{fin2.size}", flush=True)


if __name__ == "__main__":
    main()
