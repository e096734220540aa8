"""Generate Bethe-lattice golden data from the reference implementation.

Run manually: python tests/make_goldens_bethe.py

Uses the reference's Slater-Koster construction, FCC-neighbour generation
and surfGBAt fixed points directly (these need no Gaussian); stores the
parsed Au parameter set, constructed matrices and converged self-energies
into tests/golden/golden_bethe.npz.
"""

import os
import sys
import types

sys.path.insert(0, "/root/reference")

gauopen = types.ModuleType("gauopen")
gauopen.QCBinAr = types.ModuleType("gauopen.QCBinAr")
gauopen.QCOpMat = types.ModuleType("gauopen.QCOpMat")
sys.modules["gauopen"] = gauopen
sys.modules["gauopen.QCBinAr"] = gauopen.QCBinAr
sys.modules["gauopen.QCOpMat"] = gauopen.QCOpMat

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "golden")
os.makedirs(OUT, exist_ok=True)

har_to_eV = 27.211386


def parse_bethe(path):
    params = {}
    with open(path) as f:
        for line in f:
            line = line.replace(" ", "").strip()
            if not line:
                continue
            k, v = line.split("=")
            params[k] = float(v)
    return params


def main():
    from gauNEGF.surfGBethe import surfGB, surfGBAt

    data = {}
    for name in ("Au", "Au2"):
        params = parse_bethe(f"/root/reference/{name}.bethe")
        keys = sorted(params)
        data[f"{name}_keys"] = np.array(keys)
        data[f"{name}_vals"] = np.array([params[k] for k in keys])

    params = parse_bethe("/root/reference/Au.bethe")
    Edict = {k[1:]: params[k] * har_to_eV for k in params if k.startswith("e")}
    Sdict = {k[1:]: params[k] for k in params if k.startswith("S")}
    Vdict = {k: params[k] * har_to_eV for k in params
             if not k.startswith("e") and not k.startswith("S")}
    hdiag = [Edict["s"]] + [Edict["p"]] * 3 + [Edict["dd"]] + \
        [Edict["dt"]] * 2 + [Edict["dd"], Edict["dt"]]
    H0 = np.diag(hdiag)
    data["H0"] = H0

    dirs = [
        [0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0],
        [1 / np.sqrt(2), 0, 1 / np.sqrt(2)],
        [0.267261, 0.534522, 0.801784],
        [-0.5, -0.5, 1 / np.sqrt(2)],
    ]
    dirs = [np.asarray(d) / np.linalg.norm(d) for d in dirs]
    data["sk_dirs"] = np.stack(dirs)
    data["sk_V"] = np.stack([np.asarray(
        surfGB.constructMat(None, Vdict, d)) for d in dirs])
    data["sk_S"] = np.stack([np.asarray(
        surfGB.constructMat(None, Sdict, d)) for d in dirs])

    # neighbour directions
    normal = np.array([0.1, 0.2, 1.0])
    normal = normal / np.linalg.norm(normal)
    first = np.array([1.0, 0.1, 0.0])
    nvecs = surfGB.genNeighbors(None, normal, first)
    data["nn_normal"] = normal
    data["nn_first"] = first
    data["nn_vecs"] = np.stack([np.asarray(v) for v in nvecs])

    # surfGBAt fixed points, 12 directions from the detected set
    Slist = [np.asarray(surfGB.constructMat(None, Sdict, d)) for d in nvecs]
    Vlist = [np.asarray(surfGB.constructMat(None, Vdict, d)) for d in nvecs]
    g = surfGBAt(np.asarray(H0), [np.asarray(s) for s in Slist],
                 [np.asarray(v) for v in Vlist], eta=1e-6, T=0.0)
    Es = np.array([-8.0, -4.0, 0.0, 3.0])
    data["at_Es"] = Es
    data["at_sigmaK"] = np.stack(
        [np.asarray(g.sigmaK(float(E))) for E in Es])
    data["at_sigma"] = np.stack(
        [np.asarray(g.sigma(float(E))) for E in Es])
    data["at_sigmaTot_0"] = np.asarray(g.sigmaTot(0.0))
    data["at_F"] = np.asarray(g.F)
    data["at_S"] = np.asarray(g.S)
    # NOTE: the reference's surfGBAt.DOS is @jit over self and raises
    # TypeError when called; compute the same quantity from its sigma.
    dos = []
    for E in Es:
        sig = np.asarray(g.sigma(float(E))).sum(axis=0)
        Gr = np.linalg.inv((E - 1j * 1e-6) * np.eye(9) - H0 - sig)
        dos.append(-np.trace(Gr).imag / np.pi)
    data["at_DOS"] = np.array(dos)

    np.savez_compressed(os.path.join(OUT, "golden_bethe.npz"), **data)
    print(f"Wrote golden_bethe.npz with {len(data)} arrays")


if __name__ == "__main__":
    main()
