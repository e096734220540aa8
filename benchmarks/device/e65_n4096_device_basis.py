"""e65: device-basis accuracy at N=4096 (the size-gated default regime).

The round-5 gate routes N >= 3072 to the robust device basis; e60
validated accuracy at N=2000 only.  Here: gr_sum on a 16-pt real-axis
grid at N=4096 with basis='device' vs basis='host' (the f64 accuracy
reference) -- agreement at the mixed contract (~1e-6 of the sum scale)
validates the default; a refusal or larger gap demotes the gate
threshold.  Also reports the robust path/steps/gauge and both setup
walls (host evd eigh measured 13.3 s on this 1-core host).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/device/e65_n4096_device_basis.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import numpy as np
from _device_common import log, prep, tb_system


def main():
    prep()
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.ops import spectral as sp
    from gaunegf_tpu.ops.greens import EnergyEngine

    N = 4096
    H, S, g = tb_system(N)
    E = np.linspace(-2.0, 2.0, 16)
    w = np.ones(16)
    outs = {}
    for basis in ("host", "device"):
        t0 = time.time()
        eng = EnergyEngine(H, S, g, ExecutionConfig(
            precision="mixed", solver="spectral", spectral_basis=basis))
        r = eng._spectral_runner()
        assert r is not None
        setup = time.time() - t0
        is_dev = r._basis_is_device
        path = getattr(sp.device_basis, "last_path", None)
        steps = getattr(sp.device_basis, "last_steps", None)
        outs[basis] = np.asarray(eng.gr_sum(E, w))
        print(f"RESULT basis={basis}: setup {setup:.1f}s is_device={is_dev}"
              + (f" path={path} steps={steps}" if basis == "device" else ""),
              flush=True)
    scale = np.abs(outs["host"]).max()
    rel = float(np.abs(outs["device"] - outs["host"]).max() / scale)
    print(f"RESULT N=4096 device-vs-host basis gr_sum agreement: {rel:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
