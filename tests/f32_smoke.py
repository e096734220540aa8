"""f32-regime smoke test (x64 disabled -- the TPU dtype environment).

The pytest suite runs with x64 for golden comparisons; this standalone
script exercises the main paths in the exact dtype regime the TPU uses:

    JAX_PLATFORMS=cpu python tests/f32_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64

import numpy as np  # noqa: E402


def main():
    from gaunegf_tpu.config import ExecutionConfig
    from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
    from gaunegf_tpu.models.fock import TightBindingFock
    from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy
    from gaunegf_tpu.ops.greens import EnergyEngine
    from gaunegf_tpu.scfe import NEGFE
    from gaunegf_tpu import transport as tr

    n = 24
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)

    # precision tiers
    g = ConstantSelfEnergy(H, S, [np.arange(4), np.arange(n - 4, n)],
                           sig1=-0.1j)
    E = np.linspace(-2, 2, 16)
    w = np.ones(16)
    st = np.asarray(g.sigmaTot(0.0)).astype(np.complex128)
    ref = sum(ww * np.linalg.inv(e * S - H - st) for e, ww in zip(E, w))
    for prec, tol in [("fast", 1e-4), ("mixed", 1e-4), ("high", 1e-5),
                      ("exact", 1e-7)]:
        eng = EnergyEngine(H, S, g, ExecutionConfig(precision=prec,
                                                    energy_chunk=8))
        out = eng.gr_sum(E, w)
        rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
        assert rel < tol, (prec, rel)
        print(f"gr_sum {prec}: rel {rel:.1e} OK")

    # Newton-Schulz continuation (dense grid + LU-fallback coarse grid)
    chn = EnergyEngine(H, S, g, ExecutionConfig(
        precision="mixed", energy_chunk=8, continuation=True)).gr_sum(E, w)
    rel = np.max(np.abs(chn - ref)) / np.max(np.abs(ref))
    assert rel < 1e-4, rel
    print(f"gr_sum continuation: rel {rel:.1e} OK")

    # chain contacts + transmission
    gc = Chain1DSelfEnergy(H, S, [np.arange(4), np.arange(4, 8)], eta=1e-3)
    T = tr.calculate_transmission(H, S, tr.SigmaSource(gc),
                                  np.linspace(-3, 3, 32))
    assert np.all(np.isfinite(T)) and T.max() > 0.5
    print(f"chain T(E): max {T.max():.3f} OK")

    # full SCF
    be = TightBindingFock(H, n_electrons=n, U=0.3, n0=0.5 * np.ones(n))
    negfe = NEGFE(be, name="/tmp/f32smoke", verbose=False,
                  exec_cfg=ExecutionConfig(energy_chunk=8))
    negfe.setSigma([1, 2], [n - 1, n], sig=-0.1j, T=0)
    negfe.setIntegralLimits(N1=64, N2=32)
    negfe.setVoltage(0.1, fermi=0.0)
    negfe.SCF(conv=1e-3, damping=0.05, max_cycles=40, checkpoint=False)
    assert negfe.conv_level < 1e-3
    print(f"NEGFE SCF: conv {negfe.conv_level:.1e} OK")
    print("f32 smoke: ALL OK")


if __name__ == "__main__":
    main()
