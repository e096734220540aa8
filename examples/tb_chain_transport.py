"""End-to-end transport on a tight-binding chain junction (no Gaussian).

The minimum end-to-end slice of SURVEY.md section 7.3: wide-band contacts on a
TB chain -> transmission, DOS and Landauer current, optionally sharded over
a device mesh.  Run: python examples/tb_chain_transport.py
"""

import numpy as np

from gaunegf_tpu import transport as tr
from gaunegf_tpu.parallel.mesh import energy_mesh


def main():
    n = 64
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1))
    S = np.eye(n)

    # wide-band-limit contacts: Gamma = 0.2 eV on the 4 end sites each
    n_c = 4
    sig = np.zeros((n, n), dtype=complex)
    sig[np.ix_(range(n_c), range(n_c))] = -0.1j * np.eye(n_c)
    sig2 = np.zeros((n, n), dtype=complex)
    sig2[np.ix_(range(n - n_c, n), range(n - n_c, n))] = -0.1j * np.eye(n_c)

    mesh = energy_mesh()      # all local devices on the energy axis
    source = tr.SigmaSource(sig, sig2)

    E = np.linspace(-3, 3, 400)
    T = tr.calculate_transmission(H, S, source, E, mesh=mesh,
                                  checkpoint_file="/tmp/tb_trans.npz")
    dos_tot, dos_site = tr.calculate_dos(H, S, source, E, mesh=mesh)
    I = tr.calculate_current(H, S, source, fermi=0.0, qV=0.5, T=300.0,
                             dE=0.01, mesh=mesh)
    print(f"max T(E) = {T.max():.3f}  (ideal single channel -> ~1)")
    print(f"integrated DOS a.u. = {np.trapezoid(dos_tot, E):.1f}")
    print(f"I(V=0.5V, 300K) = {I:.3e} A")


if __name__ == "__main__":
    main()
