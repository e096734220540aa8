"""Reference-named compat facade (gaunegf_tpu.compat vs gauNEGF.* names).

Checks three things: (1) every public name of the reference's modules
exists under its original spelling, (2) the wrappers delegate faithfully
(numerical equality with the snake_case API), (3) install() makes verbatim
``import gauNEGF...`` scripts work.
"""

import sys

import numpy as np
import pytest

from gaunegf_tpu import compat
from gaunegf_tpu import density as d_tpu
from gaunegf_tpu import quadrature as q
from gaunegf_tpu.models.chain1d import Chain1DSelfEnergy
from gaunegf_tpu.models.selfenergy import ConstantSelfEnergy, form_sigma
from gaunegf_tpu.ops.greens import weighted_gr_sum

# The reference's public surface, module by module (SURVEY.md section 2.1;
# names verified against /root/reference/gauNEGF at round 4).
REFERENCE_NAMES = {
    "config": ["TEMPERATURE", "ETA", "ENERGY_STEP", "FERMI_CALCULATION_TOL",
               "FERMI_SEARCH_CYCLES", "SURFACE_GREEN_CONVERGENCE",
               "SURFACE_RELAXATION_FACTOR", "ADAPTIVE_INTEGRATION_TOL",
               "N_KT", "ENERGY_MIN", "MAX_CYCLES", "MAX_GRID_POINTS",
               "SCF_DAMPING", "SCF_CONVERGENCE_TOL", "SCF_MAX_CYCLES",
               "PULAY_MIXING_SIZE", "LOG_LEVEL", "LOG_PERFORMANCE"],
    "utils": ["inv", "eig", "eigh", "fractional_matrix_power"],
    "matTools": ["formSigma", "getDen", "getFock", "getEnergies",
                 "storeDen"],
    "integrate": ["GrInt", "GrLessInt"],
    "density": ["fermi", "getANTPoints", "integratePoints",
                "integratePointsAdaptiveANT", "density", "bisectFermi",
                "densityRealN", "densityReal", "densityGridN",
                "densityGridTrap", "densityGrid", "densityComplexN",
                "densityComplex", "calcEmin", "integralFit",
                "integralFitNEGF", "getFermiContact", "getFermi1DContact",
                "calcFermi", "calcFermiBisect", "calcFermiSecant",
                "calcFermiMuller", "calcFermiPolyFit"],
    "fermiSearch": ["DOSFermiSearch", "matrixFiniteDifference"],
    "surfG1D": ["surfG"],
    "surfGTester": ["surfGTest"],
    "surfGBethe": ["surfGB", "surfGBAt", "kB", "dim", "har_to_eV", "Eminf",
                   "bohr_to_ang"],
    "surfG3D": ["surfG3", "surfGAt", "kB", "dim", "har_to_eV", "Eminf"],
    "scf": ["NEGF", "har_to_eV", "V_to_au"],
    "scfE": ["NEGFE", "har_to_eV", "eoverh", "kB", "V_to_au", "AlphaDen",
             "BetaDen", "AlphaSCFDen", "BetaSCFDen", "AlphaFock", "BetaFock",
             "AlphaMOs", "BetaMOs", "AlphaEnergies", "BetaEnergies"],
    "transport": ["SigmaCalculator", "calculate_transmission",
                  "calculate_dos", "calculate_current", "current",
                  "currentSpin", "currentE", "currentF", "cohTrans",
                  "cohTransSpin", "DOS", "cohTransE", "cohTransSpinE",
                  "DOSE", "transmission_single_energy", "dos_single_energy"],
}
REFERENCE_NAMES["matTools"] += ["har_to_eV", "AlphaDen", "BetaDen",
                                "AlphaSCFDen", "BetaSCFDen", "AlphaFock",
                                "BetaFock", "AlphaEnergies", "BetaEnergies"]
REFERENCE_NAMES["density"] += ["har_to_eV", "kB", "FERMI_DEBUG"]
REFERENCE_NAMES["integrate"] += ["MAX_VMAP_MEMORY_GB", "FORCE_SYNCHRONOUS",
                                 "MEMORY_PER_MATRIX_FACTOR", "BYTES_TO_GB",
                                 "parallel_logger", "hostname", "pid",
                                 "log_level"]

# Reference class methods under their original camelCase spellings
# (module, class) -> methods; verified against /root/reference round 4.
REFERENCE_METHODS = {
    ("scf", "NEGF"): ["runDFT", "updateN", "setFock", "setDen",
                      "getHOMOLUMO", "setVoltage", "setContacts", "setSigma",
                      "getSigma", "FockToP", "PMix", "PToFock", "SCF",
                      "writeChk", "saveMAT"],
    ("scfE", "NEGFE"): ["setContactBethe", "setContact1D", "setSigma",
                        "setVoltage", "setIntegralLimits", "integralCheck",
                        "getSigma", "FockToP", "PToFock"],
    ("surfG1D", "surfG"): ["g", "setContacts", "setF", "sigma", "sigmaTot"],
    ("surfGTester", "surfGTest"): ["setF", "sigma", "sigmaTot"],
    ("surfGBethe", "surfGB"): ["genNeighbors", "readBetheParams",
                               "constructMat", "sigma", "sigmaTot",
                               "getSigma", "updateFermi", "setF",
                               "runAllTests", "testDOrbitalFunctions",
                               "testDOrbitalSymmetry", "testPDInteraction",
                               "testDDInteraction", "testHoppingPhysics"],
    ("surfGBethe", "surfGBAt"): ["sigmaK", "sigma", "sigmaTot", "setF",
                                 "updateH", "DOS", "calcFermi"],
    ("surfG3D", "surfG3"): ["genNeighbors", "readBetheParams",
                            "constructMat", "sigma", "sigmaTot", "getSigma",
                            "updateFermi", "setF", "runAllTests"],
    ("surfG3D", "surfGAt"): ["sigmaK", "sigma", "sigmaTot", "setF",
                             "updateH", "DOS", "calcFermi"],
    ("fermiSearch", "DOSFermiSearch"): ["getAccuracy",
                                        "matrixFiniteDifference", "step"],
}


def test_every_reference_name_exists():
    missing = [f"{m}.{n}" for m, names in REFERENCE_NAMES.items()
               for n in names if not hasattr(getattr(compat, m), n)]
    missing += [f"{m}.{c}.{n}" for (m, c), names in REFERENCE_METHODS.items()
                for n in names
                if not hasattr(getattr(getattr(compat, m), c), n)]
    assert not missing, f"compat facade is missing: {missing}"


def test_install_makes_gauNEGF_importable():
    assert "gauNEGF" not in sys.modules
    try:
        compat.install()
        from gauNEGF.density import densityComplexN  # noqa: F401
        from gauNEGF.surfGTester import surfGTest  # noqa: F401
        from gauNEGF.transport import cohTrans  # noqa: F401
        import gauNEGF.scf
        assert gauNEGF.scf is compat.scf
    finally:
        for k in [k for k in sys.modules if k.split(".")[0] == "gauNEGF"]:
            del sys.modules[k]


def test_install_refuses_to_shadow():
    sys.modules["gauNEGF"] = sys  # any foreign module
    try:
        with pytest.raises(RuntimeError):
            compat.install()
    finally:
        del sys.modules["gauNEGF"]


def _tb(n=16, nc=3):
    rng = np.random.default_rng(0)
    H = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(0.1 * rng.standard_normal(n))
    S = np.eye(n)
    inds = [np.arange(nc), np.arange(n - nc, n)]
    return H, S, inds


def test_formSigma_matches_form_sigma():
    H, S, inds = _tb()
    a = compat.matTools.formSigma(inds[0], -0.1j, 16)
    b = form_sigma(inds[0], -0.1j, 16, None)
    np.testing.assert_array_equal(a, b)
    # matrix V with explicit S
    V = np.full((3, 3), -0.05j)
    a = compat.matTools.formSigma(inds[0], V, 16, S)
    b = form_sigma(inds[0], V, 16, S)
    np.testing.assert_array_equal(a, b)


def test_getANTPoints_and_fermi():
    x, w = compat.density.getANTPoints(8)
    x2, w2 = q.ant_points(8)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(w, w2)
    assert compat.density.fermi(0.0, 0.1, 300.0) == \
        q.fermi_dirac(0.0, 0.1, 300.0)


def test_GrInt_matches_engine():
    H, S, inds = _tb()
    g = ConstantSelfEnergy(H, S, inds, sig1=-0.1j)
    E = np.linspace(-1.5, 1.5, 6) + 0.05j
    w = np.linspace(0.5, 1.0, 6)
    a = compat.integrate.GrInt(H, S, g, E, w)
    b = weighted_gr_sum(H, S, g, E, w)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_densityComplexN_matches_snake():
    H, S, inds = _tb()
    g = compat.surfGTester.surfGTest(H, S, inds, sig1=-0.1j)
    a = compat.density.densityComplexN(H, S, g, -3.0, 0.0, N=16,
                                       showText=False)
    b = d_tpu.density_complex_n(H, S, g, -3.0, 0.0, N=16, verbose=False)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


def test_integratePointsAdaptiveANT_converges():
    # ANT nodes live on (-1, 1): integral of exp(x) there is e - 1/e
    def compute(x, w):
        return np.sum(w * np.exp(x))

    val = compat.density.integratePointsAdaptiveANT(compute, tol=1e-8,
                                                    maxN=729)
    assert abs(val - (np.e - np.exp(-1.0))) < 1e-6


def test_surfG_compat_kwargs():
    H, S, inds = _tb()
    a = compat.surfG1D.surfG(H, S, inds)
    b = Chain1DSelfEnergy(H, S, inds)
    E = 0.3 + 1e-3j
    np.testing.assert_allclose(np.asarray(a.sigmaTot(E)),
                               np.asarray(b.sigmaTot(E)),
                               rtol=0, atol=1e-10)
    # reference protocol surface survives the wrapper
    for name in ("sigma", "sigmaTot", "setF", "F", "S"):
        assert hasattr(a, name)


def test_DOSFermiSearch_camel_kwargs():
    # nonzero initial Ef: the predictor seeds deltaEf = initialEf and uses
    # h = min(deltaE, |deltaEf|/10), so Ef=0 is degenerate (reference
    # fermiSearch.py:152 behaves identically)
    s = compat.fermiSearch.DOSFermiSearch(1.0, 10.0, deltaE=0.05,
                                          numPoints=3)
    dos = lambda E: 5.0 + 0.0 * np.asarray(E)  # flat DOS
    Ef = s.step(dos, 8.0, stepLim=1.0)
    assert np.isfinite(Ef)
    assert np.isfinite(s.getAccuracy())


def test_NEGF_gaussian_constructor_roundtrip():
    import fake_gauopen

    n = 6
    rng = np.random.default_rng(3)
    H0 = -1.0 * (np.eye(n, k=1) + np.eye(n, k=-1)) \
        + np.diag(rng.uniform(-0.2, 0.2, n))
    S = np.eye(n)
    fake_gauopen.install()
    try:
        fake_gauopen.configure(H0, S, ibfatm=np.arange(1, n + 1), ne=n,
                               U=0.3)
        negf = compat.scf.NEGF("/tmp/compat_negf", basis="6-31G(d)",
                               func="b3lyp", nPulay=3, verbose=False)
        negf.setSigma([1, 2], [n - 1, n], sig=-0.1j)
        negf.setVoltage(0.0, fermi=0.0)
        negf.SCF(conv=1e-10, damping=0.05, max_cycles=2)
        assert np.isfinite(negf.P).all()
    finally:
        fake_gauopen.uninstall()
