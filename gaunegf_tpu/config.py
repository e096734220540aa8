"""Configuration for gaunegf_tpu.

The reference (gauNEGF/config.py:1-34) uses module-level constants bound at
import time.  Here the same names exist as module-level *defaults*, but all
runtime behaviour is driven by frozen dataclasses that can be overridden per
call / per driver instance (SURVEY.md section 7.1 design delta).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Module-level defaults (names match gauNEGF/config.py:7-33 exactly)
# ---------------------------------------------------------------------------

# Physical parameters
TEMPERATURE = 0.0               # Kelvin - ambient temperature
ETA = 1e-6                      # eV - broadening parameter
ENERGY_STEP = 0.001             # eV - default energy step size

# Contact tolerances
FERMI_CALCULATION_TOL = 1e-3        # Fermi energy calculation tolerance
FERMI_SEARCH_CYCLES = 10            # Cycles to run search before returning
SURFACE_GREEN_CONVERGENCE = 1e-5    # Surface Green's function convergence
SURFACE_RELAXATION_FACTOR = 0.1     # Mixing factor for surface-GF iteration

# Integration parameters
ADAPTIVE_INTEGRATION_TOL = 1e-4     # Adaptive integration tolerance
N_KT = 10                           # Number of kT for integration limits
ENERGY_MIN = -1e6                   # eV - lower bound for energy integration
MAX_CYCLES = 1000                   # Maximum iteration cycles
MAX_GRID_POINTS = 1000              # Maximum number of grid points

# SCF parameters
SCF_DAMPING = 0.02              # SCF damping parameter
SCF_CONVERGENCE_TOL = 1e-3      # SCF convergence tolerance
SCF_MAX_CYCLES = 100            # Maximum SCF cycles
PULAY_MIXING_SIZE = 4           # Number of iterations for Pulay mixing

# Logging
LOG_LEVEL = "INFO"
LOG_PERFORMANCE = False

# Surface-GF iteration budgets (reference: surfG1D.py:265, surfGBethe.py:998)
SURFACE_MAX_ITER_1D = 2000
SURFACE_MAX_ITER_BETHE = 1000
SURFACE_BETHE_MIX = 0.5

# TPU execution parameters (new; no reference equivalent)
DEFAULT_ENERGY_CHUNK = 0        # energies solved per device per jit step;
                                # 0 = auto: largest power of two with
                                # ~72*N^2*chunk bytes of live solve
                                # buffers under ~7 GB, clamped to [1, 32]
                                # (32 up to N~1300, 16 at N=2000, 4 at
                                # N=4000 -- the measured-optimal sizes)
LU_BLOCK_SIZE = 0               # panel width for the blocked complex LU;
                                # 0 = auto (256 for N >= 1536 else 128 --
                                # measured crossover on TPU v5e, round 2)


# ---------------------------------------------------------------------------
# Frozen dataclass configs
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SurfaceConfig:
    """Surface self-energy iteration settings (reference surfG1D.py:223-295)."""
    conv: float = SURFACE_GREEN_CONVERGENCE
    relaxation: float = SURFACE_RELAXATION_FACTOR
    max_iter: int = SURFACE_MAX_ITER_1D
    eta: float = ETA
    method: str = "sancho"      # 'sancho' (fast decimation) or 'dyson' (reference-faithful)


@dataclass(frozen=True)
class IntegrationConfig:
    """Quadrature / density integration settings (reference density.py)."""
    tol: float = ADAPTIVE_INTEGRATION_TOL
    n_kt: int = N_KT
    e_min_inf: float = ENERGY_MIN
    max_cycles: int = MAX_CYCLES
    max_grid_points: int = MAX_GRID_POINTS
    temperature: float = TEMPERATURE


@dataclass(frozen=True)
class SCFConfig:
    """SCF driver settings (reference scf.py:691-813)."""
    conv: float = SCF_CONVERGENCE_TOL
    damping: float = SCF_DAMPING
    max_cycles: int = SCF_MAX_CYCLES
    pulay_size: int = PULAY_MIXING_SIZE
    checkpoint: bool = True
    pulay: bool = True


@dataclass(frozen=True)
class ExecutionConfig:
    """TPU execution policy: precision, chunking and sharding."""
    # 'fast'   : f32/complex64 blocked LU, no refinement (~1e-5)
    # 'mixed'  : f32 blocked LU + iterative refinement (default on TPU, ~2e-6)
    # 'high'   : double-word (two-float) end to end (~7e-8)
    # 'exact'  : 'high' + a final Newton step with error-free Ozaki-sliced
    #            residual matmuls (~1e-12: f64-class from the f32 MXU)
    # 'strict' : complex128 LAPACK path (CPU) / x64 (where supported)
    precision: str = "mixed"
    refine_steps: int = 1   # Newton refinement squares the error: one step
                            # takes complex64 LU from ~2e-5 to ~3e-6 rel
    energy_chunk: int = DEFAULT_ENERGY_CHUNK
    lu_block: int = LU_BLOCK_SIZE   # 0 = auto by matrix size
    # 'split' (default): recursive half-panel factorization -- rank-1
    #   eliminations touch base-width strips, deferred inter-strip
    #   updates run as MXU matmuls (measured +53% at N=1000, 5-7x at
    #   N=2000 over 'virtual', round 2); 'scan': the same strip algebra
    #   as ONE lax.scan body (graph stops growing with panel width: the
    #   cold-compile fix -- round 3); 'virtual': transposed-layout
    #   virtually-pivoted panel (no lane-dim dynamic indexing, the
    #   round-1 default); 'xla': swap-based fused loop; 'fused':
    #   single-Pallas-program panel (device-correct; loses the round-2
    #   A/B to 'split' but compiles ~4x faster); 'fused3': the fused
    #   kernel with manual bf16-split dots (half the MXU passes; factor
    #   quality ~1e-4 -- pair with 'mixed', whose Newton polish is
    #   residual-floor- not seed-limited); 'pstrip': the scan panel with
    #   each 32-column strip eliminated by ONE Pallas program (VPU-only
    #   in-kernel loop, deferred updates stay in XLA; f32-only -- falls
    #   back to the XLA strips on complex128).  Device-correct
    #   but a perf wash: the round-3 profile showed the strip loops cost
    #   only ~42 ms of N=2000's 594 ms while bucket (and the tri-inv fori
    #   base cases were ruled out the same way -- see zlinalg
    #   _tri_inv_lower_unit).  Kept opt-in.  'psplit': the split
    #   recursion with each base strip eliminated by the same Pallas
    #   program (hierarchical matmul inter-strip updates + VMEM strip
    #   elimination; lanes bucket-padded to 256s).  'pallas': the round-1
    #   masked-select kernel (experimental).  All produce the identical
    #   partial-pivot sequence (up to near-tie pivots in 'fused3').
    lu_panel: str = "auto"   # auto: 'scan' below N=1536, 'split' above
    # trailing-update / substitution matmul budget inside the blocked LU
    # (zlinalg._mm_trail): 'hi' = f32 HIGHEST (6 MXU passes per real
    # product); 'high' = lax.Precision.HIGH (3 passes, ~2^-15 -- the
    # mixed tier's Newton polish absorbs the seed error); 'bf3' = three
    # explicit one-pass bf16 products (bit-masked splits).
    lu_trail: str = "hi"
    # energy-grid solver family: 'lu' = per-point blocked LU (the round-1/2/3
    # engines); 'spectral' = one eigendecomposition of the (H, S) pencil per
    # Fock + rank-k Woodbury contact corrections per energy (O(N^2 k) per
    # point instead of O(N^3); ops/spectral.py), silently falling back to
    # 'lu' when the provider's Sigma is not (background + contact-block) or
    # the pencil is not real-symmetric-definite; 'auto' (default since
    # round 4) = 'spectral' with that same fallback.  Flipped after the
    # round-4 device evidence: with analytic pole deflation + the union
    # Rayleigh-Ritz basis refinement the spectral route is BOTH faster
    # (e49: N=1000 bench grid 1343.9 pts/s vs LU 216.6) and more accurate
    # near the real axis (e41: LU mixed floors at cond*u_res on near-pole
    # grids -- PARITY.md) on the fast/mixed tiers; high/exact tiers keep
    # the LU engines.
    solver: str = "auto"
    # spectral route: minimum host-checked PER-POINT distance
    # min_n |z - c0 - lam_n| at which the f32 assembly is safe; closer
    # points use the double-word assembly (near-pole Woodbury
    # cancellation; see ops/spectral.py).  The grid is partitioned per
    # point into f32/dw segments sharing one dispatch.  Measured
    # per-point error vs x64 truth (round-4 session 3, N=400 junction):
    # f32 holds 0.7-2.6e-6 for dist >= 1e-4, then degrades (8e-6 at
    # 3e-5, 3e-4 at 1e-5); the dw tier holds ~5e-7 everywhere
    spectral_dist_f32: float = 1e-4
    # below this distance even the dw assembly floors (~eps_dw * |D|);
    # such points are individually routed through the LU engines (they are
    # well-conditioned THERE: the contact coupling regularizes A)
    spectral_dist_lu: float = 1e-5
    # dw-assembly product tier: 'lite' = reduced-slice Ozaki leading
    # products with bf16-exact one-pass slice matmuls (~1e-13 per product,
    # ~4x fewer MXU passes -- zlinalg.matmul_ozaki_lite); 'full' = the
    # round-4-early error-free products (~3.6e-15).  'lite' keeps
    # product error * |D| <= 1e-8 over the whole dw range, two decades
    # under the mixed contract
    spectral_dw: str = "lite"
    # analytic pole deflation (round-4 session 4): points closer than
    # dist_f32 are served by an f32 assembly that treats their m nearest
    # eigenmodes via a block Sherman-Morrison identity in which every
    # 1/(z-lam) cancellation resolves in CLOSED FORM (the near-near block
    # collapses to S_m^-1 = (diag(z-lam_near) - B_m)^-1, all O(1)
    # intermediates; z-lam_near is computed in double-word, so no
    # catastrophic cancellation anywhere).  This replaces BOTH the
    # double-word near-pole segment and the per-point LU fallback
    # (spectral_dist_lu) -- arbitrary pole distances, including exact
    # real-axis hits, run in the single f32-family dispatch.  Value =
    # number of deflated modes per point (must cover every eigenvalue
    # within ~dist_f32 of the point; 8 covers spacing down to
    # ~dist_f32/2, i.e. N ~ 100k on a 4 eV band).  0 restores the
    # round-4-session-3 dw-segment + LU-fallback ladder.
    spectral_deflate: int = 8
    # where the once-per-Fock eigendecomposition runs: 'host' (f64 LAPACK
    # divide-and-conquer drivers, the accuracy reference; 1-3 s at
    # N=2000) or 'device' (f32 XLA eigh + Ogita-Aishima double-word
    # refinement, all-MXU).  'auto' = 'device' on accelerator backends
    # when N >= spectral_basis_device_min_n, else 'host' (round 5).  The
    # round-4 recall (raw QDWH eigh has bf16-grade backward error, e57)
    # was closed by the robust pipeline (clamped close-pair rotations +
    # Newton-Schulz polar re-orthonormalization in a to-tolerance
    # while_loop), validated on device by e60: N=2000 lam err 2.1e-11
    # vs host f64, end-to-end truth error 5.59e-07 == the host basis
    # exactly.  Why size-gated: grids run the same speed on either basis
    # (both trees are device-resident, e61), so the basis choice is a
    # pure setup-cost race per Fock -- host f64 evd eigh costs 1.8 s at
    # N=2000 / 13.3 s at N=4096 / ~2 min at 8k (O(N^3) on one core),
    # while the device pipeline's warm wall is ~3 s nearly flat; the
    # interleaved same-window SCF A/B (e63) measured host-basis cycles
    # 8.5-9.0 s vs device 11.0-12.8 s at N=2000, so small-N SCF keeps
    # the host eigh and large N moves on-chip.  A refused robust gauge
    # falls back to the host basis automatically.
    spectral_basis: str = "auto"
    # N at/above which 'auto' picks the device basis on accelerators
    # (see spectral_basis).  0 = always device on accelerators.
    spectral_basis_device_min_n: int = 3072
    # warm-start the device basis across Focks: seed the Ogita-Aishima
    # refinement with the previous accepted eigenvectors of the same
    # (N, S) system, skipping the f32 eigh.  Gated on the refined
    # all-pair residual coupling (ops/spectral._WARM_S_TOL); a rejected
    # seed falls back to the cold eigh, so accuracy never depends on the
    # SCF step size.  Off by default: dense spectra (band-edge clusters
    # tighter than any SCF step) reject the seed every cycle by design,
    # and the cold eigh is cheap on a healthy link (e56: 0.6 s at
    # N=2000), so the gate only pays off for well-separated spectra.
    spectral_warm_basis: bool = False
    # near-pole accuracy guard (round-5, VERDICT r4 item 5): the fast and
    # mixed LU tiers floor at ~cond * u_res, which silently violates their
    # accuracy contract on real-axis grid points close to a bare
    # eigenvalue of the (H, S) pencil (PARITY.md round-4 caveat; measured
    # 1.66e-1 at dist 4.4e-7, e41).  When True, LU-path dispatches on
    # such grids emit a RuntimeWarning (host-side, once per grid,
    # distances against the cached spectral-basis eigenvalues) suggesting
    # solver='auto'/'spectral' or the high/exact tiers.  The spectral
    # route itself needs no guard: its deflated assembly serves arbitrary
    # pole distances within contract.
    near_pole_warn: bool = True
    # distribute the LU factorization itself over the 'm' mesh axis
    # (zlinalg.zsolve_dist: panel-cyclic columns, one broadcast per
    # panel).  Off by default: the replicated LU has no broadcast latency
    # on the critical path and wins at single-chip-fitting sizes; turn on
    # for N >~ 8k junctions (any N: the solver pads to the panel-cyclic
    # layout internally).
    distribute_lu: bool = False
    # low-rank contact fast path: transmission/G< solve only the contact
    # columns of G (LU cost unchanged, triangular solves shrink N->nc).
    # Neglects the -1j*1e-9*S broadening background's Gamma (~1e-9 rel).
    use_lowrank: bool = True
    # warm-start provider fixed points from the previous energy along each
    # lane's contiguous grid segment (providers exposing
    # contacts_warm_apply, e.g. Bethe lattices)
    warm_start: bool = True
    # Newton-Schulz continuation: track G(E) along each lane's contiguous
    # grid segment by quadratic inverse iteration from the neighbouring
    # energy (pure MXU matmuls) instead of a fresh LU factorization, with
    # a residual-gated batched-LU fallback (first point of each segment,
    # resonances, coarse grids).  Pays off on dense sorted sweeps where
    # |dE| * ||S G|| << 1.  Values: False (off); True (all grids);
    # "contour" (default) -- grid-aware: ONLY the equilibrium contour
    # scan of the fused density dispatches rides continuation (round-1
    # standalone contour A/B +43%; round-3 on-device NEGFE SCF cycle A/B
    # at N=1000: 2.00 -> 1.18 s/cycle, dP 7.6e-8) while real-axis
    # segments keep the batched LU (continuation loses near resonances).
    # On x64/CPU the chain's exact-residual polish keeps the contour
    # path within ~1e-10 of the batched-LU path.
    continuation: object = "contour"
    # plain Newton-Schulz iterations per continuation step (0 = auto:
    # 2 for 'mixed' -- the double-float polish squares once more -- and
    # 3 for 'fast')
    chain_steps: int = 0


def replace(cfg, **kwargs):
    """Functional update helper for the frozen configs."""
    return dataclasses.replace(cfg, **kwargs)
