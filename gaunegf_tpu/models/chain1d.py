"""Semi-infinite 1D-chain surface Green's function self-energy.

Capability parity with surfG1D.surfG (surfG1D.py:13-399): three construction
patterns (auto-extraction from F/S, custom coupling, fully specified
contacts), chemical-potential shifting via set_fock, and the provider
protocol sigma/sigmaTot.

TPU-first design choices (vs the reference's per-call Dyson loop):

* Two interchangeable fixed-point solvers, both jitted, vmappable over the
  energy batch and free of data-dependent Python control flow:
  - 'sancho': Lopez Sancho-Rubio decimation -- quadratic convergence
    (~15 iterations replace the reference's <=2000 linear Dyson iterations,
    surfG1D.py:264-295), implemented as a lax.while_loop whose state
    converges per-lane under vmap.
  - 'dyson': the reference's relaxed fixed point g <- inv(A - B g B+)
    (mix 0.1, <=2000 iters) for bit-level behavioural comparison.
* The provider is (params pytree, pure staticmethods), so the energy-batched
  engines trace once and reuse the executable across SCF iterations
  (the reference re-jits and even clears caches each voltage step,
  scfE.py:208).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gaunegf_tpu.config import (
    ETA, SURFACE_GREEN_CONVERGENCE, SURFACE_MAX_ITER_1D,
    SURFACE_RELAXATION_FACTOR)
from gaunegf_tpu.models.selfenergy import _CompatMixin
from gaunegf_tpu.ops import zlinalg as zl

__all__ = ["Chain1DSelfEnergy", "surface_g_sancho", "surface_g_dyson"]


def _zinv(A):
    return zl.zinv(A)


@partial(jax.jit, static_argnames=("max_iter",))
def surface_g_sancho(A, B, conv=SURFACE_GREEN_CONVERGENCE, max_iter=64):
    """Surface GF g = inv(A - B g B+) by Sancho-Rubio decimation.

    A = (E + i*eta) * S_alpha - alpha   (renormalized "omega - h" block)
    B = (E + i*eta) * S_beta - beta     (renormalized hopping block)

    Each iteration doubles the effective chain length, so convergence is
    quadratic; the loop state is (eps_s, eps, al, be, c, diff, count).

    The couplings are carried BALANCED with a joint exponent: near a
    band feature the doubling drives al and be in OPPOSITE exponential
    directions (their products stay O(1), but the factors reach 1e26+
    and the squaring update overflows f32 one iteration before
    convergence -- e36's non-finite k-space T(E), bisected round-4
    session 4: al 1e-14 / be 7e+26 at the same step while f64 converges
    on range alone).  Only the PRODUCTS al*g*be enter the eps updates,
    so al and be are renormalized to max-norm 1 each step and the joint
    log2 scale c is carried as a scalar: agb = (al_t g be_t) * exp2(c),
    c' = 2c + log2(sa * sb).  exp2(c) underflowing to 0 IS convergence
    (the coupling through the doubled chain has died)."""
    dt = A.dtype
    rdt = jnp.zeros((), dt).real.dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, rdt)

    def cond(state):
        eps_s, eps, al, be, c, diff, count = state
        return (diff > conv) & (count < max_iter)

    def body(state):
        eps_s, eps, al, be, c, _, count = state
        g = _zinv(eps)
        # explicit HIGHEST: a bare @ runs one-pass bf16 on TPU, which
        # floors the decimation's convergence metric and can blow up the
        # doubling transients (e36: non-finite k-space T(E) on device)
        scale = jnp.exp2(c).astype(rdt)
        agb = zl._mm(zl._mm(al, g), be) * scale
        bga = zl._mm(zl._mm(be, g), al) * scale
        eps_s_new = eps_s - agb
        eps_new = eps - agb - bga
        al_new = zl._mm(zl._mm(al, g), al)
        be_new = zl._mm(zl._mm(be, g), be)
        # power-of-two norms: dividing by them is EXACT (mantissas
        # untouched), so balancing is bit-transparent to the recursion
        sa = jnp.exp2(jnp.ceil(jnp.log2(
            jnp.maximum(jnp.max(jnp.abs(al_new)), tiny))))
        sb = jnp.exp2(jnp.ceil(jnp.log2(
            jnp.maximum(jnp.max(jnp.abs(be_new)), tiny))))
        c_new = 2.0 * c + jnp.log2(sa) + jnp.log2(sb)
        diff = jnp.max(jnp.abs(eps_s_new - eps_s)) / jnp.maximum(
            jnp.max(jnp.abs(eps_s_new)), 1e-30)
        return (eps_s_new, eps_new, al_new / sa, be_new / sb, c_new,
                diff, count + 1)

    # constant-seeded carries tied to A's shard_map varying-ness
    init = (A.astype(dt), A.astype(dt), B.astype(dt),
            jnp.conj(B).T.astype(dt),
            zl._tie_vma(jnp.zeros((), rdt), A),
            # pin the inf carry to the computation's real dtype (under
            # x64 a bare inf is f64, mismatching an f32-input body)
            zl._tie_vma(jnp.asarray(jnp.inf, rdt), A),
            zl._tie_vma(jnp.zeros((), jnp.int32), A))
    eps_s, *_ = lax.while_loop(cond, body, init)
    return _zinv(eps_s)


@partial(jax.jit, static_argnames=("max_iter",))
def surface_g_dyson(A, B, conv=SURFACE_GREEN_CONVERGENCE,
                    relax=SURFACE_RELAXATION_FACTOR,
                    max_iter=SURFACE_MAX_ITER_1D):
    """Reference-faithful relaxed Dyson fixed point (surfG1D.py:264-295).

    g <- relax * inv(A - B g B+) + (1 - relax) * g, from g0 = inv(A),
    with the same relative-change convergence metric.
    """
    B_dag = jnp.conj(B).T

    def cond(state):
        count, diff, g = state
        return (diff > conv) & (count < max_iter)

    def body(state):
        count, diff, g = state
        g_new = _zinv(A - zl._mm(zl._mm(B, g), B_dag))
        dg = jnp.abs(g_new - g) / jnp.maximum(jnp.abs(g_new), 1e-12)
        diff = jnp.max(dg)
        g = g_new * relax + g * (1 - relax)
        return (count + 1, diff, g)

    count, diff, g = lax.while_loop(
        cond, body, (zl._tie_vma(jnp.zeros((), jnp.int32), A),
                     zl._tie_vma(jnp.asarray(jnp.inf, jnp.real(A).dtype),
                                 A), _zinv(A)))
    return g


from functools import lru_cache


@lru_cache(maxsize=None)
def _chain_surface_fn(eta, method, conv):
    def fn(contact, E):
        A = (E + 1j * eta) * contact["Salpha"] - contact["alpha"]
        B = (E + 1j * eta) * contact["Sbeta"] - contact["beta"]
        if method == "dyson":
            return surface_g_dyson(A, B, conv)
        return surface_g_sancho(A, B, conv)

    return fn


@lru_cache(maxsize=None)
def _chain_contact_fn(static_key, i: int):
    """Pure sigma_i(params, E) with identity cached on the static geometry,
    so engine jit caches survive SCF parameter updates."""
    inds, N, eta, method, conv = (
        static_key[0], static_key[1], static_key[2], static_key[3],
        static_key[4])

    def fn(params, E):
        blk = Chain1DSelfEnergy._sigma_block(
            params["contacts"][i], E, eta, conv, method)
        sig = jnp.zeros((N, N), dtype=blk.dtype)
        ix = np.ix_(np.asarray(inds[i]), np.asarray(inds[i]))
        return sig.at[ix].add(blk)

    return fn


@lru_cache(maxsize=None)
def _chain_total_fn(static_key):
    inds = static_key[0]

    def fn(params, E):
        sig = _chain_contact_fn(static_key, 0)(params, E)
        for i in range(1, len(inds)):
            sig = sig + _chain_contact_fn(static_key, i)(params, E)
        return sig

    return fn


@lru_cache(maxsize=None)
def _chain_contacts_warm_fn(static_key):
    """Warm provider fn: (params, E, state) -> (per-contact sigmas, state').

    Each contact's surface fixed point is solved ONCE per energy and
    shared by Sigma_tot and both Gammas in the warm engines
    (greens._build_trans_engine_warm / _build_sum_engine_warm).

    DELIBERATELY NO cross-energy seeding: the chain surface GF satisfies a
    quadratic matrix equation whose unrelaxed defect iteration
    g <- inv(A - B g B+) has SPURIOUS attracting fixed points near surface
    band features.  The round-3 on-device investigation caught one
    exactly: at E=1.4231 (perfect chain, eta=1e-4) the previous-energy
    seed converged with diff=0.0 and contraction 0.09 to a solution 2.8
    away from the true retarded g, with all Im g_ii < 0 -- every cheap
    local acceptance test (step size, contraction estimate, diagonal DOS
    sign) passes on it, and T(E) came out wrong by 0.47.  Sancho-Rubio
    decimation constructs the retarded branch and is itself quadratically
    convergent, so seeding buys little and risks silent O(1) errors; the
    warm engines' value for chain contacts is the shared solve, which
    this keeps.
    """
    inds, N, eta, _method, conv = static_key

    def fn(params, E, state):
        sigs = []
        for i in range(len(inds)):
            c = params["contacts"][i]
            A = (E + 1j * eta) * c["Salpha"] - c["alpha"]
            B = (E + 1j * eta) * c["Sbeta"] - c["beta"]
            g = surface_g_sancho(A, B, conv)
            t = E * c["stau"] - c["tau"]
            blk = t @ g @ jnp.conj(t).T
            ix = np.ix_(np.asarray(inds[i]), np.asarray(inds[i]))
            sig = jnp.zeros((N, N), dtype=blk.dtype).at[ix].add(blk)
            sigs.append(sig)
        return tuple(sigs), state

    return fn


# ---------------------------------------------------------------------------
# Double-word surface GF (the 'high'/'exact' tiers' energy-dependent Sigma)
# ---------------------------------------------------------------------------

def surface_g_sancho_dw(A_dw, B_dw, conv=SURFACE_GREEN_CONVERGENCE,
                        max_iter=64, inv_steps=2, exact_steps=1):
    """Sancho-Rubio decimation carried in double-word (hi, lo) arithmetic.

    Removes the single-word-Sigma floor (~6e-8 from evaluating the fixed
    point in f32) for energy-dependent chain contacts: every product is a
    zmatmul_dw with an error-free Ozaki leading term, every inverse a
    zinv_dw with an error-free final Newton step, so the converged surface
    GF holds ~1e-12 relative accuracy on an f32-only MXU.  The exact
    leading products are required, not a luxury: the recursion's
    transients GROW (|al| can rise ~4x before the geometric decay sets
    in) and eps_s accumulates every product error permanently -- with
    zmatmul_dwf's ~8e-8 leading term the surface GF floors at ~2e-6,
    with Ozaki it reaches ~2e-12 (bisected on the Au spd blocks).
    Contact blocks are small (nc x nc), so the extra matmul count is
    irrelevant next to the device-solve cost.
    """
    def ginv(M):
        return zl.zinv_dw(M[0], M[1], steps=inv_steps,
                          exact_steps=exact_steps)

    def mm(X, Y):
        return zl.zmatmul_dw(X, Y, exact=True)

    def cond(state):
        count, diff, *_ = state
        return (diff > conv) & (count < max_iter)

    rdt = jnp.real(A_dw[0]).dtype
    tiny = jnp.asarray(np.finfo(np.float32).tiny, rdt)

    def body(state):
        count, diff, eps_s, eps, al, be, c = state
        g = ginv(eps)
        # balanced couplings with a joint power-of-two exponent (exact
        # on dw pairs) -- same overflow pathology as the single-word
        # kernel: al/be diverge in opposite exponential directions near
        # convergence while only their PRODUCTS stay O(1)
        scale = jnp.exp2(c).astype(rdt)
        agb = mm(al, mm(g, be))
        agb = (agb[0] * scale, agb[1] * scale)
        bga = mm(be, mm(g, al))
        bga = (bga[0] * scale, bga[1] * scale)
        eps_s_new = zl.cdw_sub(eps_s, agb)
        eps = zl.cdw_sub(zl.cdw_sub(eps, agb), bga)
        al = mm(al, mm(g, al))
        be = mm(be, mm(g, be))
        # power-of-two norms: exact on both components of the dw pair
        sa = jnp.exp2(jnp.ceil(jnp.log2(
            jnp.maximum(jnp.max(jnp.abs(al[0])), tiny))))
        sb = jnp.exp2(jnp.ceil(jnp.log2(
            jnp.maximum(jnp.max(jnp.abs(be[0])), tiny))))
        c = 2.0 * c + jnp.log2(sa) + jnp.log2(sb)
        al = (al[0] / sa, al[1] / sa)
        be = (be[0] / sb, be[1] / sb)
        diff = jnp.max(jnp.abs(eps_s_new[0] - eps_s[0])) / jnp.maximum(
            jnp.max(jnp.abs(eps_s_new[0])), 1e-30)
        return (count + 1, diff, eps_s_new, eps, al, be, c)

    init = (zl._tie_vma(jnp.zeros((), jnp.int32), A_dw[0]),
            zl._tie_vma(jnp.full((), jnp.inf, jnp.real(A_dw[0]).dtype),
                        A_dw[0]),
            A_dw, A_dw, B_dw, zl.cdw_conj_t(B_dw),
            zl._tie_vma(jnp.zeros((), rdt), A_dw[0]))
    _, _, eps_s, *_ = lax.while_loop(cond, body, init)
    return ginv(eps_s)


def _sigma_block_dw(contact, E_dw, eta, conv):
    """Double-word chain sigma block: t g_surf t^+ with t = E stau - tau."""
    def mat(key):
        return (contact[key + "_hi"], contact[key + "_lo"])

    zE = (E_dw[0] + 1j * jnp.asarray(eta, jnp.real(E_dw[0]).dtype), E_dw[1])
    A = zl.cdw_sub(zl.cdw_smul(zE, mat("Salpha")), mat("alpha"))
    B = zl.cdw_sub(zl.cdw_smul(zE, mat("Sbeta")), mat("beta"))
    g = surface_g_sancho_dw(A, B, conv)
    t = zl.cdw_sub(zl.cdw_smul(E_dw, mat("stau")), mat("tau"))
    return zl.zmatmul_dw(t, zl.zmatmul_dw(g, zl.cdw_conj_t(t)))


@lru_cache(maxsize=None)
def _chain_contact_fn_dw(static_key, i: int):
    inds, N, eta, _method, conv = static_key

    def fn(params, E_dw):
        blk_hi, blk_lo = _sigma_block_dw(params["contacts_dw"][i], E_dw,
                                         eta, conv)
        ix = np.ix_(np.asarray(inds[i]), np.asarray(inds[i]))
        sig_hi = jnp.zeros((N, N), dtype=blk_hi.dtype).at[ix].add(blk_hi)
        sig_lo = jnp.zeros((N, N), dtype=blk_lo.dtype).at[ix].add(blk_lo)
        return sig_hi, sig_lo

    return fn


@lru_cache(maxsize=None)
def _chain_total_fn_dw(static_key):
    inds = static_key[0]

    def fn(params, E_dw):
        sig = _chain_contact_fn_dw(static_key, 0)(params, E_dw)
        for i in range(1, len(inds)):
            sig = zl.cdw_add2(sig,
                              _chain_contact_fn_dw(static_key, i)(params,
                                                                  E_dw))
        return sig

    return fn


class Chain1DSelfEnergy(_CompatMixin):
    """1D-chain contact self-energy provider.

    Construction patterns (mirroring surfG1D.py:83-165):

    a) ``Chain1DSelfEnergy(F, S, [inds1, inds2])`` -- onsite and coupling
       blocks extracted from F/S; the adjacent-cell indices default to
       ``[inds2, inds1]`` (periodic 2-cell assumption).
    b) ``Chain1DSelfEnergy(F, S, inds_list, taus=[ind1c, ind2c])`` -- contact
       connection indices given; tau blocks read from F/S.
    c) full specification with ``taus/staus`` as matrices and
       ``alphas/a_overlaps/betas/b_overlaps``.
    """

    # warm engines are OFF by default for chain contacts: the Sancho
    # fixed point is a negligible fraction of the per-energy solve, and
    # the round-3 TPU A/B measured warm T(E) at 0.84x cold (the sound
    # in-band acceptance rejects most real-axis seeds).  Engines honor
    # this unless ExecutionConfig(warm_start="force").
    warm_profitable = False

    def __init__(self, Fock, Overlap, inds_list, taus=None, staus=None,
                 alphas=None, a_overlaps=None, betas=None, b_overlaps=None,
                 eta: float = ETA, method: str = "sancho",
                 conv: float = SURFACE_GREEN_CONVERGENCE):
        self.F = np.asarray(Fock, dtype=complex)
        self.S = np.asarray(Overlap)
        self.inds_list = [np.asarray(i, dtype=int) for i in inds_list]
        self.eta = float(eta)
        self.method = method
        self.conv = float(conv)
        self.fermi_list = [None] * len(self.inds_list)
        if method == "dyson":
            # no double-word evaluation and no warm-start for the
            # reference-faithful Dyson fixed point: shadow the class
            # methods so the engines fall back to the wrapped single-word
            # sigma / cold path (the warm kernel's refinement + fallback
            # are Sancho-based and would silently switch algorithms)
            self.total_apply_dw = None
            self.contact_apply_dw = None
            self.contacts_warm_apply = None

        if taus is None:
            taus = [self.inds_list[-1], self.inds_list[0]]
        taus = [np.asarray(t) for t in taus]
        if taus[0].ndim == 1:
            self.tau_from_fock = True
            self.tau_inds = [t.astype(int) for t in taus]
            self._extract_taus()
        else:
            self.tau_from_fock = False
            self.tau_list = [np.asarray(t, dtype=complex) for t in taus]
            self.stau_list = [np.asarray(st) for st in staus]

        if alphas is None:
            self.contact_from_fock = True
            self._extract_contacts()
        else:
            self.contact_from_fock = False
            self.a_list = [np.asarray(a, dtype=complex) for a in alphas]
            self.aS_list = [np.asarray(a) for a in a_overlaps]
            self.b_list = [np.asarray(b, dtype=complex) for b in betas]
            self.bS_list = [np.asarray(b) for b in b_overlaps]

    # -- construction helpers ------------------------------------------
    def _extract_taus(self):
        t0, t1 = self.tau_inds
        i0, i1 = self.inds_list[0], self.inds_list[-1]
        self.tau_list = [self.F[np.ix_(t0, i0)], self.F[np.ix_(t1, i1)]]
        self.stau_list = [self.S[np.ix_(t0, i0)], self.S[np.ix_(t1, i1)]]

    def _extract_contacts(self):
        self.a_list = [self.F[np.ix_(i, i)] for i in self.inds_list]
        self.aS_list = [self.S[np.ix_(i, i)] for i in self.inds_list]
        self.b_list = [np.asarray(t) for t in self.tau_list]
        self.bS_list = [np.asarray(t) for t in self.stau_list]

    # -- pure API -------------------------------------------------------
    def params(self):
        # host-side NumPy pytree; complex leaves are split into re/im float
        # pairs at the device boundary by the engines
        return {
            "contacts": tuple(
                {
                    "alpha": np.asarray(self.a_list[i], dtype=complex),
                    "Salpha": np.asarray(self.aS_list[i]),
                    "beta": np.asarray(self.b_list[i], dtype=complex),
                    "Sbeta": np.asarray(self.bS_list[i]),
                    "tau": np.asarray(self.tau_list[i] if i < len(self.tau_list)
                                      else self.tau_list[-1], dtype=complex),
                    "stau": np.asarray(self.stau_list[i] if i < len(self.stau_list)
                                       else self.stau_list[-1]),
                }
                for i in range(len(self.inds_list))
            ),
        }

    def _static(self):
        return {
            "inds": tuple(tuple(int(j) for j in i) for i in self.inds_list),
            "N": self.F.shape[0],
            "eta": self.eta,
            "method": self.method,
            "conv": self.conv,
        }

    def num_contacts(self) -> int:
        return len(self.inds_list)

    def surface_g(self, E, i, conv=None):
        """Surface Green's function of contact i at (possibly complex) E."""
        from gaunegf_tpu.ops.complexio import call_complex_safe
        conv = self.conv if conv is None else conv
        fn = _chain_surface_fn(self.eta, self.method, float(conv))
        return call_complex_safe(fn, self.params()["contacts"][i % len(
            self.inds_list)], complex(E))

    # staticmethod-style pure functions used by the engines ------------
    @staticmethod
    def _sigma_block(contact, E, eta, conv, method):
        A = (E + 1j * eta) * contact["Salpha"] - contact["alpha"]
        B = (E + 1j * eta) * contact["Sbeta"] - contact["beta"]
        if method == "dyson":
            g = surface_g_dyson(A, B, conv)
        else:
            g = surface_g_sancho(A, B, conv)
        t = E * contact["stau"] - contact["tau"]
        return t @ g @ jnp.conj(t).T

    def _static_key(self):
        s = self._static()
        return (s["inds"], s["N"], s["eta"], s["method"], s["conv"])

    def total_apply(self):
        """(pure_fn(params, E), params) with a cache-stable fn identity."""
        return _chain_total_fn(self._static_key()), self.params()

    def contact_apply(self, i: int):
        i = i % len(self.inds_list)
        return _chain_contact_fn(self._static_key(), i), self.params()

    # --- double-word API ('high'/'exact' tiers) -----------------------
    # Only the Sancho-Rubio method has a double-word evaluation; the
    # reference-faithful 'dyson' mode disables it in __init__ so the
    # engine falls back to the wrapped single-word sigma (the tier then
    # floors at the provider's f32 evaluation, honestly, instead of
    # silently switching fixed-point algorithms).
    def params_dw(self):
        """Exact two-float split of every contact block (the chain's
        parameters are known in f64 on the host, so the split is exact --
        the surface fixed point then runs fully double-word and the
        'exact' tier keeps its ~1e-11 floor with this energy-DEPENDENT
        provider, VERDICT r1 item 7)."""
        def split(x):
            x = np.asarray(x, dtype=np.complex128)
            hi = x.astype(np.complex64)
            lo = (x - hi.astype(np.complex128)).astype(np.complex64)
            return hi, lo

        contacts = []
        for p in self.params()["contacts"]:
            q = {}
            for k, v in p.items():
                q[k + "_hi"], q[k + "_lo"] = split(v)
            contacts.append(q)
        return {"contacts_dw": tuple(contacts)}

    def total_apply_dw(self):
        return _chain_total_fn_dw(self._static_key()), self.params_dw()

    def contact_apply_dw(self, i: int):
        i = i % len(self.inds_list)
        return _chain_contact_fn_dw(self._static_key(), i), self.params_dw()

    def contact_inds(self, i=None):
        """Static contact support for the low-rank fast path."""
        if i is None:
            return tuple(sorted({int(j) for inds in self.inds_list
                                 for j in inds}))
        return tuple(int(j) for j in self.inds_list[i % len(self.inds_list)])

    # --- warm-start API (previous-energy seeding along sorted lanes) ---
    def _warm_init(self):
        """Cold per-contact seeds: -1j*I (first lane points fall through
        the warm kernel's Sancho fallback, all later points seed from the
        neighbouring energy)."""
        return tuple(
            np.asarray(-1j * np.eye(len(self.a_list[i]), dtype=np.complex64))
            for i in range(len(self.inds_list)))

    def contacts_warm_apply(self):
        """(fn(params, E, state) -> (sigs_tuple, state'), params, init).

        Shared-solve interface for the warm engines: each energy's surface
        fixed points are solved once and reused by Sigma_tot and the
        Gammas.  Cross-energy seeding is deliberately absent -- see
        _chain_contacts_warm_fn for the spurious-fixed-point hazard the
        round-3 device investigation uncovered (the reference's
        sigmaKprev trick, surfG3D.py:877-879, carries the same risk)."""
        return (_chain_contacts_warm_fn(self._static_key()), self.params(),
                self._warm_init())


    def set_fock(self, F, mu1=None, mu2=None):
        """Update F; replicate surfG1D.setF semantics (surfG1D.py:297-342).

        * auto-extracted couplings: the contact onsite blocks are overwritten
          by the adjacent-cell blocks (periodicity enforcement), then tau and
          stau re-extracted;
        * fully-specified contacts: onsite alpha shifted by (mu - fermi) * I
          and beta by (mu - fermi) * S_beta to realign the lead Fermi level.
        """
        self.F = np.asarray(F, dtype=complex)
        if self.tau_from_fock:
            t0, t1 = self.tau_inds
            i0, i1 = self.inds_list[0], self.inds_list[-1]
            self.F[np.ix_(i0, i0)] = self.F[np.ix_(t0, t0)]
            self.F[np.ix_(i1, i1)] = self.F[np.ix_(t1, t1)]
            self._extract_taus()
        if self.contact_from_fock:
            self._extract_contacts()
        else:
            if self.fermi_list[0] is None:
                self.fermi_list[0] = mu1
                self.fermi_list[-1] = mu2
            else:
                for i, mu in zip([0, -1], [mu1, mu2]):
                    fermi = self.fermi_list[i]
                    if fermi is not None and mu is not None and fermi != mu:
                        dmu = mu - fermi
                        self.a_list[i] = self.a_list[i] + dmu * np.eye(
                            len(self.a_list[i]))
                        self.b_list[i] = self.b_list[i] + dmu * self.bS_list[i]
                        self.fermi_list[i] = mu

    def set_contacts(self, alphas=None, a_overlaps=None, betas=None,
                     b_overlaps=None):
        """Re-set contact parameters (surfG1D.py:167-222 semantics).

        Contacts extracted from F/S (patterns a/b) are re-extracted and
        any provided arguments are ignored; fully-specified contacts
        (pattern c) require all four arguments together.
        """
        if self.contact_from_fock:
            self._extract_contacts()
            return
        if any(x is None for x in (alphas, a_overlaps, betas, b_overlaps)):
            raise ValueError(
                "fully-specified contacts require alphas, aOverlaps, betas "
                "and bOverlaps together (partial updates unsupported)")
        self.a_list = [np.asarray(a, dtype=complex) for a in alphas]
        self.aS_list = [np.asarray(a) for a in a_overlaps]
        self.b_list = [np.asarray(b, dtype=complex) for b in betas]
        self.bS_list = [np.asarray(b) for b in b_overlaps]

    # aliases used by Fermi-search helpers on sub-providers
    @property
    def aList(self):
        return self.a_list

    @property
    def aSList(self):
        return self.aS_list

    @property
    def bList(self):
        return self.b_list

    @property
    def bSList(self):
        return self.bS_list
