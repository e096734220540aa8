"""Spin-layout transforms for 'r' / 'u' / 'ro' / 'g' calculations.

The reference scatters kron-expansion rules across scf.py:473-503 and
transport.py:92-141; here they are explicit array transforms:

* 'r'  -- restricted: one N x N block, spin degeneracy by a factor 2.
* 'u'/'ro' -- collinear: block-diagonal [[up, 0], [0, down]] (2N x 2N).
* 'g'  -- non-collinear spinor: per-orbital 2x2 blocks, interleaved
  [a0, b0, a1, b1, ...]; related to the block layout by a fixed permutation.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = [
    "expand_matrix", "expand_vector", "spinor_block_perm",
    "wrap_expand_fn", "wrap_permute_fn",
]


def expand_matrix(sig, spin: str):
    """Expand an N x N matrix to 2N x 2N for the given spin layout."""
    sig = np.asarray(sig)
    if spin in ("u", "ro"):
        return np.kron(np.eye(2), sig)
    if spin == "g":
        return np.kron(sig, np.eye(2))
    return sig


def expand_vector(v, spin: str):
    """Expand a per-orbital vector for the given spin layout
    (scf.py:478-484 rules)."""
    v = np.asarray(v)
    if spin in ("u", "ro"):
        return np.kron([1, 1], v)
    if spin == "g":
        return np.kron(v, [1, 1])
    return v


def spinor_block_perm(n_orb: int) -> np.ndarray:
    """Permutation mapping spinor-interleaved indices to block layout:
    [a0, b0, a1, b1, ...] -> [a0, a1, ..., b0, b1, ...]."""
    return np.concatenate([np.arange(0, 2 * n_orb, 2),
                           np.arange(1, 2 * n_orb, 2)])


@lru_cache(maxsize=None)
def wrap_expand_fn(fn, spin: str):
    """Wrap a sigma-apply fn so its output is spin-expanded (stable id)."""
    if spin in ("u", "ro"):
        def wrapped(params, E):
            return jnp.kron(jnp.eye(2), fn(params, E))
        return wrapped
    if spin == "g":
        def wrapped(params, E):
            return jnp.kron(fn(params, E), jnp.eye(2))
        return wrapped
    return fn


@lru_cache(maxsize=None)
def wrap_permute_fn(fn, n_orb: int):
    """Wrap a sigma-apply fn with the spinor -> block permutation."""
    perm = spinor_block_perm(n_orb)
    ix = np.ix_(perm, perm)

    def wrapped(params, E):
        return fn(params, E)[ix]

    return wrapped
