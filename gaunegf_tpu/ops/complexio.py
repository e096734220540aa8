"""Complex-safe host<->device boundary.

The axon TPU backend cannot transfer complex arrays between host and device
(UNIMPLEMENTED on both H2D and D2H), while complex arithmetic *inside* a
compiled program is fully supported.  Every engine therefore ships complex
data as split (real, imag) float pairs and recombines them inside jit.

``SplitComplex`` is a NamedTuple, hence automatically a pytree node; XLA
sees only real arrays at the boundary and the first fused multiply inside
the program rebuilds the complex values for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SplitComplex", "split_tree", "merge_tree", "real_dtype_for"]


class SplitComplex(NamedTuple):
    re: object
    im: object


def real_dtype_for(cdtype):
    return np.float64 if np.dtype(cdtype) == np.complex128 else np.float32


def split_array(x, cdtype=None):
    """Host-side: complex ndarray -> SplitComplex of real ndarrays."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        rdt = real_dtype_for(cdtype or x.dtype)
        return SplitComplex(np.ascontiguousarray(x.real, dtype=rdt),
                            np.ascontiguousarray(x.imag, dtype=rdt))
    return x


def split_tree(tree, cdtype=None):
    """Split every complex leaf in a pytree (host side, NumPy)."""
    return jax.tree_util.tree_map(
        lambda l: split_array(l, cdtype), tree,
        is_leaf=lambda l: isinstance(l, (np.ndarray, jnp.ndarray, float,
                                         int, complex)))


def merge_array(x):
    if isinstance(x, SplitComplex):
        return x.re + 1j * x.im
    return x


def merge_tree(tree):
    """Recombine SplitComplex leaves (device side, traced)."""
    return jax.tree_util.tree_map(
        merge_array, tree, is_leaf=lambda l: isinstance(l, SplitComplex))


def split_traced(tree):
    """Device-side: split complex traced leaves before returning from jit."""

    def f(l):
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.complexfloating):
            return SplitComplex(jnp.real(l), jnp.imag(l))
        return l

    return jax.tree_util.tree_map(f, tree)


def merge_host(tree):
    """Host-side merge of SplitComplex results back into complex ndarrays."""

    def f(l):
        if isinstance(l, SplitComplex):
            return np.asarray(l.re) + 1j * np.asarray(l.im)
        return np.asarray(l)

    return jax.tree_util.tree_map(
        f, tree, is_leaf=lambda l: isinstance(l, SplitComplex))


from functools import lru_cache


@lru_cache(maxsize=None)
def _safe_jit(fn, n_args: int):
    @jax.jit
    def wrapped(*args_split):
        out = fn(*merge_tree(args_split))
        return split_traced(out)

    return wrapped


def call_complex_safe(fn, *args, cdtype=None):
    """Call fn(*args) under jit with complex-safe transfers both ways.

    fn must be cache-stable (module-level / lru_cached closure); args are
    host values (NumPy / pytrees thereof).
    """
    jitted = _safe_jit(fn, len(args))
    args_split = tuple(split_tree(a, cdtype) for a in args)
    return merge_host(jitted(*args_split))
