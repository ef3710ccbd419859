"""Planar (re/im) boundary adapters for complex pytrees.

The production TPU runtime in this environment rejects complex dtypes at the
host↔device and jit entry/exit boundary (uploads poison the session, complex
jit outputs hang), while complex math *inside* a single XLA program is fully
supported — XLA lowers it to planar pairs anyway. TPU-native rule: ship
re/im planes across every boundary, reconstitute complex inside the program.

``planar_jit(f)`` wraps any state-threading function (e.g.
``lambda chain, x: chain.step(x)``) so that every complex leaf of its inputs
and outputs is replaced by a :class:`Planar` pair of real arrays at the jit
boundary; inside the traced program the original complex-typed code runs
unchanged. Streaming state pytrees round-trip planar between steps without
ever materializing complex at the boundary.

There is no reference counterpart (the reference is single-threaded host Rust
with native Complex32, /root/reference/src/lib.rs); this is part of the
TPU-first runtime layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Planar", "planarize", "unplanarize", "planar", "planar_jit"]


@jax.tree_util.register_pytree_node_class
class Planar:
    """A complex leaf split into (re, im) real leaves."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Planar(re={self.re!r}, im={self.im!r})"


def _is_complex_leaf(x) -> bool:
    if isinstance(x, complex):
        return True
    dt = getattr(x, "dtype", None)
    return dt is not None and jnp.issubdtype(dt, jnp.complexfloating)


def planarize(tree):
    """Replace every complex leaf with a :class:`Planar` (re, im) pair.

    On host numpy arrays this is a pure-numpy split (no device op); on traced
    / device values it emits ``real``/``imag`` ops (use inside jit).
    """

    def split(x):
        if not _is_complex_leaf(x):
            return x
        if isinstance(x, (np.ndarray, np.generic, complex)):
            x = np.asarray(x)
            return Planar(np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag))
        return Planar(jnp.real(x), jnp.imag(x))

    return jax.tree_util.tree_map(split, tree)


def unplanarize(tree):
    """Inverse of :func:`planarize`: join Planar pairs back to complex leaves."""

    def join(n):
        if isinstance(n, Planar):
            if isinstance(n.re, (np.ndarray, np.generic)):
                return np.asarray(n.re) + 1j * np.asarray(n.im)
            return jax.lax.complex(jnp.asarray(n.re), jnp.asarray(n.im))
        return n

    return jax.tree_util.tree_map(join, tree, is_leaf=lambda n: isinstance(n, Planar))


def planar(f):
    """Wrap ``f`` so its boundary values are planar while its body sees complex."""

    @functools.wraps(f)
    def wrapped(*args, **kwargs):
        args, kwargs = unplanarize((args, kwargs))
        return planarize(f(*args, **kwargs))

    return wrapped


def planar_jit(f, **jit_kwargs):
    """``jax.jit`` with planar complex boundaries (TPU-safe)."""
    return jax.jit(planar(f), **jit_kwargs)
