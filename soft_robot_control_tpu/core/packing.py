"""State packing conventions.

The full/reduced state convention throughout the framework is ``x = [v; q]``
(velocity first, then position), matching the reference convention
(sofacontrol/utils.py:129-146). All functions are dtype-generic and work on
numpy or jax arrays, single states ``(n,)`` or batches ``(..., n)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def qv2x(q, v):
    """Pack position q and velocity v into x = [v; q] (last axis)."""
    return jnp.concatenate((v, q), axis=-1)


def x2qv(x):
    """Unpack x = [v; q] -> (q, v). Works on (..., 2n) arrays."""
    n = x.shape[-1] // 2
    return x[..., n:], x[..., :n]


def vq2qv(x):
    """Reorder x = [v; q] -> [q; v]."""
    q, v = x2qv(x)
    return jnp.concatenate((q, v), axis=-1)
