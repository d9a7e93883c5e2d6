"""Discretization of continuous-time affine systems  xdot = A x + B u + d.

Methods: forward Euler ('fe'), backward Euler ('be'), bilinear/Tustin ('bil'),
and exact zero-order hold ('zoh') via a single matrix exponential of the
stacked block [[A, B_ext], [0, 0]].

Semantics match the reference (sofacontrol/tpwl/tpwl.py:272-297 and
sofacontrol/utils.py:302-335) but everything is jnp, jit-able and vmappable
over stacked (P, n, n) dictionaries of linearization points.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm

DISCR_METHODS = ("fe", "be", "bil", "zoh")


def zoh_linear(A, B, dt):
    """Exact ZOH of (A, B): expm of the stacked block, discard the lower rows."""
    n, m = A.shape[0], B.shape[1]
    dtype = jnp.result_type(A, B)
    em = jnp.zeros((n + m, n + m), dtype=dtype)
    em = em.at[:n, :n].set(A)
    em = em.at[:n, n:].set(B)
    Phi = expm(em * dt)
    return Phi[:n, :n], Phi[:n, n:]


def zoh_affine(A, B, d, dt):
    """Exact ZOH for the affine system: treat d as an extra constant input."""
    B_ext = jnp.concatenate((B, d[:, None]), axis=1)
    Ad, Bd_ext = zoh_linear(A, B_ext, dt)
    return Ad, Bd_ext[:, :-1], Bd_ext[:, -1]


def fe(A, B, d, dt):
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    return I + dt * A, dt * B, dt * d


def be(A, B, d, dt):
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    Ad = jnp.linalg.inv(I - dt * A)
    sep = jnp.linalg.solve(A, Ad - I)
    return Ad, sep @ B, sep @ d


def bil(A, B, d, dt):
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    Ad = (I + 0.5 * dt * A) @ jnp.linalg.inv(I - 0.5 * dt * A)
    sep = jnp.linalg.solve(A, Ad - I)
    return Ad, sep @ B, sep @ d


_METHOD_FNS = {"fe": fe, "be": be, "bil": bil, "zoh": zoh_affine}


def discretize_affine(A, B, d, dt, method: str = "zoh"):
    """Discretize one affine system. `method` is static (resolved at trace time)."""
    if method not in _METHOD_FNS:
        raise ValueError(f"method must be one of {DISCR_METHODS}, got {method!r}")
    return _METHOD_FNS[method](A, B, d, dt)


@partial(jax.jit, static_argnames=("method",))
def discretize_affine_batch(A, B, d, dt, method: str = "zoh"):
    """Discretize a stacked dictionary of points: A (P,n,n), B (P,n,m), d (P,n).

    This is the pre-discretization step of the TPWL model
    (sofacontrol/tpwl/tpwl.py:299-322) done as one vmapped call instead of a
    Python loop over points.
    """
    fn = lambda a, b, dd: discretize_affine(a, b, dd, dt, method=method)
    return jax.vmap(fn)(A, B, d)
