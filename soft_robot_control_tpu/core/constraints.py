"""Polyhedral constraint sets {x : A x <= b} as pytrees.

Same capabilities as the reference Polyhedron/HyperRectangle
(sofacontrol/utils.py:364-414): membership, violation distance, and QP
reprojection — but the projection runs on-device through the in-repo ADMM QP
solver instead of an external OSQP process, and everything is vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Polyhedron:
    """{x : A x <= b}. A: (n_c, n), b: (n_c,)."""

    def __init__(self, A, b):
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b)

    def tree_flatten(self):
        return (self.A, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.A, obj.b = children
        return obj

    @property
    def dim(self):
        return self.A.shape[1]

    def contains(self, x):
        """True if x in the polyhedron (elementwise over leading batch dims)."""
        resid = jnp.einsum("ij,...j->...i", self.A, x) - self.b
        return jnp.max(resid, axis=-1) <= 0

    def violation(self, x):
        """2-norm distance of the constraint residual (0 if feasible).

        Matches get_constraint_violation (sofacontrol/utils.py:392-396).
        """
        resid = jnp.einsum("ij,...j->...i", self.A, x) - self.b
        return jnp.linalg.norm(jnp.maximum(resid, 0.0), axis=-1)

    def project(self, x, iters: int = 4000):
        """Euclidean projection onto the polyhedron via the on-device QP:

            min 0.5||y - x||^2   s.t.  A y <= b

        Replaces the reference's OSQP-based reprojection
        (sofacontrol/utils.py:398-406). Note the reference solves
        min 0.5 y'y - x'y which is the same problem.
        """
        from soft_robot_control_tpu.qp.admm import solve_qp_dense

        n = self.A.shape[1]
        P = jnp.eye(n, dtype=x.dtype)
        q = -x
        l = jnp.full((self.A.shape[0],), -jnp.inf, dtype=x.dtype)
        sol = solve_qp_dense(P, q, self.A, l, self.b, max_iter=iters)
        return sol.x


jax.tree_util.register_pytree_node(
    Polyhedron, lambda c: c.tree_flatten(), Polyhedron.tree_unflatten
)


class HyperRectangle(Polyhedron):
    """Axis-aligned box lb <= x <= ub, expressed as a Polyhedron.

    Row layout matches the reference (sofacontrol/utils.py:409-414):
    interleaved [x_i <= ub_i; -x_i <= -lb_i] per coordinate.
    """

    def __init__(self, ub, lb):
        ub = np.asarray(ub, dtype=float)
        lb = np.asarray(lb, dtype=float)
        n = len(ub)
        A = np.kron(np.eye(n), np.array([[1.0], [-1.0]]))
        b = np.stack([ub, -lb], axis=1).reshape(-1)
        super().__init__(A, b)


jax.tree_util.register_pytree_node(
    HyperRectangle, lambda c: c.tree_flatten(), HyperRectangle.tree_unflatten
)
