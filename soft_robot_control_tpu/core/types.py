"""Core typed containers (registered pytrees).

These replace the reference's ad-hoc attribute-bag classes
(sofacontrol/utils.py:8-39, sofacontrol/tpwl/tpwl_utils.py:5-38) with
immutable pytrees that flow through jit/vmap/scan.
"""

from __future__ import annotations

import jax
import numpy as np


class QuadraticCost:
    """Quadratic OCP cost weights (Q, R, Qf).

    Mirrors the role of sofacontrol/utils.py:8 but is an immutable pytree so
    it can be closed over or passed through jitted functions.
    """

    def __init__(self, Q=None, R=None, Qf=None):
        self.Q = Q
        self.R = R
        self.Qf = Qf

    def tree_flatten(self):
        return (self.Q, self.R, self.Qf), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        def shp(m):
            return None if m is None else np.shape(m)

        return f"QuadraticCost(Q={shp(self.Q)}, R={shp(self.R)}, Qf={shp(self.Qf)})"


jax.tree_util.register_pytree_node(
    QuadraticCost,
    lambda c: c.tree_flatten(),
    QuadraticCost.tree_unflatten,
)


class Target:
    """Tracking target container.

    Same role as the reference Target (sofacontrol/tpwl/tpwl_utils.py:5-26):
    iLQR needs (z, Hf) [and t for moving targets]; tracking LQR needs
    (t, x, u); setpoint LQR additionally carries (A, B) of the linearization.
    """

    def __init__(self, t=None, u=None, z=None, x=None, Hf=None, A=None, B=None):
        self.t = t
        self.u = u
        self.z = z
        self.x = x
        self.Hf = Hf
        self.A = A
        self.B = B

    def tree_flatten(self):
        return (self.t, self.u, self.z, self.x, self.Hf, self.A, self.B), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    Target,
    lambda c: c.tree_flatten(),
    Target.tree_unflatten,
)


def load_target_file(path: str) -> Target:
    """Load a Target from a saved simulation pkl (keys t,u,z,Hf)."""
    from soft_robot_control_tpu.utils.io import load_data

    data = load_data(path)
    return Target(t=data.get("t"), u=data.get("u"), z=data.get("z"), Hf=data.get("Hf"))
