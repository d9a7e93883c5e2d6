"""Discrete Luenberger observer for a linear ROM.

Capability parity with sofacontrol/baselines/rompc/observer.py: constant gain
L from the dual DARE (A', C', Q, R), update
x̂+ = A x̂ + B u + d + L (y - C x̂).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from soft_robot_control_tpu.lqr.riccati import dare


def luenberger_gain(A_d, C, Q, R):
    """L = -K' of the dual DARE (rompc/observer.py:27-28)."""
    L, _ = dare(A_d.T, C.T, Q, R)
    return -L.T


def luenberger_update(model, x, u, y, L):
    """One observer step; y is the full-order measurement. The innovation is
    evaluated at the previous estimate, matching rompc/observer.py:36-38."""
    y_red = y - model.y_ref
    x_pred = model.A_d @ x + model.B_d @ u + model.d_d
    return x_pred + L @ (y_red - model.C @ x)


class DiscreteLuenbergerObserver:
    """Stateful wrapper mirroring rompc/observer.py:3-46 semantics:
    x̂+ = f(x̂, u) + L (y - C x̂)  (gain applied at the *previous* estimate).
    """

    def __init__(self, dyn_sys, Q, R):
        if dyn_sys.C is None:
            raise RuntimeError("Need to set meas. model in dyn_sys")
        self.dyn_sys = dyn_sys
        self.C = dyn_sys.C
        self.L = luenberger_gain(jnp.asarray(dyn_sys.A_d), jnp.asarray(self.C),
                                 jnp.asarray(Q), jnp.asarray(R))
        self.x = None
        self.z = None

    def initialize(self, xf):
        self.x = self.dyn_sys.rom.project_x(jnp.asarray(xf))
        self._update_z()

    def update(self, u, y, dt=None, **kwargs):
        y_red = self.dyn_sys.zfyf_to_zy(yf=y)
        self.x = (self.dyn_sys.update_state(self.x, u)
                  + self.L @ (y_red - self.C @ self.x))
        self._update_z()

    def _update_z(self):
        if self.dyn_sys.H is not None:
            self.z = self.dyn_sys.x_to_zfyf(self.x, zf=True)
        else:
            self.z = self.dyn_sys.x_to_zfyf(self.x, yf=True)
