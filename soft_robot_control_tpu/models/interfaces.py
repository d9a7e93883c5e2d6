"""GuSTO model adapters — the uniform dynamics contract.

Capability parity with sofacontrol/scp/models/template.py: every adapter
exposes

    get_continuous_dynamics(x, u) -> (f, A, B)
    get_discrete_dynamics(x, u, dt) -> (Ad, Bd, dd)
    get_observer_jacobians(x) -> (H, c)          [nonlinear observers only]
    get_characteristic_vals() -> (x_char, f_char)
    rollout(x0, u, dt)

as pure, vmappable functions of pytree models, so GuSTO can linearize a
whole trajectory in one `vmap` (replacing the reference's per-point Python
loops, scp/gusto.py:225-281).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import qv2x


class TPWLGuSTO:
    """Adapter for TPWLModel (scp/models/tpwl.py:7-96 semantics)."""

    nonlinear_observer = False

    def __init__(self, dyn_sys):
        self.dyn_sys = dyn_sys
        if dyn_sys.H is None:
            raise RuntimeError("dyn_sys must have output model specified")
        self.H = dyn_sys.H
        self.n_x = dyn_sys.state_dim
        self.n_u = dyn_sys.input_dim
        self.n_z = self.H.shape[0]

    def get_continuous_dynamics(self, x, u):
        A, B, d = self.dyn_sys.get_jacobians(x)
        return A @ x + B @ u + d, A, B

    def get_discrete_dynamics(self, x, u, dt):
        return self.dyn_sys.get_jacobians(x, dt=dt)

    def pre_discretize(self, dt):
        self.dyn_sys = self.dyn_sys.pre_discretize(dt)

    def get_characteristic_vals(self):
        """max |.| over the dictionary points (scp/models/tpwl.py:66-84)."""
        x = qv2x(self.dyn_sys.q, self.dyn_sys.v)
        x_char = jnp.abs(x).max(axis=0)
        f = jax.vmap(lambda xi, ui: self.get_continuous_dynamics(xi, ui)[0])(
            x, self.dyn_sys.u)
        f_char = jnp.abs(f).max(axis=0)
        return np.asarray(x_char), np.asarray(f_char)

    def rollout(self, x0, u, dt):
        return self.dyn_sys.rollout(x0, u, dt)


class SSMGuSTO:
    """Adapter for SSMModel (scp/models/ssm.py:7-97 semantics)."""

    def __init__(self, dyn_sys):
        self.dyn_sys = dyn_sys
        self.H = dyn_sys.H  # zeros placeholder (nonlinear output map)
        self.n_x = dyn_sys.state_dim
        self.n_u = dyn_sys.input_dim
        self.n_z = self.H.shape[0]
        self.nonlinear_observer = dyn_sys.nonlinear_observer

    def get_continuous_dynamics(self, x, u):
        A, B, d = self.dyn_sys.get_continuous_jacobians(x, u)
        return A @ x + B @ u + d, A, B

    def get_discrete_dynamics(self, x, u, dt):
        return self.dyn_sys.get_jacobians(x, u, dt)

    def get_observer_jacobians(self, x):
        return self.dyn_sys.get_observer_jacobians(x)

    def get_characteristic_vals(self):
        return np.ones(self.n_x), np.ones(self.n_x)

    def rollout(self, x0, u, dt):
        return self.dyn_sys.rollout(x0, u, dt)
