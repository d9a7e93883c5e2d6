"""Discrete-time EKF on a reduced-order model with linear measurement y = Cx.

Capability parity with sofacontrol/tpwl/observer.py:33-126: predict with the
model's local discrete (A, B, d), covariance A Σ A' + W; update with the
constant C and gain K = Σ C' (C Σ C' + V)^-1.

TPU-first: the filter state (x̂, Σ) is a pytree and `ekf_update` is a pure
function, so 1024 independent filters run as one `vmap` and the whole
closed-loop (plant + EKF + MPC) stays inside one jitted scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EKFState(NamedTuple):
    x: jnp.ndarray      # (n_x,) state estimate
    Sigma: jnp.ndarray  # (n_x, n_x) covariance


def ekf_predict(model, state: EKFState, u, dt, W) -> EKFState:
    """Prediction step (observer.py:97-106)."""
    A_d, B_d, d_d = model.get_jacobians(state.x, dt=dt)
    x_pred = A_d @ state.x + B_d @ u + d_d
    Sigma_pred = A_d @ state.Sigma @ A_d.T + W
    return EKFState(x_pred, Sigma_pred)


def ekf_correct(model, state: EKFState, y, V) -> EKFState:
    """Measurement update (observer.py:108-125). `y` is the full-order
    measurement; it is shifted to reduced coordinates via y_ref."""
    C = model.C
    y_red = y - model.y_ref
    S = C @ state.Sigma @ C.T + V
    K = jnp.linalg.solve(S.T, C @ state.Sigma.T).T  # Sigma C' S^-1
    x_new = state.x + K @ (y_red - C @ state.x)
    I = jnp.eye(state.x.shape[0], dtype=state.x.dtype)
    Sigma_new = (I - K @ C) @ state.Sigma
    return EKFState(x_new, Sigma_new)


def ekf_update(model, state: EKFState, u, y, dt, W, V) -> EKFState:
    """Full EKF step: predict with input u, correct with measurement y."""
    return ekf_correct(model, ekf_predict(model, state, u, dt, W), y, V)


class DiscreteEKFObserver:
    """Stateful convenience wrapper with the reference's defaults
    (observer.py:52-66): Sigma0 = I, W = 100 I, V = I; initialized at the
    ROM reference state."""

    def __init__(self, dyn_sys, Sigma0=None, W=None, V=None):
        if dyn_sys.C is None:
            raise RuntimeError("Need to set meas. model in dyn_sys")
        self.dyn_sys = dyn_sys
        n = dyn_sys.state_dim
        m = dyn_sys.C.shape[0]
        self.meas_dim = m
        self.state_dim = n
        self.W = jnp.eye(n) * 100.0 if W is None else jnp.asarray(W)
        self.V = jnp.eye(m) if V is None else jnp.asarray(V)
        Sigma0 = jnp.eye(n) if Sigma0 is None else jnp.asarray(Sigma0)
        self.state = EKFState(dyn_sys.rom.project_x(dyn_sys.rom.x_ref), Sigma0)
        # dt stays a Python float (static) so the model's pre-discretization
        # cache check (a trace-time branch) works; jits are cached per dt.
        self._steps = {}

    def _step(self, state, u, y, dt):
        dt = float(dt)
        if dt not in self._steps:
            self._steps[dt] = jax.jit(
                lambda s, u_, y_: ekf_update(self.dyn_sys, s, u_, y_, dt,
                                             self.W, self.V))
        return self._steps[dt](state, u, y)

    @property
    def x(self):
        return self.state.x

    @property
    def Sigma(self):
        return self.state.Sigma

    @property
    def z(self):
        if self.dyn_sys.H is not None:
            return self.dyn_sys.x_to_zfyf(self.state.x, zf=True)
        return self.dyn_sys.x_to_zfyf(self.state.x, yf=True)

    def initialize(self, xf):
        self.state = EKFState(self.dyn_sys.rom.project_x(jnp.asarray(xf)),
                              self.state.Sigma)

    def update(self, u, y, dt, **kwargs):
        self.state = self._step(self.state, jnp.asarray(u), jnp.asarray(y), dt)
        return self.state.x

    def get_meas_dim(self):
        return self.meas_dim

    def get_observer_params(self):
        return {"W": self.W, "V": self.V, "meas_dim": self.meas_dim,
                "state_dim": self.state_dim, "C": self.dyn_sys.C,
                "H": self.dyn_sys.H}
