"""Analytic Dubins-car model: the SOFA-free, artifact-free solver test case
(capability parity with sofacontrol/scp/models/dubins_car.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DubinsCar:
    nonlinear_observer = False

    def __init__(self, dtype=jnp.float64):
        self.n_x = 3
        self.n_u = 2
        self.n_z = 3
        self.H = jnp.eye(3, dtype=dtype)
        self.dtype = dtype

    def f(self, x, u):
        return jnp.array([u[0] * jnp.cos(x[2]), u[0] * jnp.sin(x[2]), u[1]],
                         dtype=self.dtype)

    def get_continuous_dynamics(self, x, u):
        f = self.f(x, u)
        A = jax.jacfwd(self.f, argnums=0)(x, u)
        B = jax.jacfwd(self.f, argnums=1)(x, u)
        return f, A, B

    def get_discrete_dynamics(self, x, u, dt):
        """Forward-Euler discretization of the affine expansion
        (dubins_car.py:33-41)."""
        f, A, B = self.get_continuous_dynamics(x, u)
        d = f - A @ x - B @ u
        Ad = jnp.eye(3, dtype=self.dtype) + dt * A
        Bd = dt * B
        dd = dt * d
        return Ad, Bd, dd

    def get_characteristic_vals(self):
        return np.ones(self.n_x), np.ones(self.n_x)

    def get_next_state(self, x, u, dt):
        return x + dt * self.f(x, u)

    def rollout(self, x0, u, dt):
        def step(x, u_t):
            x1 = self.get_next_state(x, u_t, dt)
            return x1, x1

        _, xs = jax.lax.scan(step, jnp.asarray(x0, self.dtype),
                             jnp.asarray(u, self.dtype))
        return jnp.concatenate((jnp.asarray(x0, self.dtype)[None], xs), axis=0)
