"""Finite-horizon time-varying tracking LQR.

Capability parity with sofacontrol/lqr/traj_tracking_lqr.py: interpolate the
nominal (t, x, u) target onto the controller dt grid, fetch model Jacobians
at each nominal point, then run the backward Riccati recursion

    K_i = -(R + B'PB)^-1 B'PA
    P  <- Q + K'RK + (A + BK)' P (A + BK)

TPU-first: the per-step Jacobian fetch is one vmapped gather over the whole
horizon and the recursion itself is a single `lax.scan` (reversed), instead
of the reference's Python loop with list appends (traj_tracking_lqr.py:30-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def interp_rows(t_query, t_grid, X):
    """Row-wise linear interpolation: X (T, d) sampled at t_grid -> (Q, d)."""
    t_query = jnp.asarray(t_query)
    X = jnp.asarray(X)
    fn = lambda col: jnp.interp(t_query, jnp.asarray(t_grid), col)
    return jax.vmap(fn, in_axes=1, out_axes=1)(X)


@jax.jit
@jax.default_matmul_precision("highest")
def tv_lqr_backward(A, B, Q, R):
    """Backward recursion over stacked Jacobians A (T,n,n), B (T,n,m).

    Returns gains K (T, m, n) ordered forward in time and P (T+1, n, n).
    P is initialized to Q (traj_tracking_lqr.py:19).
    """
    def step(P, AB):
        A_t, B_t = AB
        K_t = -jnp.linalg.solve(R + B_t.T @ P @ B_t, B_t.T @ P @ A_t)
        Acl = A_t + B_t @ K_t
        P_new = Q + K_t.T @ R @ K_t + Acl.T @ P @ Acl
        # re-symmetrize: roundoff asymmetry amplifies through Acl'P Acl
        # over long horizons (see lqr/ilqr.py backward for the measurement)
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, (K_t, P_new)

    # scan over reversed time
    P0 = Q
    _, (K_rev, P_rev) = jax.lax.scan(step, P0, (A[::-1], B[::-1]))
    return K_rev[::-1], jnp.concatenate((P_rev[::-1], P0[None]), axis=0)


class TrajTrackingLQR:
    """Finite-horizon tracking LQR policy (traj_tracking_lqr.py:5-48)."""

    def __init__(self, dt, model, cost_params):
        self.dt = dt
        self.model = model
        self.cost_params = cost_params
        self.x_bar = None
        self.u_bar = None

    def compute_policy(self, target):
        """target: Target with (t, x, u). Returns (x_bar, u_bar, K)."""
        final_time = float(np.asarray(target.t)[-1])
        nbr_steps = int(final_time / self.dt)
        t_steps = self.dt * jnp.arange(nbr_steps)

        x_nom = interp_rows(t_steps, target.t, target.x)
        u_nom = interp_rows(t_steps, target.t, target.u)

        # Jacobians at every nominal point in one vmapped fetch
        jac = jax.vmap(lambda x: self.model.get_jacobians(x, dt=self.dt)[:2])
        A, B = jac(x_nom)

        K, _ = tv_lqr_backward(A, B, jnp.asarray(self.cost_params.Q),
                               jnp.asarray(self.cost_params.R))
        self.x_bar, self.u_bar = x_nom, u_nom
        return x_nom, u_nom, K
