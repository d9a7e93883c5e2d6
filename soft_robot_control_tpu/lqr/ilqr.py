"""Iterative LQR.

Capability parity with sofacontrol/lqr/ilqr.py: quadratic output-space
tracking cost 0.5 (z - z*)'Q(z - z*) with input (or delta-input) cost,
forward simulation with u = u_bar + alpha k + K (x - x_bar), backward
Riccati-like recursion with Cholesky PD checking and (state or input)
regularization, line search on the cost-decrease ratio, convergence on cost
delta. Hyperparameters mirror sofacontrol/lqr/config.py exactly.

TPU-first: the forward pass and backward recursion are single `lax.scan`s
(the reference uses Python loops with ~horizon x small-matrix ops,
ilqr.py:141-158, 249-295); line search and regularization escalation remain
host-side (few data-dependent iterations), calling the jitted scans.

Works for models with a *linear* output map z = H x + z_ref (same
restriction the reference notes at ilqr.py:184-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class iLQRConfig:
    """Defaults identical to sofacontrol/lqr/config.py."""

    def __init__(self):
        self.max_iter = 50
        self.epsilon = 0.1
        self.include_input_var_constraint = True
        self.do_linesearch = True
        self.regularize = True
        self.alpha0 = 1.0
        self.alpha_scaling = 0.5
        self.improv_lb = 1e-4
        self.improv_ub = 100
        self.alpha_min = 5e-2
        self.counter_limit = 5
        self.rho0 = 0.0
        self.drho0 = 0.0
        self.rho_scaling = 1.5
        self.rho_increase_fp = 10.0
        self.rho_max = 1e5
        self.rho_min = 1e-3
        self.state_regularization = True


class iLQR:
    def __init__(self, dt, model, cost_params, planning_horizon, **kwargs):
        self.params = kwargs.pop("config", None) or iLQRConfig()
        self.dt = dt
        self.model = model
        self.planning_horizon = int(planning_horizon)
        self.cost_params = cost_params
        self.state_dim = model.get_state_dim()
        self.input_dim = model.get_input_dim()
        self.z_target = None
        self.u_last = np.zeros(self.input_dim)

        H = jnp.asarray(model.H)
        z_ref = jnp.asarray(model.z_ref)
        Q = jnp.asarray(cost_params.Q, H.dtype)
        Qf = jnp.asarray(cost_params.Qf if cost_params.Qf is not None
                         else cost_params.Q, H.dtype)
        R = jnp.asarray(cost_params.R, H.dtype)
        dt_ = dt
        T = self.planning_horizon
        use_du = self.params.include_input_var_constraint
        state_reg = self.params.state_regularization

        def jacobians(x, u):
            return model.get_jacobians(x, dt=dt_, u=u)

        # ---------------- forward pass (jitted scan) ----------------------
        # both scans trace under HIGHEST matmul precision: TPU's default f32
        # matmul runs bf16 passes, and the backward Riccati recursion is
        # roundoff-sensitive (see the symmetrization note below); the
        # matrices are (r, r) with r ~ 30, so MXU cost is irrelevant
        @jax.jit
        @jax.default_matmul_precision("highest")
        def forward(x0, x_prev, u_prev, K, k, alpha, z_target, u_last):
            def z_of(x):
                return H @ x + z_ref

            def step(carry, inp):
                x, u_prev_step, cost = carry
                u_p, x_p, K_t, k_t, z_t = inp
                u_t = u_p + alpha * k_t + K_t @ (x - x_p)
                dz = z_of(x) - z_t
                c = 0.5 * dz @ Q @ dz
                if use_du:
                    du = u_t - u_prev_step
                    c += 0.5 * du @ R @ du
                else:
                    c += 0.5 * u_t @ R @ u_t
                A, B, d = jacobians(x, u_t)
                x1 = A @ x + B @ u_t + d
                return (x1, u_t, cost + c), (x, u_t, A, B, d)

            (xT, _, cost), (xs, us, As, Bs, ds) = jax.lax.scan(
                step, (x0, u_last, 0.0), (u_prev, x_prev[:-1], K, k, z_target[:-1]))
            dzT = z_of(xT) - z_target[-1]
            cost = cost + 0.5 * dzT @ Qf @ dzT
            x_traj = jnp.concatenate((xs, xT[None]), axis=0)
            return x_traj, us, cost, As, Bs, ds

        # ---------------- backward pass (jitted scan) ----------------------
        @jax.jit
        @jax.default_matmul_precision("highest")
        def backward(x, u, A, B, z_target, u_last, rho):
            HQ = H.T @ Q
            c_xx = H.T @ Q @ H
            n, m = self.state_dim, self.input_dim
            I_n = jnp.eye(n, dtype=H.dtype)
            I_m = jnp.eye(m, dtype=H.dtype)

            zT = H @ x[-1] + z_ref
            pT = H.T @ Qf @ (zT - z_target[-1])
            PT = H.T @ Qf @ H

            u_prev_seq = jnp.concatenate((u_last[None], u[:-1]), axis=0) \
                if use_du else jnp.zeros_like(u)

            def step(carry, inp):
                p, P, ok = carry
                x_t, u_t, A_t, B_t, z_t, u_pv = inp
                dz = H @ x_t + z_ref - z_t
                c_x = HQ @ dz
                if use_du:
                    c_u = R @ (u_t - u_pv)
                else:
                    c_u = R @ u_t
                c_uu = R
                Q_x = c_x + A_t.T @ p
                Q_u = c_u + B_t.T @ p
                Q_xx = c_xx + A_t.T @ P @ A_t
                Q_uu = c_uu + B_t.T @ P @ B_t
                Q_ux = B_t.T @ P @ A_t
                if state_reg:
                    Preg = P + rho * I_n
                    Q_uu_t = c_uu + B_t.T @ Preg @ B_t
                    Q_ux_t = B_t.T @ Preg @ A_t
                else:
                    Q_uu_t = Q_uu + rho * I_m
                    Q_ux_t = Q_ux
                # PD check via eigenvalues (Cholesky NaN check equivalent)
                eig_min = jnp.linalg.eigvalsh(Q_uu_t)[0]
                ok = ok & (eig_min > 0)
                Q_uu_t_inv = jnp.linalg.inv(Q_uu_t)
                K_t = -Q_uu_t_inv @ Q_ux_t
                k_t = -Q_uu_t_inv @ Q_u
                p_new = Q_x + K_t.T @ Q_uu @ k_t + K_t.T @ Q_u + Q_ux.T @ k_t
                P_new = Q_xx + K_t.T @ Q_uu @ K_t + K_t.T @ Q_ux + Q_ux.T @ K_t
                # re-symmetrize: roundoff asymmetry in K'Quu K + K'Qux +
                # Qux'K amplifies through A'PA and overflows the recursion
                # within ~50 steps at ANY precision (measured on the trunk
                # tet dictionary: f32 blows up at step 43, f64 at 73;
                # symmetrized holds ||P|| ~ 11 for 1100 steps)
                P_new = 0.5 * (P_new + P_new.T)
                return (p_new, P_new, ok), (K_t, k_t, Q_u, Q_uu)

            inputs = (x[:-1][::-1], u[::-1], A[::-1], B[::-1],
                      z_target[:-1][::-1], u_prev_seq[::-1])
            (_, _, all_pd), (K_r, k_r, Qu_r, Quu_r) = jax.lax.scan(
                step, (pT, PT, jnp.asarray(True)), inputs)
            return K_r[::-1], k_r[::-1], Qu_r[::-1], Quu_r[::-1], all_pd

        self._forward = forward
        self._backward = backward

    # ------------------------------------------------------------------
    def set_target(self, z_target):
        self.z_target = np.asarray(z_target, float).copy()

    def set_u_last(self, u_last):
        self.u_last = np.asarray(u_last, float).copy()

    def update_regularization(self, increase=True):
        p = self.params
        if increase:
            self.drho = max(self.drho * p.rho_scaling, p.rho_scaling)
            self.rho = max(self.rho * self.drho, p.rho_min)
            if self.rho > p.rho_max:
                self.rho = p.rho_max
        else:
            self.drho = min(self.drho / p.rho_scaling, 1.0 / p.rho_scaling)
            self.rho = self.rho * self.drho
            if self.rho <= p.rho_min:
                self.rho = p.rho_min

    def _run_backward(self, x, u, A, B, z_t, u_last):
        """Backward pass, escalating regularization until all steps are PD
        (reference semantics: restart-on-non-PD, ilqr.py:276-287)."""
        while True:
            K, k, Qu, Quu, all_pd = self._backward(
                jnp.asarray(x), jnp.asarray(u), jnp.asarray(A), jnp.asarray(B),
                jnp.asarray(z_t), jnp.asarray(u_last), jnp.asarray(self.rho))
            if bool(all_pd) or not self.params.regularize or \
                    self.rho >= self.params.rho_max:
                break
            self.update_regularization(increase=True)
        self.update_regularization(increase=False)
        return np.asarray(K), np.asarray(k), np.asarray(Qu), np.asarray(Quu)

    def ilqr_computation(self, x0, u_warmstart=None):
        """Main loop (ilqr.py:27-107 semantics). Returns (x_bar, u_bar, K)."""
        p = self.params
        self.rho = p.rho0
        self.drho = p.drho0
        failed_update_counter = 0
        T = self.planning_horizon

        x_prev = np.zeros((T + 1, self.state_dim))
        x_prev[0] = np.asarray(x0, float)
        if u_warmstart is None:
            u_warmstart = np.zeros((T, self.input_dim))

        zeros_K = np.zeros((T, self.input_dim, self.state_dim))
        zeros_k = np.zeros((T, self.input_dim))
        z_t = jnp.asarray(self.z_target)
        u_last = jnp.asarray(self.u_last)

        x, u, cost, A, B, d = [np.asarray(v) for v in self._forward(
            jnp.asarray(x_prev[0]), jnp.asarray(x_prev), jnp.asarray(u_warmstart),
            jnp.asarray(zeros_K), jnp.asarray(zeros_k), jnp.asarray(1.0),
            z_t, u_last)]
        cost = float(cost)

        is_converged = False
        nbr_iter = 0
        K = zeros_K

        while not is_converged and nbr_iter <= p.max_iter:
            K, k, Q_u, Q_uu = self._run_backward(x, u, A, B, self.z_target,
                                                 self.u_last)
            prev_cost = cost
            alpha = p.alpha0
            improved = False
            failed = False

            while not improved and not failed:
                improved = True
                out = self._forward(jnp.asarray(x[0]), jnp.asarray(x),
                                    jnp.asarray(u), jnp.asarray(K),
                                    jnp.asarray(k), jnp.asarray(alpha),
                                    z_t, u_last)
                x_tmp, u_tmp, cost_tmp, A_tmp, B_tmp, d_tmp = [np.asarray(v)
                                                               for v in out]
                cost_tmp = float(cost_tmp)

                delta_cost = float(np.sum(
                    alpha * np.einsum("ti,ti->t", k, Q_u)
                    + 0.5 * alpha**2 * np.einsum("ti,tij,tj->t", k, Q_uu, k)))

                # a full step can drive the rollout outside the model's
                # stability envelope -> inf/NaN cost. NaN comparisons are
                # all False, which would ACCEPT the trajectory and poison
                # every later iterate (observed: trunk tet iLQR all-NaN
                # policy) — reject non-finite costs explicitly and shrink.
                if not np.isfinite(cost_tmp):
                    alpha = p.alpha_scaling * alpha
                    improved = False
                    if alpha < p.alpha_min:
                        self.update_regularization(increase=True)
                        self.rho += p.rho_increase_fp
                        failed = True
                    continue

                if p.do_linesearch:
                    decrease_ratio = (cost_tmp - prev_cost) / delta_cost \
                        if delta_cost != 0 else np.inf
                    if decrease_ratio <= p.improv_lb or decrease_ratio > p.improv_ub:
                        alpha = p.alpha_scaling * alpha
                        improved = False
                        if alpha < p.alpha_min:
                            self.update_regularization(increase=True)
                            self.rho += p.rho_increase_fp
                            failed = True

            if not failed:
                x, u, cost = x_tmp, u_tmp, cost_tmp
                A, B, d = A_tmp, B_tmp, d_tmp
                is_converged = (prev_cost - cost) < p.epsilon and \
                    (prev_cost - cost) >= 0
                failed_update_counter = 0
            else:
                failed_update_counter += 1
                if failed_update_counter >= p.counter_limit:
                    is_converged = True

            nbr_iter += 1

        return x, u, K
