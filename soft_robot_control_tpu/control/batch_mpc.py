"""Fully-jitted batched closed-loop MPC + EKF — the flagship TPU path.

BASELINE config 5: run B independent closed loops (ROM-as-plant + EKF +
SCP MPC with the on-device QP) entirely inside one jitted scan, vmapped over
a batch of tracking targets / initial conditions, shardable over a device
mesh (see parallel/mesh.py).

Semantics correspond to the reference's real-time MPC configuration
(max_gusto_iters=0: exactly one LOCP solve per MPC query,
examples/hardware/diamond_SSM.py:361; plan feedback with per-TPWL-point DARE
gains, tpwl/controllers.py:239-246,326-333), restructured for the compiler:

- time is an outer scan over replanning windows and an inner scan over
  controller ticks, so replanning happens unconditionally at window starts
  (no data-dependent control flow);
- the QP is solved with a fixed-iteration warm-started ADMM (no adaptive
  rho refactorization — under vmap both cond branches would execute);
- the EKF is the functional pytree filter from estimators/ekf.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.constraints import HyperRectangle
from soft_robot_control_tpu.estimators.ekf import EKFState, ekf_correct
from soft_robot_control_tpu.lqr.riccati import dare
from soft_robot_control_tpu.qp.admm import OSQP_RHO_EQ_SCALE
from soft_robot_control_tpu.qp.blocked import (chol_blocked,  # noqa: F401
                                               make_kinv,
                                               tri_inv_blocked)
from soft_robot_control_tpu.scp.locp import LOCPParams, LOCPSpec


def admm_fixed(P, q, A, l, u, w0, y0, rho_vec, iters: int, sigma=1e-6,
               alpha=1.6):
    """Warm-started fixed-iteration ADMM (OSQP update rule, no termination
    checks, no scaling — the LOCP is pre-scaled by x_char)."""
    n = P.shape[0]
    K = P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho_vec[None, :]) @ A
    chol = jnp.linalg.cholesky(K)
    z0 = jnp.clip(A @ w0, l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + A.T @ (rho_vec * z - y)
        w_t = jax.scipy.linalg.cho_solve((chol, True), rhs)
        z_t = A @ w_t
        w_new = alpha * w_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w0, z0, y0))
    return w, y


def equilibrate_qp(P, q, A, l, u, w0, y0, iters: int = 6):
    """Ruiz-equilibrate a QP and transform bounds + warm start into the
    scaled space (OSQP sec 5.1; reuses qp/admm.py:_ruiz_equilibrate).
    Returns scaled (P,q,A,l,u,w0,y0) and the (d, e, c) scalings needed to
    map the solution back: w = d*w_s, y = e*y_s/c.

    Without this the fixed-iteration kernels run on raw condensed data
    whose row/column scales differ by ~1e4 (G-chain outputs vs u bounds in
    mN), and no single rho converges both residuals — measured on the
    campaign model: rel tracking 0.20 at the rho that respects bounds,
    500 mN bound violation at the rho that tracks."""
    from soft_robot_control_tpu.qp.admm import _ruiz_equilibrate

    Ps, qs, As, d, e, c = _ruiz_equilibrate(P, q, A, iters)
    return Ps, qs, As, e * l, e * u, w0 / d, c * y0 / e, (d, e, c)


def _rho_multiplier(P, q, A, l, u, w, y):
    """OSQP residual-balance rho multiplier sqrt(pri_rel / dua_rel) at the
    current iterate (w, y) with z = clip(Aw, l, u) — the same balance the
    adaptive full solver uses (qp/admm.py:226-250), evaluated once between
    fixed-iteration stages instead of inside the loop."""
    hi = jax.lax.Precision.HIGHEST
    Ax = jnp.matmul(A, w, precision=hi)
    z = jnp.clip(Ax, l, u)
    pri = jnp.max(jnp.abs(Ax - z))
    pri_sc = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))), 1e-12)
    Px = jnp.matmul(P, w, precision=hi)
    Aty = jnp.matmul(A.T, y, precision=hi)
    dua = jnp.max(jnp.abs(Px + q + Aty))
    dua_sc = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
        jnp.maximum(jnp.max(jnp.abs(q)), 1e-12))
    return jnp.sqrt((pri / pri_sc) / jnp.maximum(dua / dua_sc, 1e-18))


def admm_staged_kinv(P, q, A, l, u, w0, y0, rho0_vec, iters: int,
                     stages: int = 1, sigma=1e-6, alpha=1.6):
    """Fixed-TOTAL-iteration ADMM with `stages` rho re-balancing points:
    run iters/stages iterations, rebalance the per-row rho from the scaled
    residual ratio, rebuild K^-1 (cheap — the condensed KKT is (N*nu)^2),
    repeat. stages=1 is the plain fixed-iteration kernel. A mistuned fixed
    rho costs ~10x tracking accuracy at 50 f32 iterations (measured on the
    campaign model); one rebalance recovers most of it."""
    per = max(1, iters // stages)
    rho_vec = rho0_vec
    w, y = w0, y0
    for s in range(stages):
        Kinv = make_kinv(P, A, rho_vec, sigma)
        w, y = admm_fixed_kinv(Kinv, q, A, l, u, w, y, rho_vec, per,
                               sigma, alpha)
        if s < stages - 1:
            mult = _rho_multiplier(P, q, A, l, u, w, y)
            rho_vec = jnp.clip(rho_vec * mult, 1e-6, 1e6)
    return w, y


def admm_staged_pallas(P, q, A, l, u, w0, y0, rho0_vec, iters: int,
                       stages: int, interpret: bool, sigma=1e-6, alpha=1.6):
    """Batched staged ADMM through the grid-batched Pallas kernel.

    The kernel takes one shared rho row, but after the first rebalance each
    window wants its own rho; per-row rho is equivalent to row-scaling the
    constraints (rho_i <-> scaling row i by sqrt(rho_i) at unit rho), so
    the per-window rho is folded into A/l/u/y and the kernel always runs at
    rho = 1 after stage 0."""
    from soft_robot_control_tpu.ops.pallas_admm import admm_batched_pallas

    B = q.shape[0]
    per = max(1, iters // stages)
    rho = jnp.broadcast_to(rho0_vec, (B, rho0_vec.shape[-1]))
    ones = jnp.ones(rho0_vec.shape[-1], q.dtype)
    w, y = w0, y0
    for s in range(stages):
        srt = jnp.sqrt(rho)
        As = A * srt[:, :, None]
        ls, us = srt * l, srt * u
        ys = y / srt
        Kinv = jax.vmap(lambda P_, A_: make_kinv(P_, A_, ones, sigma))(P, As)
        w, ys = admm_batched_pallas(Kinv, As, q, ls, us, ones, w, ys, per,
                                    sigma, alpha, interpret=interpret)
        y = srt * ys
        if s < stages - 1:
            mult = jax.vmap(_rho_multiplier)(P, q, A, l, u, w, y)
            rho = jnp.clip(rho * mult[:, None], 1e-6, 1e6)
    return w, y


def admm_fixed_kinv(Kinv, q, A, l, u, w0, y0, rho_vec, iters: int,
                    sigma=1e-6, alpha=1.6):
    """Fixed-iteration ADMM with a precomputed K^-1: every iteration is
    pure matmuls/elementwise — the vmapped/batched fast path."""
    hi = jax.lax.Precision.HIGHEST
    z0 = jnp.clip(A @ w0, l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + jnp.matmul(A.T, rho_vec * z - y, precision=hi)
        w_t = jnp.matmul(Kinv, rhs, precision=hi)
        z_t = jnp.matmul(A, w_t, precision=hi)
        w_new = alpha * w_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w0, z0, y0))
    return w, y


class BatchMPC:
    """Factory for the jitted batched closed loop on a TPWL model."""

    def __init__(self, model, Qz, R, N: int, dt: float, N_replan: int = 1,
                 U=None, dU=None, x_char=None, rho: float = 0.1,
                 qp_iters: int = 100, scp_iters: int = 1,
                 W=None, V=None, Qk=None, Rk=None,
                 delta0: float = 1e4, omega0: float = 1.0,
                 trust_region: bool = False, use_pallas: bool = False,
                 x_step: str = "chol", formulation: str = "sparse",
                 scaling_iters: int = 6, rho_stages: int = 1,
                 dtype=jnp.float32):
        """
        model: TPWLModel with output + measurement models set, will be
               pre-discretized at dt.
        Qz, R: MPC cost. Qk, Rk: feedback-gain cost (defaults H'QzH, R).
        W, V: EKF covariances.
        formulation: 'sparse' keeps x as QP variables (the reference LOCP
            shape); 'condensed' eliminates them by forward substitution
            (scp/locp_condensed.py) — identical optimum in the real-time
            trust_region=False mode with a ~(N*nu)^2 KKT instead of
            ((N+1)*nx + N*nu)^2.
        """
        self.dt = float(dt)
        self.N = int(N)
        self.N_replan = int(N_replan)
        model = model.pre_discretize(self.dt)
        # cast the model once to the compute dtype
        self.model = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") else a, model)
        m = self.model
        self.n_x, self.n_u, self.n_z = m.state_dim, m.input_dim, m.H.shape[0]
        self.n_y = m.C.shape[0]
        self.dtype = dtype

        Qz = jnp.asarray(Qz, dtype)
        R = jnp.asarray(R, dtype)
        # the trust region is inert in the real-time single-LOCP mode
        # (delta0=1e4 never binds); dropping it removes ~2/3 of the QP rows
        self.spec = LOCPSpec(self.N, np.asarray(m.H), np.asarray(Qz),
                             np.asarray(R), U=U, dU=dU, x_char=x_char,
                             is_tr_active=trust_region, dtype=dtype)
        # per-constraint rho (equalities get the OSQP 1e3 boost): row layout
        # of the spec is static, so build the vector once
        n_con = self.spec.n_con
        rho_vec = np.full(n_con, rho)
        nx, N_ = self.spec.n_x, self.spec.N
        rho_vec[self.spec.r_init:self.spec.r_init + nx] *= OSQP_RHO_EQ_SCALE
        rho_vec[self.spec.r_dyn:self.spec.r_dyn + N_ * nx] *= OSQP_RHO_EQ_SCALE
        self.rho_vec = jnp.asarray(rho_vec, dtype)
        self.qp_iters = int(qp_iters)
        self.scp_iters = int(scp_iters)
        self.delta0 = delta0
        self.omega0 = omega0
        self.use_pallas = bool(use_pallas)
        # x-step linear solve: 'chol' (per-iteration cho_solve, best f64
        # accuracy) or 'kinv' (precomputed K^-1, pure-matmul iterations —
        # the fast path under vmap where batched triangular solves dominate)
        self.x_step = x_step
        self.formulation = formulation
        # Ruiz equilibration of the per-window QP before the fixed-iteration
        # kernel (see equilibrate_qp); 0 disables
        self.scaling_iters = int(scaling_iters)
        # rho re-balancing points inside the fixed iteration budget
        # (admm_staged_kinv); 1 = plain fixed-rho kernel
        self.rho_stages = int(rho_stages)
        # executed-command clamp: the closed-loop bridge applies actuation
        # limits to the final command (reference clamps at min_force,
        # sim/closed_loop.py does the same) — the DARE feedback term is
        # outside the QP's constraint set
        self.u_clamp = None
        if isinstance(U, HyperRectangle):
            b = np.asarray(U.b, np.float64)
            self.u_clamp = (jnp.asarray(-b[1::2], dtype),
                            jnp.asarray(b[0::2], dtype))
        if formulation == "condensed":
            if trust_region:
                raise NotImplementedError(
                    "the condensed formulation eliminates x, so the trust "
                    "region (a constraint on x) needs the sparse spec")
            from soft_robot_control_tpu.scp.locp_condensed import CondensedSpec

            self.cspec = CondensedSpec(self.N, np.asarray(m.H),
                                       np.asarray(Qz), np.asarray(R),
                                       U=U, dU=dU, dtype=dtype)
            # all rows are inequalities: no equality-rho boost
            self.rho_vec_c = jnp.full(self.cspec.n_con, rho, dtype)
        elif formulation != "sparse":
            raise ValueError(f"unknown formulation {formulation!r}")

        # EKF covariances
        self.W = jnp.asarray(W if W is not None else 100.0 * np.eye(self.n_x),
                             dtype)
        self.V = jnp.asarray(V if V is not None else np.eye(self.n_y), dtype)

        # per-TPWL-point DARE feedback gains (tpwl/controllers.py:239-246)
        Qk = jnp.asarray(Qk, dtype) if Qk is not None else m.H.T @ Qz @ m.H
        Rk = jnp.asarray(Rk, dtype) if Rk is not None else R
        K, _ = jax.vmap(lambda a, b: dare(a, b, Qk, Rk))(m.A_d, m.B_d)
        self.K_pts = K.astype(dtype)

        # mp-sharded dictionary mode (parallel/mesh.py): when set (inside a
        # shard_map trace), self.model/K_pts hold only the LOCAL point shard,
        # _mp_valid masks padding rows, and every nearest-point selection
        # goes through a distributed argmin + owner psum over _mp_axis
        self._mp_axis = None
        self._mp_valid = None

        self._run = None

    # ------------------------------------------------------------------
    def _select(self, x, arrays):
        """Nearest-dictionary-point row of each array in `arrays` at state
        x. Local mode: one argmin + len(arrays) gathers. mp mode (dictionary
        sharded over a mesh axis): local argmin on the shard, global pmin,
        and the owning shard contributes its rows through a psum — the same
        collective pattern as parallel/mesh.py:shard_tpwl_gather."""
        m = self.model
        if self._mp_axis is None:
            i = m.calc_nearest_point(x)
            return tuple(a[i] for a in arrays)
        dist = m.point_distances(x)
        if self._mp_valid is not None:
            dist = jnp.where(self._mp_valid, dist, jnp.inf)
        li = jnp.argmin(dist)
        lmin = dist[li]
        gmin = jax.lax.pmin(lmin, self._mp_axis)
        rank = jax.lax.axis_index(self._mp_axis)
        owner = jax.lax.pmin(
            jnp.where(lmin == gmin, rank, jnp.iinfo(jnp.int32).max),
            self._mp_axis)
        sel = (rank == owner)
        return tuple(
            jax.lax.psum(jnp.where(sel, 1, 0).astype(a.dtype) * a[li],
                         self._mp_axis) for a in arrays)

    # ------------------------------------------------------------------
    def _shift_plan(self, x_plan, u_plan, axis: int = 0):
        """Advance the previous window's plan by N_replan steps so the
        linearization trajectory is time-aligned with the new window (the
        reference shifts its previous solution the same way before warm-
        starting, scp/ros.py:110-114). Entries beyond the old horizon
        repeat the last plan point. Without this the TPWL points are
        gathered at states N_replan steps stale."""
        N_rep = self.N_replan

        def sh(a):
            head = jax.lax.slice_in_dim(a, N_rep, a.shape[axis], axis=axis)
            last = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                        axis=axis)
            reps = [1] * a.ndim
            reps[axis] = N_rep
            return jnp.concatenate([head, jnp.tile(last, reps)], axis=axis)

        return sh(x_plan), sh(u_plan)

    def _mpc_query(self, x0, x_plan_prev, u_plan_prev, z_win, warm):
        """One MPC query: scp_iters LOCP solves linearized along the current
        plan (scp_iters=1 == the reference's max_gusto_iters=0 real-time
        mode). Returns (x_plan, u_plan, warm).

        z_win targets are ABSOLUTE outputs (matching the logged z and the
        reference's zfyf convention); the QP costs shifted z = H x_r, so
        shift here."""
        m = self.model
        spec = self.spec
        x_plan_prev, u_plan_prev = self._shift_plan(x_plan_prev, u_plan_prev)
        if m.z_ref is not None:
            z_win = z_win - jnp.asarray(m.z_ref, z_win.dtype)

        if self.formulation == "condensed":
            cspec = self.cspec

            def scp_iter_c(carry, _):
                x_k, u_k, (w0, y0) = carry
                Ad, Bd, dd = self._gather_traj(x_k)
                P, q, A, l, u, _, xfree, G = cspec.assemble(
                    self._condensed_params(Ad, Bd, dd, x0, z_win))
                if self.scaling_iters > 0:
                    P, q, A, l, u, w0, y0, (d_s, e_s, c_s) = equilibrate_qp(
                        P, q, A, l, u, w0, y0, self.scaling_iters)
                w, y = admm_staged_kinv(P, q, A, l, u, w0, y0,
                                        self.rho_vec_c, self.qp_iters,
                                        self.rho_stages)
                if self.scaling_iters > 0:
                    w = d_s * w
                    y = e_s * y / c_s
                u_new = w.reshape(self.N, self.n_u)
                x_new = cspec.recover_x(xfree, G, w)
                return (x_new, u_new, (w, y)), None

            (x_plan, u_plan, warm), _ = jax.lax.scan(
                scp_iter_c, (x_plan_prev, u_plan_prev, warm), None,
                length=self.scp_iters)
            return x_plan, u_plan, warm

        def scp_iter(carry, _):
            x_k, u_k, (w0, y0) = carry
            Ad, Bd, dd = jax.vmap(
                lambda x: (m.A_d[m.calc_nearest_point(x)],
                           m.B_d[m.calc_nearest_point(x)],
                           m.d_d[m.calc_nearest_point(x)]))(x_k[:-1])
            params = LOCPParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0, xk=x_k,
                delta=jnp.asarray(self.delta0, self.dtype),
                omega=jnp.asarray(self.omega0, self.dtype),
                z=z_win, zf=jnp.zeros(self.n_z, self.dtype),
                u_des=jnp.zeros((self.N, self.n_u), self.dtype),
                Hd=jnp.zeros((self.N + 1, self.n_z, self.n_x), self.dtype),
                cd=jnp.zeros((self.N + 1, self.n_z), self.dtype))
            P, q, A, l, u, _ = spec.assemble(params)
            if self.scaling_iters > 0:
                P, q, A, l, u, w0, y0, (d_s, e_s, c_s) = equilibrate_qp(
                    P, q, A, l, u, w0, y0, self.scaling_iters)
            if self.use_pallas:
                from soft_robot_control_tpu.ops.pallas_admm import admm_fixed_pallas

                w, y = admm_fixed_pallas(P, q, A, l, u, w0, y0, self.rho_vec,
                                         self.qp_iters)
            elif self.x_step == "kinv":
                w, y = admm_staged_kinv(P, q, A, l, u, w0, y0, self.rho_vec,
                                        self.qp_iters, self.rho_stages)
            else:
                w, y = admm_fixed(P, q, A, l, u, w0, y0, self.rho_vec,
                                  self.qp_iters)
            if self.scaling_iters > 0:
                w = d_s * w
                y = e_s * y / c_s
            x_new = w[spec.off_x:spec.off_u].reshape(self.N + 1, self.n_x)
            u_new = w[spec.off_u:spec.off_u + self.N * self.n_u].reshape(
                self.N, self.n_u)
            return (x_new, u_new, (w, y)), None

        (x_plan, u_plan, warm), _ = jax.lax.scan(
            scp_iter, (x_plan_prev, u_plan_prev, warm), None,
            length=self.scp_iters)
        return x_plan, u_plan, warm

    # ------------------------------------------------------------------
    def _qp_dims(self):
        if self.formulation == "condensed":
            return self.cspec.n_var, self.cspec.n_con
        return self.spec.n_var, self.spec.n_con

    def _gather_traj(self, x_k):
        m = self.model

        def one(x):
            return self._select(x, (m.A_d, m.B_d, m.d_d))

        return jax.vmap(one)(x_k[:-1])

    def _condensed_params(self, Ad, Bd, dd, x0, z_win):
        from soft_robot_control_tpu.scp.locp_condensed import CondensedParams

        return CondensedParams(
            Ad=Ad, Bd=Bd, dd=dd, x0=x0, z=z_win,
            u_des=jnp.zeros((self.N, self.n_u), self.dtype),
            Hd=jnp.zeros((self.N + 1, self.n_z, self.n_x), self.dtype),
            cd=jnp.zeros((self.N + 1, self.n_z), self.dtype))

    def _mpc_query_batched(self, x0, x_plan_prev, u_plan_prev, z_win, warm,
                           interpret: bool):
        """Batched MPC query over a leading B axis: assembly/K^-1 are
        vmapped, but the ADMM loop runs as ONE grid-batched Pallas launch
        (ops/pallas_admm.py:admm_batched_pallas via admm_staged_pallas)
        instead of iters x 8 HBM-bound batched XLA ops."""
        m = self.model
        spec = self.spec
        B = x0.shape[0]
        x_plan_prev, u_plan_prev = self._shift_plan(x_plan_prev, u_plan_prev,
                                                    axis=1)
        if m.z_ref is not None:  # absolute targets in, shifted QP inside
            z_win = z_win - jnp.asarray(m.z_ref, z_win.dtype)

        if self.formulation == "condensed":
            cspec = self.cspec

            def scp_iter_c(carry, _):
                x_k, u_k, (w0, y0) = carry

                def assemble_one(x0_i, x_k_i, z_w):
                    Ad, Bd, dd = self._gather_traj(x_k_i)
                    return cspec.assemble(
                        self._condensed_params(Ad, Bd, dd, x0_i, z_w))

                P, q, A, l, u, _, xfree, G = jax.vmap(assemble_one)(
                    x0, x_k, z_win)
                if self.scaling_iters > 0:
                    P, q, A, l, u, w0, y0, (d_s, e_s, c_s) = jax.vmap(
                        lambda *a: equilibrate_qp(*a, iters=self.scaling_iters)
                    )(P, q, A, l, u, w0, y0)
                w, y = admm_staged_pallas(P, q, A, l, u, w0, y0,
                                          self.rho_vec_c, self.qp_iters,
                                          self.rho_stages, interpret)
                if self.scaling_iters > 0:
                    w = d_s * w
                    y = e_s * y / c_s[:, None]
                u_new = w.reshape(B, self.N, self.n_u)
                x_new = jax.vmap(cspec.recover_x)(xfree, G, w)
                return (x_new, u_new, (w, y)), None

            (x_plan, u_plan, warm), _ = jax.lax.scan(
                scp_iter_c, (x_plan_prev, u_plan_prev, warm), None,
                length=self.scp_iters)
            return x_plan, u_plan, warm

        def assemble_one(x0_i, x_k, z_w):
            Ad, Bd, dd = jax.vmap(
                lambda x: self._select(x, (m.A_d, m.B_d, m.d_d)))(x_k[:-1])
            params = LOCPParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0_i, xk=x_k,
                delta=jnp.asarray(self.delta0, self.dtype),
                omega=jnp.asarray(self.omega0, self.dtype),
                z=z_w, zf=jnp.zeros(self.n_z, self.dtype),
                u_des=jnp.zeros((self.N, self.n_u), self.dtype),
                Hd=jnp.zeros((self.N + 1, self.n_z, self.n_x), self.dtype),
                cd=jnp.zeros((self.N + 1, self.n_z), self.dtype))
            return spec.assemble(params)

        def scp_iter(carry, _):
            x_k, u_k, (w0, y0) = carry
            P, q, A, l, u, _ = jax.vmap(assemble_one)(x0, x_k, z_win)
            if self.scaling_iters > 0:
                P, q, A, l, u, w0, y0, (d_s, e_s, c_s) = jax.vmap(
                    lambda *a: equilibrate_qp(*a, iters=self.scaling_iters)
                )(P, q, A, l, u, w0, y0)
            w, y = admm_staged_pallas(P, q, A, l, u, w0, y0, self.rho_vec,
                                      self.qp_iters, self.rho_stages,
                                      interpret)
            if self.scaling_iters > 0:
                w = d_s * w
                y = e_s * y / c_s[:, None]
            x_new = w[:, spec.off_x:spec.off_u].reshape(B, self.N + 1,
                                                        self.n_x)
            u_new = w[:, spec.off_u:spec.off_u + self.N * self.n_u].reshape(
                B, self.N, self.n_u)
            return (x_new, u_new, (w, y)), None

        (x_plan, u_plan, warm), _ = jax.lax.scan(
            scp_iter, (x_plan_prev, u_plan_prev, warm), None,
            length=self.scp_iters)
        return x_plan, u_plan, warm

    # ------------------------------------------------------------------
    def _make_tick(self, noise_std: float):
        m = self.model
        dt = self.dt

        def plant_step(x, u):
            A, B, d = self._select(x, (m.A_d, m.B_d, m.d_d))
            return A @ x + B @ u + d

        def tick(carry, k):
            x_p, ekf, x_plan, u_plan, key = carry
            x_bar = x_plan[k]
            u_bar = u_plan[k]
            (K_near,) = self._select(x_bar, (self.K_pts,))
            u = u_bar + K_near @ (ekf.x - x_bar)
            if self.u_clamp is not None:
                u = jnp.clip(u, self.u_clamp[0], self.u_clamp[1])
            x_next = plant_step(x_p, u)
            key, sub = jax.random.split(key)
            y = m.C @ x_next + m.y_ref
            if noise_std > 0:
                y = y + noise_std * jax.random.normal(sub, (self.n_y,),
                                                      dtype=self.dtype)
            # EKF predict via _select (see build()'s tick for why)
            A_e, B_e, d_e = self._select(ekf.x, (m.A_d, m.B_d, m.d_d))
            ekf_next = ekf_correct(
                m, EKFState(A_e @ ekf.x + B_e @ u + d_e,
                            A_e @ ekf.Sigma @ A_e.T + self.W), y, self.V)
            z = m.H @ x_next + m.z_ref
            return (x_next, ekf_next, x_plan, u_plan, key), (z, u)

        return plant_step, tick

    # ------------------------------------------------------------------
    def build_fused(self, n_windows: int, noise_std: float = 0.0,
                    interpret=None):
        """Build the batch-fused closed loop: the window scan runs at BATCH
        level so all B QPs solve in one grid-batched Pallas launch per
        window (the per-element ticks stay vmapped). Same semantics and log
        layout as run_batch, higher throughput on TPU.

            run(x_plant0 (B,n_x), ekf_x0 (B,n_x),
                z_target (B,n_windows,N+1,n_z), keys (B,2)) -> logs (B,...)
        """
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        N, N_rep = self.N, self.N_replan
        _, tick = self._make_tick(noise_std)
        n_var, n_con = self._qp_dims()

        def tick_scan(x_p, ekf, x_plan, u_plan, key):
            (x_p, ekf, _, _, key), (zs, us) = jax.lax.scan(
                tick, (x_p, ekf, x_plan, u_plan, key), jnp.arange(N_rep))
            return (x_p, ekf, key), (zs, us)

        def window_b(carry, z_win):
            x_p, ekf, x_plan, u_plan, warm, key = carry
            x_plan, u_plan, warm = self._mpc_query_batched(
                ekf.x, x_plan, u_plan, z_win, warm, interpret)
            (x_p, ekf, key), (zs, us) = jax.vmap(tick_scan)(
                x_p, ekf, x_plan, u_plan, key)
            return (x_p, ekf, x_plan, u_plan, warm, key), (zs, us)

        def run(x_plant0, ekf_x0, z_target, keys):
            B = x_plant0.shape[0]
            ekf0 = EKFState(ekf_x0, jnp.tile(
                jnp.eye(self.n_x, dtype=self.dtype)[None], (B, 1, 1)))
            x_plan0 = jnp.tile(ekf_x0[:, None], (1, N + 1, 1))
            u_plan0 = jnp.zeros((B, N, self.n_u), self.dtype)
            warm0 = (jnp.zeros((B, n_var), self.dtype),
                     jnp.zeros((B, n_con), self.dtype))
            carry0 = (x_plant0, ekf0, x_plan0, u_plan0, warm0, keys)
            # windows-major targets for the batch-level scan
            _, (zs, us) = jax.lax.scan(window_b, carry0,
                                       jnp.swapaxes(z_target, 0, 1))
            # (n_win, B, N_rep, .) -> (B, n_win*N_rep, .) to match run_batch
            fix = lambda a: jnp.swapaxes(a, 0, 1).reshape(B, -1, a.shape[-1])
            return {"z": fix(zs), "u": fix(us)}

        self._run_fused = jax.jit(run)
        return self._run_fused

    # ------------------------------------------------------------------
    def build(self, n_windows: int, noise_std: float = 0.0):
        """Build the jitted single-trajectory closed loop:

            run(x_plant0, ekf0, z_target (n_windows*N_replan + N + 1, n_z),
                key) -> dict of logs

        vmap/shard over leading batch axes of the arguments.
        """
        m = self.model
        N, N_rep = self.N, self.N_replan
        dt = self.dt

        def plant_step(x, u):
            A, B, d = self._select(x, (m.A_d, m.B_d, m.d_d))
            return A @ x + B @ u + d

        def tick(carry, k):
            x_p, ekf, x_plan, u_plan, key = carry
            # feedback around the plan at in-window step k
            x_bar = x_plan[k]
            u_bar = u_plan[k]
            (K_near,) = self._select(x_bar, (self.K_pts,))
            u = u_bar + K_near @ (ekf.x - x_bar)
            if self.u_clamp is not None:
                u = jnp.clip(u, self.u_clamp[0], self.u_clamp[1])
            # plant step + measurement
            x_next = plant_step(x_p, u)
            key, sub = jax.random.split(key)
            y = m.C @ x_next + m.y_ref
            if noise_std > 0:
                y = y + noise_std * jax.random.normal(sub, (self.n_y,),
                                                      dtype=self.dtype)
            # EKF predict via _select (ekf_predict's model.get_jacobians
            # would only see the local shard in mp mode), then correct
            A_e, B_e, d_e = self._select(ekf.x, (m.A_d, m.B_d, m.d_d))
            ekf_next = ekf_correct(
                m, EKFState(A_e @ ekf.x + B_e @ u + d_e,
                            A_e @ ekf.Sigma @ A_e.T + self.W), y, self.V)
            z = m.H @ x_next + m.z_ref
            return (x_next, ekf_next, x_plan, u_plan, key), (z, u)

        def window(carry, z_win):
            x_p, ekf, x_plan, u_plan, warm, key = carry
            # replan from the current belief (mpc=True semantics)
            x_plan, u_plan, warm = self._mpc_query(ekf.x, x_plan, u_plan,
                                                   z_win, warm)
            (x_p, ekf, _, _, key), (zs, us) = jax.lax.scan(
                tick, (x_p, ekf, x_plan, u_plan, key), jnp.arange(N_rep))
            return (x_p, ekf, x_plan, u_plan, warm, key), (zs, us)

        n_var, n_con = self._qp_dims()

        def run(x_plant0, ekf_x0, z_target, key):
            """z_target: (n_windows, N+1, n_z) pre-windowed targets."""
            ekf0 = EKFState(ekf_x0, jnp.eye(self.n_x, dtype=self.dtype))
            x_plan0 = jnp.tile(ekf_x0[None], (N + 1, 1))
            u_plan0 = jnp.zeros((N, self.n_u), self.dtype)
            warm0 = (jnp.zeros(n_var, self.dtype), jnp.zeros(n_con, self.dtype))
            carry0 = (x_plant0, ekf0, x_plan0, u_plan0, warm0, key)
            _, (zs, us) = jax.lax.scan(window, carry0, z_target)
            return {"z": zs.reshape(-1, self.n_z),
                    "u": us.reshape(-1, self.n_u)}

        self._run = run
        return run

    def run_batch(self, x_plant0, ekf_x0, z_target, keys):
        """vmapped batched closed loop.

        x_plant0 (B, n_x); ekf_x0 (B, n_x); z_target (B, n_windows, N+1, n_z);
        keys (B, 2) PRNG keys. Returns logs with leading batch axis.
        """
        if self._run is None:
            raise RuntimeError("call build() first")
        return jax.jit(jax.vmap(self._run))(x_plant0, ekf_x0, z_target, keys)


class BatchSSMMPC:
    """Fully-jitted batched SSM MPC (config 4 x config 5).

    The SSM real-time configuration (examples/hardware/diamond_SSM.py:
    max_gusto_iters=0, manifold observer, feedforward-only control,
    SSM/controllers.py:235-239) compiled as one scan: each window
    relinearizes the polynomial dynamics AND the nonlinear chart along the
    previous plan (time-varying H_d, c_d entering the QP objective,
    locp.py:231-245 semantics), solves one LOCP with fixed-iteration ADMM,
    and executes N_replan feedforward ticks against the SSM-as-plant with
    the algebraic manifold observer in the loop.
    """

    def __init__(self, model, Qz, R, N: int, dt: float, N_replan: int = 1,
                 U=None, dU=None, qp_iters: int = 100, rho: float = 0.1,
                 x_step: str = "kinv", formulation: str = "condensed",
                 dtype=jnp.float64):
        # formulation default is 'condensed' (states eliminated exactly,
        # scp/locp_condensed.py — incl. the time-varying Hd/cd objective):
        # no dynamics-equality residual survives fixed ADMM iterations and
        # the fused launch runs ~4x the sparse throughput (bench.py).
        self.dt = float(dt)
        self.N = int(N)
        self.N_replan = int(N_replan)
        self.model = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if hasattr(a, "astype") else a, model)
        m = self.model
        self.n_x, self.n_u = m.state_dim, m.input_dim
        self.n_z = m.output_dim
        self.dtype = dtype
        self.x_step = x_step
        Qz = np.asarray(Qz)
        R = np.asarray(R)
        self.spec = LOCPSpec(self.N, np.asarray(m.H), Qz, R, U=U, dU=dU,
                             nonlinear_observer=True, is_tr_active=False,
                             dtype=dtype)
        rho_vec = np.full(self.spec.n_con, rho)
        nx, N_ = self.spec.n_x, self.spec.N
        rho_vec[self.spec.r_init:self.spec.r_init + nx] *= OSQP_RHO_EQ_SCALE
        rho_vec[self.spec.r_dyn:self.spec.r_dyn + N_ * nx] *= OSQP_RHO_EQ_SCALE
        self.rho_vec = jnp.asarray(rho_vec, dtype)
        self.qp_iters = int(qp_iters)
        self.formulation = formulation
        if formulation == "condensed":
            from soft_robot_control_tpu.scp.locp_condensed import CondensedSpec

            self.cspec = CondensedSpec(self.N, np.asarray(m.H),
                                       np.asarray(Qz), np.asarray(R), U=U,
                                       dU=dU, nonlinear_observer=True,
                                       dtype=dtype)
            self.rho_vec_c = jnp.full(self.cspec.n_con, rho, dtype)
        elif formulation != "sparse":
            raise ValueError(f"unknown formulation {formulation!r}")
        self._run = None

    def _qp_dims(self):
        if self.formulation == "condensed":
            return self.cspec.n_var, self.cspec.n_con
        return self.spec.n_var, self.spec.n_con

    def _lin_traj(self, x_plan_prev, u_plan_prev):
        m = self.model
        Ad, Bd, dd = jax.vmap(lambda x, u_: m.get_jacobians(x, u_, self.dt))(
            x_plan_prev[:-1], u_plan_prev)
        Hd, cd = jax.vmap(m.get_observer_jacobians)(x_plan_prev)
        return Ad, Bd, dd, Hd, cd

    def _condensed_params(self, Ad, Bd, dd, Hd, cd, x0, z_win):
        from soft_robot_control_tpu.scp.locp_condensed import CondensedParams

        return CondensedParams(
            Ad=Ad, Bd=Bd, dd=dd, x0=x0, z=z_win,
            u_des=jnp.zeros((self.N, self.n_u), self.dtype), Hd=Hd, cd=cd)

    _shift_plan = BatchMPC._shift_plan

    def _mpc_query(self, x0, x_plan_prev, u_plan_prev, z_win, warm):
        m, spec = self.model, self.spec
        x_plan_prev, u_plan_prev = self._shift_plan(x_plan_prev, u_plan_prev)
        Ad, Bd, dd, Hd, cd = self._lin_traj(x_plan_prev, u_plan_prev)
        w0, y0 = warm
        if self.formulation == "condensed":
            P, q, A, l, u, _, xfree, G = self.cspec.assemble(
                self._condensed_params(Ad, Bd, dd, Hd, cd, x0, z_win))
            Kinv = make_kinv(P, A, self.rho_vec_c)
            w, y = admm_fixed_kinv(Kinv, q, A, l, u, w0, y0, self.rho_vec_c,
                                   self.qp_iters)
            u_plan = w.reshape(self.N, self.n_u)
            x_plan = self.cspec.recover_x(xfree, G, w)
            return x_plan, u_plan, (w, y)
        params = LOCPParams(
            Ad=Ad, Bd=Bd, dd=dd, x0=x0, xk=x_plan_prev,
            delta=jnp.asarray(1e4, self.dtype),
            omega=jnp.asarray(1.0, self.dtype),
            z=z_win, zf=jnp.zeros(self.n_z, self.dtype),
            u_des=jnp.zeros((self.N, self.n_u), self.dtype),
            Hd=Hd, cd=cd)
        P, q, A, l, u, _ = spec.assemble(params)
        if self.x_step == "kinv":
            Kinv = make_kinv(P, A, self.rho_vec)
            w, y = admm_fixed_kinv(Kinv, q, A, l, u, w0, y0, self.rho_vec,
                                   self.qp_iters)
        else:
            w, y = admm_fixed(P, q, A, l, u, w0, y0, self.rho_vec,
                              self.qp_iters)
        x_plan = w[spec.off_x:spec.off_u].reshape(self.N + 1, self.n_x)
        u_plan = w[spec.off_u:spec.off_u + self.N * self.n_u].reshape(
            self.N, self.n_u)
        return x_plan, u_plan, (w, y)

    def build(self, n_windows: int):
        m = self.model
        N, N_rep, dt = self.N, self.N_replan, self.dt

        def tick(carry, k):
            x_p, x_plan, u_plan = carry
            u = u_plan[k]  # feedforward only (SSM/controllers.py:235-239)
            x_next = m.update_state(x_p, u, dt)
            z = m.x_to_zfyf(x_next)
            return (x_next, x_plan, u_plan), (z, u)

        def window(carry, z_win):
            x_p, x_plan, u_plan, warm = carry
            # manifold observer: x_hat = W_map(z - z_ref) of the measured
            # output (SSM/controllers.py:302-310)
            z_meas = m.x_to_zfyf(x_p)
            x_hat = m.compute_RO_state(z_meas)
            x_plan, u_plan, warm = self._mpc_query(x_hat, x_plan, u_plan,
                                                   z_win, warm)
            (x_p, _, _), (zs, us) = jax.lax.scan(
                tick, (x_p, x_plan, u_plan), jnp.arange(N_rep))
            return (x_p, x_plan, u_plan, warm), (zs, us)

        n_var, n_con = self._qp_dims()

        def run(x_plant0, z_target):
            """z_target: (n_windows, N+1, n_z) SHIFTED targets."""
            x_plan0 = jnp.tile(x_plant0[None], (N + 1, 1))
            u_plan0 = jnp.zeros((N, self.n_u), self.dtype)
            warm0 = (jnp.zeros(n_var, self.dtype),
                     jnp.zeros(n_con, self.dtype))
            carry0 = (x_plant0, x_plan0, u_plan0, warm0)
            _, (zs, us) = jax.lax.scan(window, carry0, z_target)
            return {"z": zs.reshape(-1, self.n_z),
                    "u": us.reshape(-1, self.n_u)}

        self._run = run
        return run

    def build_fused(self, n_windows: int, interpret=None):
        """Batch-fused SSM MPC: same semantics as run_batch, but each
        window's B LOCPs solve in one grid-batched Pallas launch (see
        BatchMPC.build_fused)."""
        from soft_robot_control_tpu.ops.pallas_admm import admm_batched_pallas

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        m = self.model
        N, N_rep, dt = self.N, self.N_replan, self.dt
        spec = self.spec
        n_var, n_con = self._qp_dims()

        def assemble_one(x0, x_k, u_k, z_w):
            Ad, Bd, dd, Hd, cd = self._lin_traj(x_k, u_k)
            params = LOCPParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0, xk=x_k,
                delta=jnp.asarray(1e4, self.dtype),
                omega=jnp.asarray(1.0, self.dtype),
                z=z_w, zf=jnp.zeros(self.n_z, self.dtype),
                u_des=jnp.zeros((self.N, self.n_u), self.dtype),
                Hd=Hd, cd=cd)
            return spec.assemble(params)

        def assemble_one_c(x0, x_k, u_k, z_w):
            Ad, Bd, dd, Hd, cd = self._lin_traj(x_k, u_k)
            return self.cspec.assemble(
                self._condensed_params(Ad, Bd, dd, Hd, cd, x0, z_w))

        def query_batched(x0, x_k, u_k, z_win, warm):
            B = x0.shape[0]
            x_k, u_k = self._shift_plan(x_k, u_k, axis=1)
            w0, y0 = warm
            if self.formulation == "condensed":
                P, q, A, l, u, _, xfree, G = jax.vmap(assemble_one_c)(
                    x0, x_k, u_k, z_win)
                Kinv = jax.vmap(
                    lambda P_, A_: make_kinv(P_, A_, self.rho_vec_c))(P, A)
                w, y = admm_batched_pallas(Kinv, A, q, l, u, self.rho_vec_c,
                                           w0, y0, self.qp_iters,
                                           interpret=interpret)
                u_plan = w.reshape(B, N, self.n_u)
                x_plan = jax.vmap(self.cspec.recover_x)(xfree, G, w)
                return x_plan, u_plan, (w, y)
            P, q, A, l, u, _ = jax.vmap(assemble_one)(x0, x_k, u_k, z_win)
            Kinv = jax.vmap(lambda P_, A_: make_kinv(P_, A_, self.rho_vec))(
                P, A)
            w, y = admm_batched_pallas(Kinv, A, q, l, u, self.rho_vec, w0, y0,
                                       self.qp_iters, interpret=interpret)
            x_plan = w[:, spec.off_x:spec.off_u].reshape(B, N + 1, self.n_x)
            u_plan = w[:, spec.off_u:spec.off_u + N * self.n_u].reshape(
                B, N, self.n_u)
            return x_plan, u_plan, (w, y)

        def tick(carry, k):
            x_p, x_plan, u_plan = carry
            u = u_plan[k]
            x_next = m.update_state(x_p, u, dt)
            z = m.x_to_zfyf(x_next)
            return (x_next, x_plan, u_plan), (z, u)

        def tick_scan(x_p, x_plan, u_plan):
            (x_p, _, _), (zs, us) = jax.lax.scan(
                tick, (x_p, x_plan, u_plan), jnp.arange(N_rep))
            return x_p, (zs, us)

        def window_b(carry, z_win):
            x_p, x_plan, u_plan, warm = carry
            z_meas = jax.vmap(m.x_to_zfyf)(x_p)
            x_hat = jax.vmap(m.compute_RO_state)(z_meas)
            x_plan, u_plan, warm = query_batched(x_hat, x_plan, u_plan,
                                                 z_win, warm)
            x_p, (zs, us) = jax.vmap(tick_scan)(x_p, x_plan, u_plan)
            return (x_p, x_plan, u_plan, warm), (zs, us)

        def run(x_plant0, z_target):
            B = x_plant0.shape[0]
            x_plan0 = jnp.tile(x_plant0[:, None], (1, N + 1, 1))
            u_plan0 = jnp.zeros((B, N, self.n_u), self.dtype)
            warm0 = (jnp.zeros((B, n_var), self.dtype),
                     jnp.zeros((B, n_con), self.dtype))
            carry0 = (x_plant0, x_plan0, u_plan0, warm0)
            _, (zs, us) = jax.lax.scan(window_b, carry0,
                                       jnp.swapaxes(z_target, 0, 1))
            fix = lambda a: jnp.swapaxes(a, 0, 1).reshape(B, -1, a.shape[-1])
            return {"z": fix(zs), "u": fix(us)}

        self._run_fused = jax.jit(run)
        return self._run_fused

    def run_batch(self, x_plant0, z_target):
        if self._run is None:
            raise RuntimeError("call build() first")
        return jax.jit(jax.vmap(self._run))(x_plant0, z_target)


def window_targets(z_traj, n_windows: int, N_replan: int, N: int):
    """Slice a long target trajectory (T, n_z) into per-window solver targets
    (n_windows, N+1, n_z): window w starts at w*N_replan."""
    z_traj = np.asarray(z_traj)
    out = np.zeros((n_windows, N + 1, z_traj.shape[1]), dtype=z_traj.dtype)
    T = z_traj.shape[0]
    for w in range(n_windows):
        idx = np.clip(np.arange(w * N_replan, w * N_replan + N + 1), 0, T - 1)
        out[w] = z_traj[idx]
    return out
