"""Device-resident GuSTO: the trust-region SCP loop under `lax.while_loop`.

The host GuSTO (scp/gusto.py) mirrors the reference's data-dependent Python
loop. This variant runs the *entire* solve on device — linearization,
LOCP assembly, fixed-iteration ADMM, trust-region accept/reject, delta and
omega schedules, convergence test — as one compiled while_loop, so complete
GuSTO solves can be jitted, vmapped over batches of initial conditions /
targets, and embedded inside larger device programs.

Semantics follow gusto.py:283-488 (and the reference's modifications 1 and
3) with where-based acceptance instead of Python branches:
- reject when the solution leaves the scaled trust region -> omega grows;
- reject when the Taylor-accuracy ratio rho_k exceeds rho (except on
  iteration 1, the reference's nudge) -> delta shrinks;
- modification 1: accepted solve with unchanged (delta, omega) but
  non-decreasing cost -> delta shrinks;
- modification 3: state-constraint violation only ever grows omega;
- converged when the scaled mean state change falls under convg_thresh
  (and X is satisfied).
"""

from __future__ import annotations

from functools import partial  # noqa: F401 (kept for symmetry)
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.control.batch_mpc import (admm_fixed,
                                                       admm_fixed_kinv,
                                                       admm_staged_kinv,
                                                       equilibrate_qp,
                                                       make_kinv)
from soft_robot_control_tpu.scp.gusto import (BETA_FAIL, CONVERGE, DELTA0,
                                              EPSILON, GAMMA_FAIL, OMEGA0,
                                              OMEGA_MAX, RHO)
from soft_robot_control_tpu.scp.locp import LOCPParams, LOCPSpec


class GuSTOJitResult(NamedTuple):
    x: jnp.ndarray          # (N+1, n_x)
    u: jnp.ndarray          # (N, n_u)
    iters: jnp.ndarray      # SCP iterations executed
    converged: jnp.ndarray  # bool
    J: jnp.ndarray          # last accepted QP objective


class GuSTOJit:
    """Factory: compiles a full GuSTO solve for a fixed problem structure.

    model: a GuSTO adapter whose get_discrete_dynamics /
    get_continuous_dynamics are jax-traceable (TPWL, SSM, Dubins).
    """

    def __init__(self, model, N, dt, Qz, R, U=None, dU=None, X=None,
                 x_char=None, f_char=None, max_iters: int = 20,
                 qp_iters: int = 100, rho_qp: float = 0.1,
                 delta0=DELTA0, omega0=OMEGA0, rho=RHO,
                 beta_fail=BETA_FAIL, gamma_fail=GAMMA_FAIL,
                 omega_max=OMEGA_MAX, epsilon=EPSILON,
                 convg_thresh=CONVERGE, x_step: str = "chol",
                 formulation: str = "sparse", dtype=jnp.float64,
                 qp_stages: int = 2, scaling_iters: int = 6,
                 accept_pri=None, accept_dua=None):
        self.model = model
        self.N = int(N)
        self.dt = float(dt)
        self.dtype = dtype
        self.max_iters = int(max_iters)
        self.qp_iters = int(qp_iters)
        self.x_step = x_step
        self.p = dict(delta0=delta0, omega0=omega0, rho=rho,
                      beta_fail=beta_fail, gamma_fail=gamma_fail,
                      omega_max=omega_max, epsilon=epsilon,
                      convg_thresh=convg_thresh)
        self.n_x, self.n_u = model.n_x, model.n_u
        self.n_z = np.asarray(Qz).shape[0]
        self.X = X
        # QP acceptance: relative KKT residual thresholds for the condensed
        # fixed-iteration ADMM (the host loop gets this gate from
        # locp.solve()'s success flag; without it a stalled ADMM solution
        # sails through the TR tests — for a piecewise-linear model the
        # Taylor-accuracy ratio rho_k is ~0 by construction and delta0=1e4
        # never binds, so an unsolved QP is "accepted and converged").
        # Observed on the trunk campaign (N=50, 8 cables, f32): unequili-
        # brated rho=0.1 ADMM returns plans 48-108 mm off a +-10 mm target
        # that the loop declares converged in 1-3 iterations.
        self.qp_stages = max(1, int(qp_stages))
        self.scaling_iters = int(scaling_iters)
        if accept_pri is None:
            accept_pri = 1e-3 if dtype == jnp.float32 else 1e-5
        if accept_dua is None:
            accept_dua = 1e-2 if dtype == jnp.float32 else 1e-4
        self.accept_pri = float(accept_pri)
        self.accept_dua = float(accept_dua)
        self.spec = LOCPSpec(self.N, np.asarray(model.H), np.asarray(Qz),
                             np.asarray(R), U=U, dU=dU, X=X, x_char=x_char,
                             is_tr_active=True, dtype=dtype)
        x_char = np.ones(self.n_x) if x_char is None else np.asarray(x_char)
        f_char = np.ones(self.n_x) if f_char is None else np.asarray(f_char)
        self.x_scale = jnp.asarray(1.0 / np.abs(x_char), dtype)
        self.f_scale = jnp.asarray(1.0 / np.abs(f_char), dtype)

        from soft_robot_control_tpu.qp.admm import OSQP_RHO_EQ_SCALE

        rho_vec = np.full(self.spec.n_con, rho_qp)
        nx, N_ = self.spec.n_x, self.spec.N
        rho_vec[self.spec.r_init:self.spec.r_init + nx] *= OSQP_RHO_EQ_SCALE
        rho_vec[self.spec.r_dyn:self.spec.r_dyn + N_ * nx] *= OSQP_RHO_EQ_SCALE
        self.rho_vec = jnp.asarray(rho_vec, dtype)

        # condensed formulation: states eliminated, trust region as affine
        # rows with one slack (scp/locp_condensed.py) — same optimum,
        # (N*nu+1)^2 KKT
        self.formulation = formulation
        if formulation == "condensed":
            from soft_robot_control_tpu.scp.locp_condensed import CondensedSpec

            self.cspec = CondensedSpec(
                self.N, np.asarray(model.H), np.asarray(Qz), np.asarray(R),
                U=U, dU=dU, X=X, trust_region=True, x_char=x_char,
                dtype=dtype)
            self.rho_vec_c = jnp.full(self.cspec.n_con, rho_qp, dtype)
        elif formulation != "sparse":
            raise ValueError(f"unknown formulation {formulation!r}")

        self._solve_fn_inner = self._build()
        self._solve = jax.jit(self._solve_fn_inner)

    # ------------------------------------------------------------------
    def _build(self):
        model, spec, dt = self.model, self.spec, self.dt
        N, n_x, n_u, n_z = self.N, self.n_x, self.n_u, self.n_z
        p = {k: jnp.asarray(v, self.dtype) for k, v in self.p.items()}
        max_iters, qp_iters = self.max_iters, self.qp_iters
        x_scale, f_scale = self.x_scale, self.f_scale
        rho_vec = self.rho_vec
        X_set = self.X

        lin_d = jax.vmap(lambda x, u_: model.get_discrete_dynamics(x, u_, dt))
        lin_c = jax.vmap(model.get_continuous_dynamics)

        acc_pri = jnp.asarray(self.accept_pri, self.dtype)
        acc_dua = jnp.asarray(self.accept_dua, self.dtype)
        hi = jax.lax.Precision.HIGHEST

        def qp(x_k, u_k, x0, z, u_des, delta, omega, warm):
            # cast: model adapters may linearize in f64 (e.g. under x64 on
            # CPU) — without this the while_loop carry upcasts and tracing
            # fails with a carry-type mismatch
            Ad, Bd, dd = (a.astype(self.dtype)
                          for a in lin_d(x_k[:-1], u_k))
            if self.formulation == "condensed":
                from soft_robot_control_tpu.scp.locp_condensed import CondensedParams

                cp = CondensedParams(
                    Ad=Ad, Bd=Bd, dd=dd, x0=x0, z=z, u_des=u_des,
                    Hd=jnp.zeros((N + 1, n_z, n_x), self.dtype),
                    cd=jnp.zeros((N + 1, n_z), self.dtype),
                    xk=x_k, delta=delta, omega=omega)
                P, q, A, l, u_b, const, xfree, G = self.cspec.assemble(cp)
                # Ruiz equilibration + staged rho rebalancing: the raw
                # condensed rows mix G-chain output scales with mN input
                # bounds (~1e4 apart) and no single rho converges both
                # residuals — the same fix that took the batched MPC's rel
                # tracking error 0.45 -> 0.0105 (control/batch_mpc.py
                # equilibrate_qp docstring)
                Ps, qs, As, ls, us, w0s, y0s, (dv, ev, cc) = equilibrate_qp(
                    P, q, A, l, u_b, warm[0], warm[1],
                    iters=self.scaling_iters)
                ws, ys = admm_staged_kinv(Ps, qs, As, ls, us, w0s, y0s,
                                          self.rho_vec_c, qp_iters,
                                          stages=self.qp_stages)
                w = dv * ws
                y = ev * ys / cc
                # relative KKT residuals in the original space -> qp_ok
                Ax = jnp.matmul(A, w, precision=hi)
                zz = jnp.clip(Ax, l, u_b)
                pri = jnp.max(jnp.abs(Ax - zz))
                pri_sc = jnp.maximum(jnp.maximum(
                    jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(zz))), 1.0)
                Pw = jnp.matmul(P, w, precision=hi)
                Aty = jnp.matmul(A.T, y, precision=hi)
                # stationarity gated on the CONTROL block only: the TR
                # slack's dual (one epigraph variable shared by 2*N*nx rows)
                # converges an order slower than the controls and its error
                # only mis-prices the slack, not the plan
                dua = jnp.max(jnp.abs((Pw + q + Aty)[:N * n_u]))
                dua_sc = jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(Pw)), jnp.max(jnp.abs(Aty))),
                    jnp.maximum(jnp.max(jnp.abs(q)), 1.0))
                qp_ok = (pri < acc_pri * pri_sc) & (dua < acc_dua * dua_sc) \
                    & jnp.isfinite(pri) & jnp.isfinite(dua)
                u_n = w[:N * n_u].reshape(N, n_u)
                x_n = self.cspec.recover_x(xfree, G, w)
                J = 0.5 * w @ (P @ w) + q @ w + const
                return x_n, u_n, J, (w, y), qp_ok
            params = LOCPParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0, xk=x_k, delta=delta, omega=omega,
                z=z, zf=jnp.zeros(n_z, self.dtype), u_des=u_des,
                Hd=jnp.zeros((N + 1, n_z, n_x), self.dtype),
                cd=jnp.zeros((N + 1, n_z), self.dtype))
            P, q, A, l, u_b, const = spec.assemble(params)
            if self.x_step == "kinv":
                Kinv = make_kinv(P, A, rho_vec)
                w, y = admm_fixed_kinv(Kinv, q, A, l, u_b, warm[0], warm[1],
                                       rho_vec, qp_iters)
            else:
                w, y = admm_fixed(P, q, A, l, u_b, warm[0], warm[1], rho_vec,
                                  qp_iters)
            x_n = w[spec.off_x:spec.off_u].reshape(N + 1, n_x)
            u_n = w[spec.off_u:spec.off_u + N * n_u].reshape(N, n_u)
            J = 0.5 * w @ (P @ w) + q @ w + const
            return x_n, u_n, J, (w, y), jnp.asarray(True)

        def accuracy(x_n, u_n, x_k, u_k, J):
            f_new, _, _ = lin_c(x_n[:-1], u_n)
            fk, Ak, Bk = lin_c(x_k[:-1], u_k)
            f_lin = fk + jnp.einsum("kij,kj->ki", Ak, x_n[:-1] - x_k[:-1]) \
                + jnp.einsum("kij,kj->ki", Bk, u_n - u_k)
            err = dt * jnp.sum(jnp.linalg.norm(f_scale * (f_new - f_lin), axis=1))
            approx = dt * jnp.sum(jnp.linalg.norm(f_scale * f_lin, axis=1))
            return err / (J + approx)

        def solve(x0, u_init, x_init, z, u_des):
            z = z.astype(self.dtype)
            u_des = u_des.astype(self.dtype)

            def cond(c):
                (x_k, u_k, delta, omega, Jp, dp, op, itr, conv, warm, J) = c
                return (itr < max_iters) & (~conv) & (omega <= p["omega_max"])

            def body(c):
                (x_k, u_k, delta, omega, Jp, dp, op, itr, conv, warm,
                 J_last) = c
                x_n, u_n, J, warm_n, qp_ok = qp(x_k, u_k, x0, z, u_des,
                                                delta, omega, warm)
                # trust region (scaled max row inf-norm)
                max_diff = jnp.max(jnp.max(jnp.abs(x_scale * (x_n - x_k)),
                                           axis=1))
                tr_ok = (max_diff - delta) <= p["epsilon"]
                rho_k = accuracy(x_n, u_n, x_k, u_k, J)
                rho_bad = (rho_k > p["rho"]) & (itr != 1)
                # modification 1
                mod1 = (dp == delta) & (op == omega) & (Jp <= J)
                # state-constraint violation (modification 3: omega only grows)
                if X_set is not None:
                    viol = jnp.max(X_set.violation(x_n[1:]))
                    X_ok = viol <= p["epsilon"]
                else:
                    X_ok = jnp.asarray(True)
                # a QP that misses the residual gates is NOT a valid SCP
                # step (the host loop gets this from locp.solve()'s success
                # flag; the TR tests cannot police a stalled ADMM result —
                # rho_k ~ 0 for PWL models and delta0=1e4 never binds).
                # Instead of aborting like the host, carry the ADMM state
                # and leave (x_k, delta, omega) untouched: the next TR
                # iteration re-solves the SAME QP warm-started where this
                # one stopped, i.e. the iteration budget extends until the
                # gate passes or max_iters runs out.
                accept = tr_ok & ~rho_bad & qp_ok
                # schedules (frozen while the QP is unsolved)
                delta_new = jnp.where(
                    tr_ok & rho_bad & qp_ok, p["beta_fail"] * delta,
                    jnp.where(accept & mod1, p["beta_fail"] * delta, delta))
                omega_new = jnp.where(~tr_ok & qp_ok, p["gamma_fail"] * omega,
                                      jnp.where(accept & ~X_ok,
                                                p["gamma_fail"] * omega,
                                                omega))
                # convergence on accepted solutions
                dsol = jnp.sum(jnp.linalg.norm(x_scale * (x_n - x_k), axis=1)) \
                    / (self.n_x * N)
                conv_new = accept & (dsol <= p["convg_thresh"]) & X_ok
                # bookkeeping of previous accepted (delta, omega, J)
                dp_new = jnp.where(accept, delta, dp)
                op_new = jnp.where(accept, omega, op)
                Jp_new = jnp.where(accept, J, Jp)
                x_k = jnp.where(accept, x_n, x_k)
                u_k = jnp.where(accept, u_n, u_k)
                carry_warm = accept | ~qp_ok
                warm = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(carry_warm, a, b), warm_n, warm)
                return (x_k, u_k, delta_new, omega_new, Jp_new, dp_new,
                        op_new, itr + 1, conv_new, warm,
                        jnp.where(accept, J, J_last))

            inf = jnp.asarray(jnp.inf, self.dtype)
            nv, nc = ((self.cspec.n_var, self.cspec.n_con)
                      if self.formulation == "condensed"
                      else (spec.n_var, spec.n_con))
            warm0 = (jnp.zeros(nv, self.dtype), jnp.zeros(nc, self.dtype))
            c0 = (x_init.astype(self.dtype), u_init.astype(self.dtype),
                  p["delta0"], p["omega0"], inf, inf, inf,
                  jnp.asarray(0), jnp.asarray(False), warm0, inf)
            c = jax.lax.while_loop(cond, body, c0)
            (x_k, u_k, *_rest) = c
            return GuSTOJitResult(x=x_k, u=u_k, iters=c[7], converged=c[8],
                                  J=c[10])

        def solve_pinned(*args):
            # TPU f32 matmuls default to bf16 passes; the condensed QP
            # assembly / KKT factorization / linearization rollouts here are
            # exactly the ops that stalled ADMM on the trunk's N=50 x
            # 8-cable LOCP until pinned (see STATUS r3 and the same pin
            # inside admm_fixed_kinv). Trunk campaign on device, unpinned:
            # "converged" plans 42-119 mm off a +-12 mm target; pinned on
            # CPU the identical solves stay within 13 mm.
            with jax.default_matmul_precision("highest"):
                return solve(*args)

        return solve_pinned

    # ------------------------------------------------------------------
    def solve(self, x0, u_init, x_init, z, u_des=None):
        """One full GuSTO solve on device. z: (N+1, n_z); u_des: (N, n_u)."""
        u_des = (jnp.zeros((self.N, self.n_u), self.dtype)
                 if u_des is None else jnp.asarray(u_des, self.dtype))
        return self._solve(jnp.asarray(x0, self.dtype),
                           jnp.asarray(u_init, self.dtype),
                           jnp.asarray(x_init, self.dtype),
                           jnp.asarray(z, self.dtype), u_des)

    def solve_packed(self, x0, u_init, x_init, z, u_des=None):
        """solve() with the result flattened ON DEVICE into one vector
        [x.ravel | u.ravel | iters, converged, J], so the host pays ONE
        download instead of five. On the tunneled dev TPU each blocking
        fetch costs ~an RTT (~25 ms); five fetches dominated the 104 ms
        device-TR MPC solves in the trunk campaign. Layout is unpacked by
        GuSTO._solve_device_tr."""
        if not hasattr(self, "_solve_packed"):
            def packed(*args):
                r = self._solve_fn_inner(*args)
                tail = jnp.stack([r.iters.astype(self.dtype),
                                  r.converged.astype(self.dtype), r.J])
                return jnp.concatenate([r.x.reshape(-1), r.u.reshape(-1),
                                        tail])
            self._solve_packed = jax.jit(packed)
        u_des = (jnp.zeros((self.N, self.n_u), self.dtype)
                 if u_des is None else jnp.asarray(u_des, self.dtype))
        return self._solve_packed(jnp.asarray(x0, self.dtype),
                                  jnp.asarray(u_init, self.dtype),
                                  jnp.asarray(x_init, self.dtype),
                                  jnp.asarray(z, self.dtype), u_des)

    def solve_batch(self, x0, u_init, x_init, z, u_des=None):
        """vmapped GuSTO over a batch of problems (leading axis on all)."""
        if u_des is None:
            u_des = jnp.zeros((x0.shape[0], self.N, self.n_u), self.dtype)
        return jax.jit(jax.vmap(self._solve))(
            jnp.asarray(x0, self.dtype), jnp.asarray(u_init, self.dtype),
            jnp.asarray(x_init, self.dtype), jnp.asarray(z, self.dtype),
            jnp.asarray(u_des, self.dtype))

    # ------------------------------------------------------------------
    def _build_fused(self, interpret: bool):
        """Batch-synchronous GuSTO: lockstep fori_loop over max_iters where
        every SCP iteration solves ALL B LOCPs in one grid-batched Pallas
        launch (ops/pallas_admm.py). Per-element accept/convergence state is
        carried in masks, so results match vmap(while_loop) exactly —
        batched while_loop runs elements in lockstep with frozen carries
        anyway, this version just makes the iteration structure explicit
        and swaps the HBM-bound batched XLA ADMM for the VMEM kernel."""
        from soft_robot_control_tpu.ops.pallas_admm import admm_batched_pallas

        model, spec, dt = self.model, self.spec, self.dt
        N, n_x, n_u, n_z = self.N, self.n_x, self.n_u, self.n_z
        p = {k: jnp.asarray(v, self.dtype) for k, v in self.p.items()}
        max_iters, qp_iters = self.max_iters, self.qp_iters
        x_scale, f_scale = self.x_scale, self.f_scale
        rho_vec = self.rho_vec
        X_set = self.X

        lin_d = jax.vmap(lambda x, u_: model.get_discrete_dynamics(x, u_, dt))
        lin_c = jax.vmap(model.get_continuous_dynamics)

        def assemble_one(x_k, u_k, x0, z, u_des, delta, omega):
            Ad, Bd, dd = (a.astype(self.dtype)
                          for a in lin_d(x_k[:-1], u_k))
            params = LOCPParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0, xk=x_k, delta=delta, omega=omega,
                z=z, zf=jnp.zeros(n_z, self.dtype), u_des=u_des,
                Hd=jnp.zeros((N + 1, n_z, n_x), self.dtype),
                cd=jnp.zeros((N + 1, n_z), self.dtype))
            return spec.assemble(params)

        def assemble_one_c(x_k, u_k, x0, z, u_des, delta, omega):
            from soft_robot_control_tpu.scp.locp_condensed import CondensedParams

            Ad, Bd, dd = (a.astype(self.dtype)
                          for a in lin_d(x_k[:-1], u_k))
            cp = CondensedParams(
                Ad=Ad, Bd=Bd, dd=dd, x0=x0, z=z, u_des=u_des,
                Hd=jnp.zeros((N + 1, n_z, n_x), self.dtype),
                cd=jnp.zeros((N + 1, n_z), self.dtype),
                xk=x_k, delta=delta, omega=omega)
            return self.cspec.assemble(cp)

        def qp_b(x_k, u_k, x0, z, u_des, delta, omega, warm):
            B = x_k.shape[0]
            if self.formulation == "condensed":
                P, q, A, l, u_b, const, xfree, G = jax.vmap(assemble_one_c)(
                    x_k, u_k, x0, z, u_des, delta, omega)
                Kinv = jax.vmap(
                    lambda P_, A_: make_kinv(P_, A_, self.rho_vec_c))(P, A)
                w, y = admm_batched_pallas(Kinv, A, q, l, u_b,
                                           self.rho_vec_c, warm[0], warm[1],
                                           qp_iters, interpret=interpret)
                u_n = w[:, :N * n_u].reshape(B, N, n_u)
                x_n = jax.vmap(self.cspec.recover_x)(xfree, G, w)
                J = 0.5 * jnp.einsum("bi,bij,bj->b", w, P, w) \
                    + jnp.einsum("bi,bi->b", q, w) + const
                return x_n, u_n, J, (w, y)
            P, q, A, l, u_b, const = jax.vmap(assemble_one)(
                x_k, u_k, x0, z, u_des, delta, omega)
            Kinv = jax.vmap(lambda P_, A_: make_kinv(P_, A_, rho_vec))(P, A)
            w, y = admm_batched_pallas(Kinv, A, q, l, u_b, rho_vec,
                                       warm[0], warm[1], qp_iters,
                                       interpret=interpret)
            x_n = w[:, spec.off_x:spec.off_u].reshape(B, N + 1, n_x)
            u_n = w[:, spec.off_u:spec.off_u + N * n_u].reshape(B, N, n_u)
            J = 0.5 * jnp.einsum("bi,bij,bj->b", w, P, w) \
                + jnp.einsum("bi,bi->b", q, w) + const
            return x_n, u_n, J, (w, y)

        def accuracy_b(x_n, u_n, x_k, u_k, J):
            f_new, _, _ = jax.vmap(lin_c)(x_n[:, :-1], u_n)
            fk, Ak, Bk = jax.vmap(lin_c)(x_k[:, :-1], u_k)
            f_lin = fk + jnp.einsum("bkij,bkj->bki", Ak,
                                    x_n[:, :-1] - x_k[:, :-1]) \
                + jnp.einsum("bkij,bkj->bki", Bk, u_n - u_k)
            err = dt * jnp.sum(
                jnp.linalg.norm(f_scale * (f_new - f_lin), axis=2), axis=1)
            approx = dt * jnp.sum(
                jnp.linalg.norm(f_scale * f_lin, axis=2), axis=1)
            return err / (J + approx)

        def solve(x0, u_init, x_init, z, u_des):
            B = x0.shape[0]
            z = z.astype(self.dtype)
            u_des = u_des.astype(self.dtype)

            def body(_, c):
                (x_k, u_k, delta, omega, Jp, dp, op, itr, conv, warm,
                 J_last) = c
                active = (~conv) & (omega <= p["omega_max"]) \
                    & (itr < max_iters)
                x_n, u_n, J, warm_n = qp_b(x_k, u_k, x0, z, u_des, delta,
                                           omega, warm)
                max_diff = jnp.max(jnp.max(
                    jnp.abs(x_scale * (x_n - x_k)), axis=2), axis=1)
                tr_ok = (max_diff - delta) <= p["epsilon"]
                rho_k = accuracy_b(x_n, u_n, x_k, u_k, J)
                rho_bad = (rho_k > p["rho"]) & (itr != 1)
                mod1 = (dp == delta) & (op == omega) & (Jp <= J)
                if X_set is not None:
                    viol = jax.vmap(
                        lambda xs: jnp.max(X_set.violation(xs)))(x_n[:, 1:])
                    X_ok = viol <= p["epsilon"]
                else:
                    X_ok = jnp.ones(B, bool)
                accept = active & tr_ok & ~rho_bad
                delta_new = jnp.where(
                    active & tr_ok & rho_bad, p["beta_fail"] * delta,
                    jnp.where(accept & mod1, p["beta_fail"] * delta, delta))
                omega_new = jnp.where(
                    active & ~tr_ok, p["gamma_fail"] * omega,
                    jnp.where(accept & ~X_ok, p["gamma_fail"] * omega, omega))
                dsol = jnp.sum(jnp.linalg.norm(
                    x_scale * (x_n - x_k), axis=2), axis=1) / (self.n_x * N)
                conv_new = jnp.where(
                    active, accept & (dsol <= p["convg_thresh"]) & X_ok, conv)
                dp_new = jnp.where(accept, delta, dp)
                op_new = jnp.where(accept, omega, op)
                Jp_new = jnp.where(accept, J, Jp)
                sel = lambda m, a, b: jnp.where(
                    m.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
                x_k = sel(accept, x_n, x_k)
                u_k = sel(accept, u_n, u_k)
                warm = jax.tree_util.tree_map(
                    lambda a, b: sel(accept, a, b), warm_n, warm)
                return (x_k, u_k, delta_new, omega_new, Jp_new, dp_new,
                        op_new, itr + active.astype(itr.dtype), conv_new,
                        warm, jnp.where(accept, J, J_last))

            inf = jnp.full(B, jnp.inf, self.dtype)
            nv, nc = ((self.cspec.n_var, self.cspec.n_con)
                      if self.formulation == "condensed"
                      else (spec.n_var, spec.n_con))
            warm0 = (jnp.zeros((B, nv), self.dtype),
                     jnp.zeros((B, nc), self.dtype))
            c0 = (x_init.astype(self.dtype), u_init.astype(self.dtype),
                  jnp.full(B, p["delta0"], self.dtype),
                  jnp.full(B, p["omega0"], self.dtype), inf, inf, inf,
                  jnp.zeros(B, jnp.int32), jnp.zeros(B, bool), warm0, inf)
            c = jax.lax.fori_loop(0, max_iters, body, c0)
            return GuSTOJitResult(x=c[0], u=c[1], iters=c[7], converged=c[8],
                                  J=c[10])

        return solve

    def solve_batch_fused(self, x0, u_init, x_init, z, u_des=None,
                          interpret=None):
        """Batch GuSTO with the grid-batched Pallas LOCP launch (see
        _build_fused); same results as solve_batch, higher TPU throughput."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if getattr(self, "_solve_fused_interp", None) != interpret:
            self._solve_fused = jax.jit(self._build_fused(interpret))
            self._solve_fused_interp = interpret
        if u_des is None:
            u_des = jnp.zeros((x0.shape[0], self.N, self.n_u), self.dtype)
        return self._solve_fused(
            jnp.asarray(x0, self.dtype), jnp.asarray(u_init, self.dtype),
            jnp.asarray(x_init, self.dtype), jnp.asarray(z, self.dtype),
            jnp.asarray(u_des, self.dtype))
