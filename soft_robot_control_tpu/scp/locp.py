"""LOCP — the convex subproblem of GuSTO, assembled directly as a QP.

Capability parity with sofacontrol/scp/locp.py, which builds the problem in
cvxpy and ships it to an external OSQP/Gurobi process. Here the fixed
structure is exploited: the QP matrices (P, q, A, l, u) are assembled with
vectorized jnp scatters from a precomputed static template and solved by the
in-repo ADMM kernel — fully jittable, warm-startable, vmappable.

Decision variables  w = [x_0..x_N | u_0..u_{N-1} | s_0..s_N]:
objective (cvxpy-convention, no 1/2 factor — matching locp.py:218-263)

    J = sum_k (u_k - u_des_k)' R (u_k - u_des_k)
      + sum_k (H_k x_k + c_k - z_k)' Qz (H_k x_k + c_k - z_k)
      + (H_N x_N + c_N - zf)' Qzf (...)          [terminal, optional]
      + omega * sum_k s_k                        [trust-region slack]
      + ||Nu u||^2                               [nullspace penalty, optional]

constraints
    x_{k+1} = A_k x_k + B_k u_k + d_k            (equalities)
    x_0 = x0
    |x_scale ∘ (x_k - xbar_k)|_inf <= delta + s_k,  s_k >= 0
    U.A u_k <= U.b;   dU.A (u_{k+1} - u_k) <= dU.b
    X.A (H_k x_k + c_k) <= X.b  for k=1..N;   Xf.A x_N <= Xf.b

Deviations from the reference, documented:
- the input-nullspace term is a quadratic penalty ||Nu u||^2 rather than the
  reference's cp.norm2 (locp.py:259-261), which is not QP-representable;
- the terminal cost uses the time-varying H_N, c_N in the nonlinear-observer
  case (the reference reuses the constant H there, locp.py:251-252, which is
  the all-zeros placeholder for SSM models — i.e. a no-op);
- the reference's x-index slip in the terminal/state constraint rows
  (locp.py:252,329 uses n_z where n_x is meant) is implemented as intended.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.qp.admm import solve_qp_dense


class LOCPParams(NamedTuple):
    """Per-solve (traced) data."""
    Ad: jnp.ndarray            # (N, nx, nx)
    Bd: jnp.ndarray            # (N, nx, nu)
    dd: jnp.ndarray            # (N, nx)
    x0: jnp.ndarray            # (nx,)
    xk: jnp.ndarray            # (N+1, nx) previous iterate (trust region center)
    delta: jnp.ndarray         # scalar trust region radius
    omega: jnp.ndarray         # scalar slack weight
    z: jnp.ndarray             # (N+1, nz) tracking target (zeros if None)
    zf: jnp.ndarray            # (nz,) terminal target (zeros if None)
    u_des: jnp.ndarray         # (N, nu) input target (zeros if None)
    Hd: Optional[jnp.ndarray]  # (N+1, nz, nx) observer linearizations or None
    cd: Optional[jnp.ndarray]  # (N+1, nz) observer offsets or None


class LOCPSpec:
    """Static problem structure: dimensions, costs, constraint sets.

    Mirrors the constructor arguments of the reference LOCP (locp.py:26-96).
    """

    def __init__(self, N, H, Qz, R, Qzf=None, U=None, X=None, Xf=None, dU=None,
                 x_char=None, nonlinear_observer=False, is_tr_active=True,
                 input_nullspace=None, dtype=jnp.float64):
        self.N = int(N)
        self.H = np.asarray(H, dtype=np.float64)
        self.Qz = np.asarray(Qz, dtype=np.float64)
        self.R = np.asarray(R, dtype=np.float64)
        self.Qzf = None if Qzf is None else np.asarray(Qzf, dtype=np.float64)
        self.U, self.X, self.Xf, self.dU = U, X, Xf, dU
        self.nonlinear_observer = bool(nonlinear_observer)
        self.tr_active = bool(is_tr_active)
        self.input_nullspace = (None if input_nullspace is None
                                else np.asarray(input_nullspace, dtype=np.float64))
        self.dtype = dtype

        self.n_x = self.H.shape[1]
        self.n_z = self.Qz.shape[0]
        self.n_u = self.R.shape[0]
        if x_char is None:
            self.x_scale = np.ones(self.n_x)
        else:
            self.x_scale = 1.0 / np.abs(np.asarray(x_char, dtype=np.float64))

        N, nx, nu = self.N, self.n_x, self.n_u
        # variable layout
        self.off_x = 0
        self.off_u = (N + 1) * nx
        self.off_s = self.off_u + N * nu
        self.n_var = self.off_s + ((N + 1) if self.tr_active else 0)

        # constraint row layout
        rows = 0
        self.r_init = rows
        rows += nx
        self.r_dyn = rows
        rows += N * nx
        if self.tr_active:
            self.r_tr = rows
            rows += 2 * nx * (N + 1)
            self.r_s = rows
            rows += N + 1
        if self.U is not None:
            self.r_U = rows
            rows += N * np.asarray(self.U.A).shape[0]
        if self.dU is not None:
            self.r_dU = rows
            rows += (N - 1) * np.asarray(self.dU.A).shape[0]
        if self.X is not None:
            self.r_X = rows
            rows += N * np.asarray(self.X.A).shape[0]
        if self.Xf is not None:
            self.r_Xf = rows
            rows += np.asarray(self.Xf.A).shape[0]
        self.n_con = rows

        self._build_static()

    # ------------------------------------------------------------------
    def _build_static(self):
        """Precompute the parameter-independent parts of (P, A, l, u)."""
        N, nx, nu, nz = self.N, self.n_x, self.n_u, self.n_z
        nv, nc = self.n_var, self.n_con

        # ---- P template (cvxpy-convention quad forms => factor 2 in 0.5 w'Pw)
        P = np.zeros((nv, nv))
        for k in range(N):
            i = self.off_u + k * nu
            P[i:i + nu, i:i + nu] = 2.0 * self.R
        if not self.nonlinear_observer:
            HQH = 2.0 * self.H.T @ self.Qz @ self.H
            for k in range(N + 1):
                i = k * nx
                P[i:i + nx, i:i + nx] += HQH
            if self.Qzf is not None:
                i = N * nx
                P[i:i + nx, i:i + nx] += 2.0 * self.H.T @ self.Qzf @ self.H
        if self.input_nullspace is not None:
            Nu = self.input_nullspace  # (r, nu) applied per step (tiled)
            NtN = 2.0 * Nu.T @ Nu
            for k in range(N):
                i = self.off_u + k * nu
                P[i:i + nu, i:i + nu] += NtN
        self._P_static = P

        # ---- A template + (l, u) static pieces
        A = np.zeros((nc, nv))
        l = np.full(nc, -np.inf)
        u = np.full(nc, np.inf)

        # initial condition rows: x_0 = x0 (bounds set per-solve)
        A[self.r_init:self.r_init + nx, 0:nx] = np.eye(nx)

        # dynamics rows: x_{k+1} - A_k x_k - B_k u_k = d_k
        # the +I on x_{k+1} is static; A_k, B_k are scattered per-solve
        for k in range(N):
            r = self.r_dyn + k * nx
            A[r:r + nx, (k + 1) * nx:(k + 2) * nx] = np.eye(nx)

        if self.tr_active:
            # trust region: +/- x_scale*(x_k - xbar_k) - s_k <= delta
            for k in range(N + 1):
                r = self.r_tr + 2 * nx * k
                A[r:r + nx, k * nx:(k + 1) * nx] = np.diag(self.x_scale)
                A[r:r + nx, self.off_s + k] = -1.0
                A[r + nx:r + 2 * nx, k * nx:(k + 1) * nx] = -np.diag(self.x_scale)
                A[r + nx:r + 2 * nx, self.off_s + k] = -1.0
            # slack positivity s_k >= 0
            for k in range(N + 1):
                A[self.r_s + k, self.off_s + k] = 1.0
                l[self.r_s + k] = 0.0

        if self.U is not None:
            UA, Ub = np.asarray(self.U.A), np.asarray(self.U.b)
            mU = UA.shape[0]
            for k in range(N):
                r = self.r_U + k * mU
                A[r:r + mU, self.off_u + k * nu:self.off_u + (k + 1) * nu] = UA
                u[r:r + mU] = Ub

        if self.dU is not None:
            dA, db = np.asarray(self.dU.A), np.asarray(self.dU.b)
            mdU = dA.shape[0]
            for k in range(N - 1):
                r = self.r_dU + k * mdU
                A[r:r + mdU, self.off_u + (k + 1) * nu:self.off_u + (k + 2) * nu] = dA
                A[r:r + mdU, self.off_u + k * nu:self.off_u + (k + 1) * nu] = -dA
                u[r:r + mdU] = db

        if self.X is not None and not self.nonlinear_observer:
            # linear case: X is a polytope on the STATE x_k for k=1..N
            # (locp.py:331-333); only the nonlinear-observer case routes the
            # constraint through the output linearization
            XA, Xb = np.asarray(self.X.A), np.asarray(self.X.b)
            mX = XA.shape[0]
            for k in range(N):
                r = self.r_X + k * mX
                A[r:r + mX, (k + 1) * nx:(k + 2) * nx] = XA
                u[r:r + mX] = Xb

        if self.Xf is not None:
            XfA, Xfb = np.asarray(self.Xf.A), np.asarray(self.Xf.b)
            mXf = XfA.shape[0]
            A[self.r_Xf:self.r_Xf + mXf, N * nx:(N + 1) * nx] = XfA
            u[self.r_Xf:self.r_Xf + mXf] = Xfb

        self._A_static = A
        self._l_static = l
        self._u_static = u

    # ------------------------------------------------------------------
    def assemble(self, p: LOCPParams):
        """Produce (P, q, A, l, u, const) for the ADMM solver. Jittable."""
        N, nx, nu, nz = self.N, self.n_x, self.n_u, self.n_z
        dt = self.dtype
        P = jnp.asarray(self._P_static, dt)
        A = jnp.asarray(self._A_static, dt)
        l = jnp.asarray(self._l_static, dt)
        u = jnp.asarray(self._u_static, dt)
        q = jnp.zeros(self.n_var, dt)
        const = jnp.asarray(0.0, dt)

        # ---- dynamics blocks: scatter -A_k, -B_k; bounds = d_k
        dynx = jnp.zeros((N, nx, N + 1, nx), dt)
        dynx = dynx.at[jnp.arange(N), :, jnp.arange(N), :].set(-p.Ad)
        A = A.at[self.r_dyn:self.r_dyn + N * nx, self.off_x:self.off_u].add(
            dynx.reshape(N * nx, (N + 1) * nx))
        dynu = jnp.zeros((N, nx, N, nu), dt)
        dynu = dynu.at[jnp.arange(N), :, jnp.arange(N), :].set(-p.Bd)
        A = A.at[self.r_dyn:self.r_dyn + N * nx,
                 self.off_u:self.off_u + N * nu].set(dynu.reshape(N * nx, N * nu))
        dd_flat = p.dd.reshape(N * nx)
        l = l.at[self.r_dyn:self.r_dyn + N * nx].set(dd_flat)
        u = u.at[self.r_dyn:self.r_dyn + N * nx].set(dd_flat)

        # ---- initial condition bounds
        l = l.at[self.r_init:self.r_init + nx].set(p.x0)
        u = u.at[self.r_init:self.r_init + nx].set(p.x0)

        # ---- trust region bounds: delta + x_scale*xbar terms
        if self.tr_active:
            xs = jnp.asarray(self.x_scale, dt)
            ub_hi = (p.delta + (xs * p.xk)).reshape(-1)         # rows +x
            ub_lo = (p.delta - (xs * p.xk)).reshape(-1)         # rows -x
            tr_u = jnp.stack([ub_hi.reshape(N + 1, nx),
                              ub_lo.reshape(N + 1, nx)], axis=1).reshape(-1)
            u = u.at[self.r_tr:self.r_tr + 2 * nx * (N + 1)].set(tr_u)

        # ---- objective linear terms
        # control: (u - u_des)'R(u - u_des) => q_u = -2 R u_des
        q_u = (-2.0 * p.u_des @ jnp.asarray(self.R, dt)).reshape(-1)
        q = q.at[self.off_u:self.off_u + N * nu].set(q_u)
        const = const + jnp.sum(p.u_des @ jnp.asarray(self.R, dt) * p.u_des)

        Qz = jnp.asarray(self.Qz, dt)
        if self.nonlinear_observer:
            # time-varying H_k: quadratic blocks into P, linear into q
            HQH = 2.0 * jnp.einsum("kzi,zw,kwj->kij", p.Hd, Qz, p.Hd)
            Pq = jnp.zeros((N + 1, nx, N + 1, nx), dt)
            Pq = Pq.at[jnp.arange(N + 1), :, jnp.arange(N + 1), :].set(HQH)
            P = P + jnp.zeros_like(P).at[self.off_x:self.off_u,
                                         self.off_x:self.off_u].set(
                Pq.reshape((N + 1) * nx, (N + 1) * nx))
            resid = p.cd - p.z                                   # (N+1, nz)
            q_x = 2.0 * jnp.einsum("kz,zw,kwi->ki", resid, Qz, p.Hd).reshape(-1)
            q = q.at[self.off_x:self.off_u].add(q_x)
            const = const + jnp.sum(jnp.einsum("kz,zw,kw->k", resid, Qz, resid))
            if self.Qzf is not None:
                Qzf = jnp.asarray(self.Qzf, dt)
                HN = p.Hd[N]
                P = P.at[N * nx:(N + 1) * nx, N * nx:(N + 1) * nx].add(
                    2.0 * HN.T @ Qzf @ HN)
                rf = p.cd[N] - p.zf
                q = q.at[N * nx:(N + 1) * nx].add(2.0 * rf @ Qzf @ HN)
                const = const + rf @ Qzf @ rf
            # state constraints with time-varying H (k = 1..N)
            if self.X is not None:
                XA = jnp.asarray(np.asarray(self.X.A), dt)
                Xb = jnp.asarray(np.asarray(self.X.b), dt)
                mX = XA.shape[0]
                XAH = jnp.einsum("ci,kij->kcj", XA, p.Hd[1:])    # (N, mX, nx)
                Xrows = jnp.zeros((N, mX, N + 1, nx), dt)
                Xrows = Xrows.at[jnp.arange(N), :, jnp.arange(N) + 1, :].set(XAH)
                A = A.at[self.r_X:self.r_X + N * mX, self.off_x:self.off_u].set(
                    Xrows.reshape(N * mX, (N + 1) * nx))
                ub = (Xb[None, :] - jnp.einsum("ci,ki->kc", XA, p.cd[1:])).reshape(-1)
                u = u.at[self.r_X:self.r_X + N * mX].set(ub)
        else:
            H = jnp.asarray(self.H, dt)
            # linear terms: (H x_k - z_k)'Qz(...) => q_x = -2 H'Qz z_k
            q_x = (-2.0 * jnp.einsum("kz,zw,wi->ki", p.z, Qz, H)).reshape(-1)
            q = q.at[self.off_x:self.off_u].add(q_x)
            const = const + jnp.sum(jnp.einsum("kz,zw,kw->k", p.z, Qz, p.z))
            if self.Qzf is not None:
                Qzf = jnp.asarray(self.Qzf, dt)
                q = q.at[N * nx:(N + 1) * nx].add(-2.0 * p.zf @ Qzf @ H)
                const = const + p.zf @ Qzf @ p.zf

        # ---- slack weight
        if self.tr_active:
            q = q.at[self.off_s:].set(p.omega)

        return P, q, A, l, u, const

    # unpackers ----------------------------------------------------------
    def split(self, w):
        N, nx, nu = self.N, self.n_x, self.n_u
        x = w[self.off_x:self.off_u].reshape(N + 1, nx)
        u = w[self.off_u:self.off_u + N * nu].reshape(N, nu)
        s = w[self.off_s:] if self.tr_active else None
        return x, u, s


class LOCP:
    """Stateful wrapper with the reference's update/solve/get_solution API
    (locp.py:98-203), holding warm-start vectors between solves."""

    def __init__(self, N, H, Qz, R, Qzf=None, U=None, X=None, Xf=None, dU=None,
                 verbose=False, warm_start=True, x_char=None,
                 nonlinear_observer=False, is_tr_active=True,
                 input_nullspace=None, dtype=jnp.float64, **solver_kwargs):
        self.spec = LOCPSpec(N, H, Qz, R, Qzf=Qzf, U=U, X=X, Xf=Xf, dU=dU,
                             x_char=x_char, nonlinear_observer=nonlinear_observer,
                             is_tr_active=is_tr_active,
                             input_nullspace=input_nullspace, dtype=dtype)
        self.warm_start = warm_start
        self.verbose = verbose
        self.solver_kwargs = solver_kwargs
        self._w_prev = None
        self._y_prev = None
        self._params = None
        self._solution = None
        self.solve_time = 0.0

        spec = self.spec

        if "eps_abs" not in solver_kwargs and spec.dtype == jnp.float32:
            # f32 cannot reach the f64-parity 1e-8 targets; OSQP's own
            # default accuracy is 1e-3 — aim between
            solver_kwargs["eps_abs"] = 1e-5
            solver_kwargs["eps_rel"] = 1e-5

        def _solve(params: LOCPParams, w0, y0):
            P, q, A, l, u, const = spec.assemble(params)
            sol = solve_qp_dense(P, q, A, l, u, x0=w0, y0=y0, **solver_kwargs)
            return sol, const

        self._solve_jit = jax.jit(_solve)
        self._solve_cold_jit = jax.jit(lambda p: _solve(p, None, None))

    def update(self, Ad, Bd, dd, x0, xk, delta, omega, z=None, zf=None, u=None,
               full=True, Hd=None, cd=None):
        spec = self.spec
        dt = spec.dtype
        N, nx, nz, nu = spec.N, spec.n_x, spec.n_z, spec.n_u
        z = jnp.zeros((N + 1, nz), dt) if z is None else jnp.asarray(z, dt)
        zf = jnp.zeros(nz, dt) if zf is None else jnp.asarray(zf, dt)
        u_des = jnp.zeros((N, nu), dt) if u is None else jnp.asarray(u, dt)
        self._params = LOCPParams(
            Ad=jnp.asarray(jnp.stack([jnp.asarray(a) for a in Ad]), dt)
            if not isinstance(Ad, jnp.ndarray) else jnp.asarray(Ad, dt),
            Bd=jnp.asarray(jnp.stack([jnp.asarray(b) for b in Bd]), dt)
            if not isinstance(Bd, jnp.ndarray) else jnp.asarray(Bd, dt),
            dd=jnp.asarray(jnp.stack([jnp.asarray(d).reshape(-1) for d in dd]), dt)
            if not isinstance(dd, jnp.ndarray) else jnp.asarray(dd, dt).reshape(N, nx),
            x0=jnp.asarray(x0, dt), xk=jnp.asarray(xk, dt),
            delta=jnp.asarray(delta, dt), omega=jnp.asarray(omega, dt),
            z=z, zf=zf, u_des=u_des,
            Hd=(jnp.asarray(jnp.stack([jnp.asarray(h) for h in Hd]), dt)
                if Hd is not None else jnp.zeros((N + 1, nz, nx), dt)),
            cd=(jnp.asarray(jnp.stack([jnp.asarray(c).reshape(-1) for c in cd]), dt)
                if cd is not None else jnp.zeros((N + 1, nz), dt)),
        )

    def solve(self):
        """Returns (Jstar, success, stats) like locp.py:175-190; Jstar uses
        the cvxpy convention (objective including constants)."""
        import time

        t0 = time.time()
        if self.warm_start and self._w_prev is not None:
            sol, const = self._solve_jit(self._params, self._w_prev, self._y_prev)
        else:
            sol, const = self._solve_cold_jit(self._params)
        sol = jax.tree_util.tree_map(lambda a: a.block_until_ready(), sol)
        self.solve_time = time.time() - t0
        self._solution = sol
        if self.warm_start:
            self._w_prev = sol.x
            self._y_prev = sol.y
        Jstar = float(sol.obj + const)
        # accept 'solved inaccurate' results (OSQP semantics): residuals a
        # few orders looser than the target tolerance are still far below
        # the downstream 1e-6 trajectory-parity budget (f64); in f32 the
        # loop bottoms out near 1e-4-1e-3 — accept OSQP-default accuracy
        if self.spec.dtype == jnp.float32:
            acc_pri, acc_dua = 1e-3, 1e-2
        else:
            acc_pri, acc_dua = 1e-5, 1e-4
        # acceptance is RELATIVE to the problem's residual scales (a 5e-3
        # absolute primal residual on u-bounds of 1500 is 3e-6 relative)
        pri_rel = float(sol.pri_res) / max(1.0, float(sol.pri_sc))
        dua_rel = float(sol.dua_res) / max(1.0, float(sol.dua_sc))
        success = bool(sol.solved) or (pri_rel < acc_pri and
                                       dua_rel < acc_dua)
        return (Jstar, True, self) if success else (np.inf, False, None)

    def get_solution(self):
        x, u, s = self.spec.split(np.asarray(self._solution.x))
        return x, u, s
