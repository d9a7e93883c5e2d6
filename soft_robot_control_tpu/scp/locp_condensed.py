"""Condensed LOCP: eliminate the state trajectory through the dynamics.

The reference's LOCP (sofacontrol/scp/locp.py) keeps x as decision
variables with N block equality constraints — the right shape for cvxpy +
sparse OSQP on CPU. On TPU the dense ADMM's cost is set by the KKT size:
with Diamond-scale nx=42, N=5 that is 272 variables and a (272, 272) K^-1
per solve. In the real-time MPC mode (trust_region off,
examples/hardware/diamond_SSM.py:361 max_gusto_iters=0) the dynamics
equalities can be eliminated exactly by forward substitution:

    x_k = xfree_k + G_k u,   xfree_{k+1} = A_k xfree_k + d_k,
    G_{k+1} = A_k G_k + B_k E_k   (E_k selects u_k's block)

leaving a QP in u alone (N*nu = 20 variables): identical optimum, ~200x
smaller KKT. Cost/constraints supported: output tracking through H (or
time-varying Hd/cd for the nonlinear-observer SSM case, locp.py:231-245),
R and u_des, U and dU polyhedra, X applied to the predicted states.

Everything is jax-traceable and vmappable; assembly is one lax.scan of
small matmuls (MXU) per problem.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CondensedParams(NamedTuple):
    Ad: jnp.ndarray          # (N, nx, nx)
    Bd: jnp.ndarray          # (N, nx, nu)
    dd: jnp.ndarray          # (N, nx)
    x0: jnp.ndarray          # (nx,)
    z: jnp.ndarray           # (N+1, nz) targets
    u_des: jnp.ndarray       # (N, nu)
    Hd: jnp.ndarray          # (N+1, nz, nx) time-varying output map or zeros
    cd: jnp.ndarray          # (N+1, nz) output offsets
    # trust-region fields (used when the spec has trust_region=True)
    xk: Optional[jnp.ndarray] = None      # (N+1, nx) linearization traj
    delta: Optional[jnp.ndarray] = None   # scalar TR radius
    omega: Optional[jnp.ndarray] = None   # scalar slack weight
    zf: Optional[jnp.ndarray] = None      # (nz,) terminal target (Qzf)


class CondensedSpec:
    """Static problem structure for the condensed real-time LOCP.

    H: (nz, nx) linear output map (used when nonlinear_observer=False).
    U/dU: HyperRectangle/Polyhedron-like with .A/.b or .lb/.ub; X acts on
    the predicted states x_1..x_N.
    """

    def __init__(self, N: int, H, Qz, R, U=None, dU=None, X=None,
                 nonlinear_observer: bool = False, trust_region: bool = False,
                 x_char=None, dtype=jnp.float32, Qzf=None):
        self.N = int(N)
        self.H = np.asarray(H)
        self.n_z, self.n_x = self.H.shape
        self.Qz = np.asarray(Qz)
        self.Qzf = None if Qzf is None else np.asarray(Qzf)
        self.R = np.asarray(R)
        self.n_u = self.R.shape[0]
        self.U, self.dU, self.X = U, dU, X
        self.nonlinear_observer = bool(nonlinear_observer)
        # trust region (GuSTO): scaled inf-norm |x_scale (x_k - xk_k)| <=
        # delta + s with one shared nonnegative slack s (locp.py:13,21-24
        # semantics) — affine in u through the prediction map, so it
        # condenses too at the cost of ONE extra variable
        self.trust_region = bool(trust_region)
        x_char = np.ones(self.n_x) if x_char is None else np.asarray(x_char)
        self.x_scale = 1.0 / np.abs(x_char)
        self.dtype = dtype
        self.n_var = self.N * self.n_u + (1 if trust_region else 0)

        # constraint row layout (all inequalities; no dynamics equalities
        # remain, so no OSQP equality-rho boost is needed)
        rows = 0
        self.r_U = rows
        if U is not None:
            self._U_A = np.asarray(U.A)
            self._U_b = np.asarray(U.b)
            rows += self.N * self._U_A.shape[0]
        self.r_dU = rows
        if dU is not None:
            self._dU_A = np.asarray(dU.A)
            self._dU_b = np.asarray(dU.b)
            rows += (self.N - 1) * self._dU_A.shape[0]
        self.r_X = rows
        if X is not None:
            self._X_A = np.asarray(X.A)
            self._X_b = np.asarray(X.b)
            rows += self.N * self._X_A.shape[0]
        self.r_tr = rows
        if trust_region:
            rows += 2 * self.N * self.n_x + 1  # +/- sides and s >= 0
        self.n_con = max(rows, 1)  # >=1: assemble emits a vacuous row
        #                              when unconstrained

    # ------------------------------------------------------------------
    def predict(self, params: CondensedParams):
        """Forward-substitution maps: xfree (N+1, nx) and G (N+1, nx, Nu)."""
        N, nx, nu = self.N, self.n_x, self.n_u
        dt_ = params.Ad.dtype
        G0 = jnp.zeros((nx, N * nu), dt_)

        def step(carry, inp):
            xf, G, k = carry
            A, B, d = inp
            G1 = jnp.matmul(A, G, precision=jax.lax.Precision.HIGHEST)
            blk = jax.lax.dynamic_slice(G1, (0, k * nu), (nx, nu))
            G1 = jax.lax.dynamic_update_slice(G1, blk + B, (0, k * nu))
            xf1 = A @ xf + d
            return (xf1, G1, k + 1), (xf1, G1)

        (_, _, _), (xfs, Gs) = jax.lax.scan(
            step, (params.x0.astype(dt_), G0, 0),
            (params.Ad, params.Bd, params.dd))
        xfree = jnp.concatenate([params.x0.astype(dt_)[None], xfs], axis=0)
        G = jnp.concatenate([G0[None], Gs], axis=0)
        return xfree, G

    # ------------------------------------------------------------------
    def assemble(self, params: CondensedParams):
        """Build (P, q, A, l, u, const) of 0.5 u'Pu + q'u + const s.t.
        l <= A u <= u, matching the sparse LOCP objective on its optimum."""
        N, nx, nu, nz = self.N, self.n_x, self.n_u, self.n_z
        dt_ = params.Ad.dtype
        hi = jax.lax.Precision.HIGHEST
        mm = lambda a, b: jnp.matmul(a, b, precision=hi)

        xfree, G = self.predict(params)

        # output map rows: Hd_k (time-varying, nonlinear observer) or H
        if self.nonlinear_observer:
            Hk = params.Hd                                  # (N+1, nz, nx)
            zoff = params.cd                                # (N+1, nz)
        else:
            Hk = jnp.tile(jnp.asarray(self.H, dt_)[None], (N + 1, 1, 1))
            zoff = jnp.zeros((N + 1, nz), dt_)

        HG = jnp.einsum("kij,kjm->kim", Hk, G, precision=hi)  # (N+1,nz,Nu)
        e = jnp.einsum("kij,kj->ki", Hk, xfree, precision=hi) + zoff \
            - params.z.astype(dt_)                             # (N+1, nz)
        Qz = jnp.asarray(self.Qz, dt_)
        # stage costs k=1..N plus the k=0 stage as a constant (x_0 = x0 is
        # u-free; the sparse spec sums k=0..N, locp.py:139 — keep J equal)
        P = 2.0 * jnp.einsum("kiv,ij,kjw->vw", HG[1:], Qz, HG[1:],
                             precision=hi)
        q = 2.0 * jnp.einsum("kiv,ij,kj->v", HG[1:], Qz, e[1:], precision=hi)
        const = jnp.einsum("ki,ij,kj->", e, Qz, e, precision=hi)
        if self.Qzf is not None:
            # terminal cost (H_N x_N + c_N - zf)' Qzf (...) on top of the
            # stage costs, matching the sparse LOCP (locp.py:14,275-304)
            Qzf = jnp.asarray(self.Qzf, dt_)
            zf = (jnp.zeros(nz, dt_) if params.zf is None
                  else params.zf.astype(dt_))
            ef = jnp.einsum("ij,j->i", Hk[N], xfree[N], precision=hi) \
                + zoff[N] - zf
            P = P + 2.0 * jnp.einsum("iv,ij,jw->vw", HG[N], Qzf, HG[N],
                                     precision=hi)
            q = q + 2.0 * jnp.einsum("iv,ij,j->v", HG[N], Qzf, ef,
                                     precision=hi)
            const = const + ef @ mm(Qzf, ef)
        Rb = jnp.kron(jnp.eye(N, dtype=dt_), jnp.asarray(self.R, dt_))
        P = P + 2.0 * Rb
        ud = params.u_des.astype(dt_).reshape(-1)
        q = q - 2.0 * mm(Rb, ud)
        const = const + ud @ mm(Rb, ud)
        n_u_var = N * nu
        if self.trust_region:
            # append the slack variable s: quadratic 0, linear omega
            P = jnp.pad(P, ((0, 1), (0, 1)))
            q = jnp.concatenate([q, params.omega.astype(dt_)[None]])

        # constraints
        big = jnp.asarray(1e30, dt_)
        A_rows, l_rows, u_rows = [], [], []
        if self.U is not None:
            UA = jnp.asarray(self._U_A, dt_)
            Ub = jnp.asarray(self._U_b, dt_)
            A_rows.append(jnp.kron(jnp.eye(N, dtype=dt_), UA))
            u_rows.append(jnp.tile(Ub, N))
            l_rows.append(jnp.full(N * UA.shape[0], -big, dt_))
        if self.dU is not None:
            DA = jnp.asarray(self._dU_A, dt_)
            Db = jnp.asarray(self._dU_b, dt_)
            D = (jnp.eye(N, dtype=dt_, k=1) - jnp.eye(N, dtype=dt_))[:-1]
            A_rows.append(jnp.kron(D, DA))
            u_rows.append(jnp.tile(Db, N - 1))
            l_rows.append(jnp.full((N - 1) * DA.shape[0], -big, dt_))
        if self.X is not None:
            XA = jnp.asarray(self._X_A, dt_)
            Xb = jnp.asarray(self._X_b, dt_)
            XG = jnp.einsum("ij,kjm->kim", XA, G[1:], precision=hi)
            A_rows.append(XG.reshape(-1, n_u_var))
            u_rows.append((Xb[None] - jnp.einsum(
                "ij,kj->ki", XA, xfree[1:], precision=hi)).reshape(-1))
            l_rows.append(jnp.full(N * XA.shape[0], -big, dt_))
        if A_rows and self.trust_region:
            # existing rows get a zero s column
            A_rows = [jnp.pad(Ar, ((0, 0), (0, 1))) for Ar in A_rows]
        if self.trust_region:
            xs = jnp.asarray(self.x_scale, dt_)
            dx_free = xs[None, :] * (xfree[1:] - params.xk.astype(dt_)[1:])
            SG = xs[None, :, None] * G[1:]            # (N, nx, Nu)
            SG = SG.reshape(N * nx, n_u_var)
            ones = jnp.ones((N * nx, 1), dt_)
            delta = params.delta.astype(dt_)
            #  x_scale(x - xk) - s <= delta   and  -x_scale(x - xk) - s <= delta
            A_rows.append(jnp.concatenate([SG, -ones], axis=1))
            u_rows.append(delta - dx_free.reshape(-1))
            l_rows.append(jnp.full(N * nx, -big, dt_))
            A_rows.append(jnp.concatenate([-SG, -ones], axis=1))
            u_rows.append(delta + dx_free.reshape(-1))
            l_rows.append(jnp.full(N * nx, -big, dt_))
            # s >= 0
            srow = jnp.zeros((1, self.n_var), dt_).at[0, -1].set(1.0)
            A_rows.append(srow)
            l_rows.append(jnp.zeros(1, dt_))
            u_rows.append(jnp.full(1, big, dt_))
        if A_rows:
            A = jnp.concatenate(A_rows, axis=0)
            l = jnp.concatenate(l_rows)
            u = jnp.concatenate(u_rows)
        else:  # unconstrained: single vacuous row keeps the ADMM shape-happy
            A = jnp.zeros((1, self.n_var), dt_)
            l = jnp.full(1, -big, dt_)
            u = jnp.full(1, big, dt_)

        return P, q, A, l, u, const, xfree, G

    # ------------------------------------------------------------------
    def recover_x(self, xfree, G, u_opt):
        """x trajectory of the optimal input: xfree + G u. With the trust
        region active, u_opt may include the trailing slack — only the
        input part enters the prediction."""
        u_opt = u_opt[:self.N * self.n_u]
        return xfree + jnp.einsum("kim,m->ki", G, u_opt,
                                  precision=jax.lax.Precision.HIGHEST)


class CondensedLOCPAdapter:
    """LOCP-compatible wrapper (update/solve/get_solution, scp/locp.py:98-203
    contract) over CondensedSpec for the host GuSTO loop
    (locp_backend='condensed').

    The sparse LOCP's slacked infinity-norm trust-region epigraph (one slack
    shared by 2(N+1)nx rows) is ADMM-hostile at large nx — the reference
    sidesteps the same issue by handing those QPs to GUROBI
    (examples/hardware/diamond.py:316). Condensing eliminates the state
    variables exactly, shrinking the QP to N*nu (+1 slack) variables where
    the OSQP-semantics dense solver converges in a few hundred iterations.
    """

    def __init__(self, N, H, Qz, R, Qzf=None, U=None, X=None, Xf=None,
                 dU=None, x_char=None, nonlinear_observer=False,
                 verbose=False, warm_start=True, dtype=jnp.float64,
                 is_tr_active=True, **solver_kwargs):
        if Xf is not None:
            raise NotImplementedError(
                "condensed backend supports the no-terminal-set LOCP")
        # is_tr_active=False drops the slacked trust region entirely — the
        # right mode for max_gusto_iters=0 real-time MPC (one LOCP per
        # query; diamond_SSM.py:361): the slack's dual converges slowly
        # under ADMM and is pure overhead when delta never binds.
        self.spec = CondensedSpec(int(N), np.asarray(H), np.asarray(Qz),
                                  np.asarray(R), U=U, dU=dU, X=X,
                                  nonlinear_observer=bool(nonlinear_observer),
                                  trust_region=bool(is_tr_active),
                                  x_char=x_char, dtype=dtype,
                                  Qzf=None if Qzf is None
                                  else np.asarray(Qzf))
        self.warm_start = bool(warm_start)
        self.solve_time = 0.0
        self._params = None
        self._w_prev = None
        self._y_prev = None
        self._sol = None
        spec = self.spec
        from soft_robot_control_tpu.qp.admm import solve_qp_dense

        if "eps_abs" not in solver_kwargs and spec.dtype == jnp.float32:
            solver_kwargs["eps_abs"] = 1e-5
            solver_kwargs["eps_rel"] = 1e-5
        self.solver_kwargs = dict(solver_kwargs)

        def _solve(params: CondensedParams, w0, y0):
            P, q, A, l, u, const, xfree, G = spec.assemble(params)
            sol = solve_qp_dense(P, q, A, l, u, x0=w0, y0=y0,
                                 **solver_kwargs)
            return sol, const, xfree, G

        self._solve_jit = jax.jit(_solve)
        self._solve_cold_jit = jax.jit(lambda p: _solve(p, None, None))

    def update(self, Ad, Bd, dd, x0, xk, delta, omega, z=None, zf=None,
               u=None, full=True, Hd=None, cd=None):
        spec = self.spec
        dt = spec.dtype
        N, nx, nz, nu = spec.N, spec.n_x, spec.n_z, spec.n_u
        self._params = CondensedParams(
            Ad=jnp.asarray(np.asarray(Ad), dt).reshape(N, nx, nx),
            Bd=jnp.asarray(np.asarray(Bd), dt).reshape(N, nx, nu),
            dd=jnp.asarray(np.asarray(dd), dt).reshape(N, nx),
            x0=jnp.asarray(x0, dt),
            z=(jnp.zeros((N + 1, nz), dt) if z is None
               else jnp.asarray(z, dt)),
            zf=None if zf is None else jnp.asarray(zf, dt),
            u_des=(jnp.zeros((N, nu), dt) if u is None
                   else jnp.asarray(u, dt)),
            Hd=(jnp.asarray(np.asarray(Hd), dt) if Hd is not None
                else jnp.zeros((N + 1, nz, nx), dt)),
            cd=(jnp.asarray(np.asarray(cd), dt) if cd is not None
                else jnp.zeros((N + 1, nz), dt)),
            xk=jnp.asarray(xk, dt),
            delta=jnp.asarray(delta, dt),
            omega=jnp.asarray(omega, dt))

    def solve(self):
        import time

        t0 = time.time()
        if self.warm_start and self._w_prev is not None:
            sol, const, xfree, G = self._solve_jit(self._params,
                                                   self._w_prev,
                                                   self._y_prev)
        else:
            sol, const, xfree, G = self._solve_cold_jit(self._params)
        sol = jax.tree_util.tree_map(lambda a: a.block_until_ready(), sol)
        self.solve_time = time.time() - t0
        self._sol = (sol, xfree, G)
        if self.warm_start:
            self._w_prev = sol.x
            self._y_prev = sol.y
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
        J = float(sol.obj + const)
        return (J, True, self) if success else (np.inf, False, None)

    def get_solution(self):
        sol, xfree, G = self._sol
        w = np.asarray(sol.x)
        N, nu = self.spec.N, self.spec.n_u
        u = w[:N * nu].reshape(N, nu)
        x = np.asarray(self.spec.recover_x(xfree, G, jnp.asarray(sol.x)))
        s = w[N * nu:] if self.spec.trust_region else np.zeros(1)
        return x, u, s
