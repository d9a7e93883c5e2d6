"""Long-horizon LOCP: block-sparse assembly + matrix-free ADMM.

The dense LOCPSpec materializes (n_con, n_var) templates, which is the
scaling wall at N ~ 200 (SURVEY.md hard part: the reference's open-loop
trajectory optimization horizon). This module never forms dense (P, A):

- constraint application A w and A' v are stage-sliced einsums over the
  stacked (A_k, B_k) dynamics and the (small) U/dU/X polytopes;
- the ADMM x-step matrix K = P + sigma I + A' diag(rho) A is assembled
  directly as block-tridiagonal (stage diagonal + lower) blocks and
  factored/solved by qp/structured.py's scan Cholesky in O(N n^3).

Constraint row layout matches LOCPSpec with is_tr_active=False (init,
dynamics, U, dU, X), so bounds and duals are interchangeable with the dense
path; agreement is tested to 1e-8.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.qp.admm import OSQP_RHO_EQ_SCALE
from soft_robot_control_tpu.qp.cyclic_reduction import cr_factor, cr_solve
from soft_robot_control_tpu.qp.structured import btd_factor, btd_solve


class StageLOCP:
    """Stage-structured LOCP.

    With trust_region=True the per-stage slack s_k is appended to the stage
    block ([x_k, u_k, s_k]); the TR rows +-x_scale (x_k - xbar_k) - s_k <=
    delta contribute 2 rho xs^2 to the x-diagonal and 3 rho to the s
    diagonal (TR pair + positivity), with zero x-s cross coupling (the +-
    pair cancels) — the block-tridiagonal structure is preserved, which is
    what makes full long-horizon GuSTO (SURVEY hard part #1/#2 at N=200)
    tractable."""

    def __init__(self, N, H, Qz, R, U=None, dU=None, X=None, rho: float = 0.1,
                 sigma: float = 1e-6, trust_region: bool = False,
                 x_char=None, dtype=jnp.float64, kkt_solver: str = "cr"):
        if kkt_solver not in ("cr", "scan"):
            raise ValueError(f"unknown kkt_solver {kkt_solver!r}")
        # 'cr' = block cyclic reduction (qp/cyclic_reduction.py): log2(N)
        # levels of batched block ops — the TPU-fast default. 'scan' = the
        # sequential block-tridiagonal Cholesky (O(N) small ops in series).
        self.kkt_solver = kkt_solver
        self.N = int(N)
        self.H = np.asarray(H, float)
        self.Qz = np.asarray(Qz, float)
        self.R = np.asarray(R, float)
        self.n_x = self.H.shape[1]
        self.n_z = self.Qz.shape[0]
        self.n_u = self.R.shape[0]
        self.U, self.dU, self.X = U, dU, X
        self.sigma = float(sigma)
        self.dtype = dtype
        self.tr = bool(trust_region)
        self.x_scale = np.ones(self.n_x) if x_char is None \
            else 1.0 / np.abs(np.asarray(x_char, float))
        nx, nu, N_ = self.n_x, self.n_u, self.N
        self.ns = 1 if self.tr else 0
        self.nb = nx + nu + self.ns
        self.n_var = (N_ + 1) * nx + N_ * nu + (N_ + 1) * self.ns

        # row layout (same ordering as LOCPSpec: init, dyn, [tr, s>=0],
        # U, dU, X)
        rows = 0
        self.r_init = rows
        rows += nx
        self.r_dyn = rows
        rows += N_ * nx
        if self.tr:
            self.r_tr = rows
            rows += 2 * nx * (N_ + 1)
            self.r_s = rows
            rows += N_ + 1
        self.mU = 0 if U is None else np.asarray(U.A).shape[0]
        if U is not None:
            self.r_U = rows
            rows += N_ * self.mU
        self.mdU = 0 if dU is None else np.asarray(dU.A).shape[0]
        if dU is not None:
            self.r_dU = rows
            rows += (N_ - 1) * self.mdU
        self.mX = 0 if X is None else np.asarray(X.A).shape[0]
        if X is not None:
            self.r_X = rows
            rows += N_ * self.mX
        self.n_con = rows

        rho_np = np.full(self.n_con, rho)
        rho_np[self.r_init:self.r_init + nx] *= OSQP_RHO_EQ_SCALE
        rho_np[self.r_dyn:self.r_dyn + N_ * nx] *= OSQP_RHO_EQ_SCALE
        self.rho_vec = jnp.asarray(rho_np, dtype)
        self.rho_eq = float(rho * OSQP_RHO_EQ_SCALE)
        self.rho_in = float(rho)

    # -- variable packing ---------------------------------------------------
    def split(self, w):
        nx, nu, N = self.n_x, self.n_u, self.N
        x = w[:(N + 1) * nx].reshape(N + 1, nx)
        u = w[(N + 1) * nx:(N + 1) * nx + N * nu].reshape(N, nu)
        s = w[(N + 1) * nx + N * nu:] if self.tr else None
        return x, u, s

    def join(self, x, u, s=None):
        parts = [x.reshape(-1), u.reshape(-1)]
        if self.tr:
            parts.append(jnp.zeros(self.N + 1, self.dtype) if s is None
                         else s.reshape(-1))
        return jnp.concatenate(parts)

    # -- matrix-free constraint application ---------------------------------
    def A_mv(self, Ad, Bd, w):
        """A @ w without materializing A."""
        x, u, sl = self.split(w)
        parts = [x[0]]
        dyn = x[1:] - jnp.einsum("kij,kj->ki", Ad, x[:-1]) \
            - jnp.einsum("kij,kj->ki", Bd, u)
        parts.append(dyn.reshape(-1))
        if self.tr:
            xs = jnp.asarray(self.x_scale, self.dtype)
            plus = xs[None, :] * x - sl[:, None]
            minus = -xs[None, :] * x - sl[:, None]
            parts.append(jnp.stack([plus, minus], axis=1).reshape(-1))
            parts.append(sl)
        if self.U is not None:
            UA = jnp.asarray(np.asarray(self.U.A), self.dtype)
            parts.append(jnp.einsum("ci,ki->kc", UA, u).reshape(-1))
        if self.dU is not None:
            dA = jnp.asarray(np.asarray(self.dU.A), self.dtype)
            parts.append(jnp.einsum("ci,ki->kc", dA, u[1:] - u[:-1]).reshape(-1))
        if self.X is not None:
            XA = jnp.asarray(np.asarray(self.X.A), self.dtype)
            parts.append(jnp.einsum("ci,ki->kc", XA, x[1:]).reshape(-1))
        return jnp.concatenate(parts)

    def At_mv(self, Ad, Bd, v):
        """A' @ v without materializing A."""
        nx, nu, N = self.n_x, self.n_u, self.N
        x_out = jnp.zeros((N + 1, nx), self.dtype)
        u_out = jnp.zeros((N, nu), self.dtype)
        s_out = jnp.zeros(N + 1, self.dtype) if self.tr else None
        v_init = v[self.r_init:self.r_init + nx]
        x_out = x_out.at[0].add(v_init)
        v_dyn = v[self.r_dyn:self.r_dyn + N * nx].reshape(N, nx)
        x_out = x_out.at[1:].add(v_dyn)
        x_out = x_out.at[:-1].add(-jnp.einsum("kij,ki->kj", Ad, v_dyn))
        u_out = u_out + (-jnp.einsum("kij,ki->kj", Bd, v_dyn))
        if self.tr:
            xs = jnp.asarray(self.x_scale, self.dtype)
            v_tr = v[self.r_tr:self.r_tr + 2 * nx * (N + 1)].reshape(
                N + 1, 2, nx)
            x_out = x_out + xs[None, :] * (v_tr[:, 0] - v_tr[:, 1])
            s_out = s_out - jnp.sum(v_tr[:, 0] + v_tr[:, 1], axis=1)
            s_out = s_out + v[self.r_s:self.r_s + N + 1]
        if self.U is not None:
            UA = jnp.asarray(np.asarray(self.U.A), self.dtype)
            v_U = v[self.r_U:self.r_U + N * self.mU].reshape(N, self.mU)
            u_out = u_out + jnp.einsum("ci,kc->ki", UA, v_U)
        if self.dU is not None:
            dA = jnp.asarray(np.asarray(self.dU.A), self.dtype)
            v_d = v[self.r_dU:self.r_dU + (N - 1) * self.mdU].reshape(
                N - 1, self.mdU)
            contrib = jnp.einsum("ci,kc->ki", dA, v_d)
            u_out = u_out.at[1:].add(contrib)
            u_out = u_out.at[:-1].add(-contrib)
        if self.X is not None:
            XA = jnp.asarray(np.asarray(self.X.A), self.dtype)
            v_X = v[self.r_X:self.r_X + N * self.mX].reshape(N, self.mX)
            x_out = x_out.at[1:].add(jnp.einsum("ci,kc->ki", XA, v_X))
        return self.join(x_out, u_out, s_out)

    # -- bounds + linear objective -------------------------------------------
    def bounds(self, x0, dd, delta=None, xk=None):
        N, nx = self.N, self.n_x
        inf = jnp.asarray(jnp.inf, self.dtype)
        l = [x0, dd.reshape(-1)]
        u = [x0, dd.reshape(-1)]
        if self.tr:
            xs = jnp.asarray(self.x_scale, self.dtype)
            hi = delta + xs[None, :] * xk
            lo = delta - xs[None, :] * xk
            tr_u = jnp.stack([hi, lo], axis=1).reshape(-1)
            l.append(jnp.full(2 * nx * (N + 1), -inf))
            u.append(tr_u)
            l.append(jnp.zeros(N + 1, self.dtype))
            u.append(jnp.full(N + 1, inf))
        if self.U is not None:
            Ub = jnp.asarray(np.asarray(self.U.b), self.dtype)
            l.append(jnp.full(N * self.mU, -inf))
            u.append(jnp.tile(Ub, N))
        if self.dU is not None:
            db = jnp.asarray(np.asarray(self.dU.b), self.dtype)
            l.append(jnp.full((N - 1) * self.mdU, -inf))
            u.append(jnp.tile(db, N - 1))
        if self.X is not None:
            Xb = jnp.asarray(np.asarray(self.X.b), self.dtype)
            l.append(jnp.full(N * self.mX, -inf))
            u.append(jnp.tile(Xb, N))
        return jnp.concatenate(l), jnp.concatenate(u)

    def P_mv(self, w):
        """P @ w (cvxpy-convention factor 2) without materializing P."""
        x, u, sl = self.split(w)
        HQH = jnp.asarray(2.0 * self.H.T @ self.Qz @ self.H, self.dtype)
        R2 = jnp.asarray(2.0 * self.R, self.dtype)
        return self.join(jnp.einsum("ij,kj->ki", HQH, x),
                         jnp.einsum("ij,kj->ki", R2, u),
                         None if sl is None else jnp.zeros_like(sl))

    def q_vec(self, z, u_des, omega=None):
        q_x = -2.0 * jnp.einsum("kz,zw,wi->ki", z,
                                jnp.asarray(self.Qz, self.dtype),
                                jnp.asarray(self.H, self.dtype))
        q_u = -2.0 * jnp.einsum("kz,zw->kw", u_des,
                                jnp.asarray(self.R, self.dtype))
        q_s = None
        if self.tr:
            om = jnp.asarray(0.0 if omega is None else omega, self.dtype)
            q_s = jnp.full(self.N + 1, om, self.dtype)
        return self.join(q_x, q_u, q_s)

    # -- block-tridiagonal K assembly -----------------------------------------
    def K_blocks(self, Ad, Bd):
        """Stage blocks of K = P + sigma I + A' diag(rho) A, interleaved
        order [x_k, u_k] (last stage x_N identity-padded)."""
        nx, nu, nb, N = self.n_x, self.n_u, self.nb, self.N
        dt = self.dtype
        r_eq, r_in = self.rho_eq, self.rho_in
        HQH = jnp.asarray(2.0 * self.H.T @ self.Qz @ self.H, dt) \
            + self.sigma * jnp.eye(nx, dtype=dt)
        R2 = jnp.asarray(2.0 * self.R, dt) + self.sigma * jnp.eye(nu, dtype=dt)

        UtU = (jnp.asarray(r_in * np.asarray(self.U.A).T @ np.asarray(self.U.A), dt)
               if self.U is not None else jnp.zeros((nu, nu), dt))
        dtd = (jnp.asarray(r_in * np.asarray(self.dU.A).T @ np.asarray(self.dU.A), dt)
               if self.dU is not None else jnp.zeros((nu, nu), dt))
        XtX = (jnp.asarray(r_in * np.asarray(self.X.A).T @ np.asarray(self.X.A), dt)
               if self.X is not None else jnp.zeros((nx, nx), dt))

        # trust-region contributions (inequality rho): per state dim the +-
        # row pair gives 2 rho xs_i^2 on the x diagonal; s_k appears with
        # coefficient -1 in all 2 nx TR rows (=> 2 nx rho on its diagonal)
        # and +1 in its positivity row (+rho); the (x, s) cross terms cancel
        # pairwise; sigma regularizes the s slot too
        xs2 = jnp.asarray(2.0 * r_in * self.x_scale**2, dt) if self.tr else None
        s_diag = (2.0 * nx * r_in + r_in + self.sigma) if self.tr else 1.0

        def stage(k, A_k, B_k):
            # diagonal block for stage k (x_k, u_k[, s_k])
            Dxx = HQH + r_eq * jnp.einsum("ij,ik->jk", A_k, A_k)
            Dxx = Dxx + jnp.where(k == 0, r_eq, 0.0) * jnp.eye(nx, dtype=dt)
            Dxx = Dxx + jnp.where(k > 0, 1.0, 0.0) * (
                r_eq * jnp.eye(nx, dtype=dt) + XtX)  # from dynamics row k-1 (+I) and X row k-1
            if self.tr:
                Dxx = Dxx + jnp.diag(xs2)
            Duu = R2 + r_eq * jnp.einsum("ij,ik->jk", B_k, B_k) + UtU
            Duu = Duu + dtd * jnp.where((k > 0) & (k < N), 1.0, 0.0) \
                + dtd * jnp.where(k < N - 1, 1.0, 0.0)
            Dxu = r_eq * jnp.einsum("ij,ik->jk", A_k, B_k)
            D = jnp.zeros((nb, nb), dt)
            D = D.at[:nx, :nx].set(Dxx)
            D = D.at[nx:nx + nu, nx:nx + nu].set(Duu)
            D = D.at[:nx, nx:nx + nu].set(Dxu)
            D = D.at[nx:nx + nu, :nx].set(Dxu.T)
            if self.tr:
                D = D.at[nx + nu, nx + nu].set(s_diag)
            return D

        ks = jnp.arange(N)
        diag = jax.vmap(stage)(ks, Ad, Bd)

        # lower off-diagonal block L_k: coupling of stage k+1 rows with
        # stage k columns. From dynamics row k: (+I on x_{k+1}) x (-A_k on
        # x_k, -B_k on u_k) => [-rho_eq A_k, -rho_eq B_k] in the x rows; from
        # dU row k: u_{k+1} x u_k cross -dtd. TR slack couples only within
        # its own stage: no off-diagonal s terms.
        def off(k, A_k, B_k):
            L = jnp.zeros((nb, nb), dt)
            L = L.at[:nx, :nx].set(-r_eq * A_k)
            L = L.at[:nx, nx:nx + nu].set(-r_eq * B_k)
            L = L.at[nx:nx + nu, nx:nx + nu].set(
                -dtd * jnp.where(k < N - 1, 1.0, 0.0))
            return L

        lower = jax.vmap(off)(ks, Ad, Bd)

        # final stage block: x_N (+ s_N) with identity padding on the u slot
        DxxN = HQH + r_eq * jnp.eye(nx, dtype=dt) + XtX
        if self.tr:
            DxxN = DxxN + jnp.diag(xs2)
        DN = jnp.eye(nb, dtype=dt)
        DN = DN.at[:nx, :nx].set(DxxN)
        if self.tr:
            DN = DN.at[nx + nu, nx + nu].set(s_diag)
        diag = jnp.concatenate([diag, DN[None]], axis=0)
        # off-diagonal between stage N-1 and N comes from dynamics row N-1
        lowN = jnp.zeros((nb, nb), dt)
        lowN = lowN.at[:nx, :nx].set(-r_eq * Ad[N - 1])
        lowN = lowN.at[:nx, nx:nx + nu].set(-r_eq * Bd[N - 1])
        lower = jnp.concatenate([lower[:-1], lowN[None]], axis=0)
        return diag, lower

    # -- interleave/deinterleave ----------------------------------------------
    def to_stages(self, w):
        nx, nu, N = self.n_x, self.n_u, self.N
        x, u, sl = self.split(w)
        u_ext = jnp.concatenate([u, jnp.zeros((1, nu), self.dtype)], axis=0)
        cols = [x, u_ext]
        if self.tr:
            cols.append(sl[:, None])
        return jnp.concatenate(cols, axis=1)               # (N+1, nb)

    def from_stages(self, blocks):
        nx, nu, N = self.n_x, self.n_u, self.N
        x = blocks[:, :nx]
        u = blocks[:-1, nx:nx + nu]
        s = blocks[:, nx + nu] if self.tr else None
        return self.join(x, u, s)

    # -- full solve -------------------------------------------------------------
    def solve(self, Ad, Bd, dd, x0, z, u_des=None, iters: int = 200,
              alpha: float = 1.6, w0=None, y0=None, delta=None, omega=None,
              xk=None):
        """Fixed-iteration ADMM, matrix-free + structured x-step. With
        trust_region=True, (delta, omega, xk) parameterize the TR."""
        dt = self.dtype
        Ad = jnp.asarray(Ad, dt)
        Bd = jnp.asarray(Bd, dt)
        dd = jnp.asarray(dd, dt)
        x0 = jnp.asarray(x0, dt)
        z = jnp.asarray(z, dt)
        u_des = (jnp.zeros((self.N, self.n_u), dt) if u_des is None
                 else jnp.asarray(u_des, dt))
        if self.tr:
            delta = jnp.asarray(delta, dt)
            omega = jnp.asarray(omega, dt)
            xk = jnp.asarray(xk, dt)
        q = self.q_vec(z, u_des, omega=omega)
        l, u_b = self.bounds(x0, dd, delta=delta, xk=xk)
        rho = self.rho_vec
        sigma = self.sigma

        diag, lower = self.K_blocks(Ad, Bd)
        if self.kkt_solver == "cr":
            factors = cr_factor(diag, lower)
        else:
            factors = btd_factor(diag, lower)

        w = jnp.zeros(self.n_var, dt) if w0 is None else w0
        y = jnp.zeros(self.n_con, dt) if y0 is None else y0
        zc = jnp.clip(self.A_mv(Ad, Bd, w), l, u_b)

        def body(i, carry):
            w, zc, y = carry
            rhs = sigma * w - q + self.At_mv(Ad, Bd, rho * zc - y)
            rhs_blocks = self.to_stages(rhs)
            if self.kkt_solver == "cr":
                w_t = self.from_stages(cr_solve(factors, rhs_blocks))
            else:
                w_t = self.from_stages(btd_solve(*factors, rhs_blocks))
            z_t = self.A_mv(Ad, Bd, w_t)
            w_new = alpha * w_t + (1 - alpha) * w
            z_rel = alpha * z_t + (1 - alpha) * zc
            z_new = jnp.clip(z_rel + y / rho, l, u_b)
            y_new = y + rho * (z_rel - z_new)
            return w_new, z_new, y_new

        w, zc, y = jax.lax.fori_loop(0, iters, body, (w, zc, y))
        return w, y


class StageLOCPAdapter:
    """LOCP-compatible wrapper (update/solve/get_solution,
    scp/locp.py:98-203 contract) over StageLOCP, so the host GuSTO loop can
    run long-horizon problems without dense assembly."""

    def __init__(self, N, H, Qz, R, U=None, X=None, dU=None, x_char=None,
                 iters: int = 400, dtype=jnp.float64, **_ignored):
        self.stage = StageLOCP(N, H, Qz, R, U=U, dU=dU, X=X,
                               trust_region=True, x_char=x_char, dtype=dtype)
        self.iters = int(iters)
        self._w = None
        self._y = None
        self._params = None
        self.solve_time = 0.0

        st = self.stage

        def _solve(Ad, Bd, dd, x0, xk, delta, omega, z, u_des, w0, y0):
            w, y = st.solve(Ad, Bd, dd, x0, z, u_des=u_des, iters=self.iters,
                            w0=w0, y0=y0, delta=delta, omega=omega, xk=xk)
            # objective (cvxpy convention incl. constants) and residuals
            q = st.q_vec(z, u_des, omega=omega)
            Qzj = jnp.asarray(st.Qz, st.dtype)
            Rj = jnp.asarray(st.R, st.dtype)
            const = jnp.sum(jnp.einsum("kz,zw,kw->k", z, Qzj, z)) \
                + jnp.sum(u_des @ Rj * u_des)
            J = 0.5 * w @ st.P_mv(w) + q @ w + const
            l, u_b = st.bounds(x0, dd, delta=delta, xk=xk)
            Aw = st.A_mv(Ad, Bd, w)
            pri = jnp.maximum(jnp.max(Aw - u_b), jnp.max(l - Aw))
            pri = jnp.maximum(pri, 0.0)
            dua = jnp.max(jnp.abs(st.P_mv(w) + q + st.At_mv(Ad, Bd, y)))
            return w, y, J, pri, dua

        self._solve_jit = jax.jit(_solve)

    def update(self, Ad, Bd, dd, x0, xk, delta, omega, z=None, zf=None,
               u=None, full=True, Hd=None, cd=None):
        st = self.stage
        dt = st.dtype
        z = (jnp.zeros((st.N + 1, st.n_z), dt) if z is None
             else jnp.asarray(z, dt))
        u_des = (jnp.zeros((st.N, st.n_u), dt) if u is None
                 else jnp.asarray(u, dt))
        self._params = (jnp.asarray(Ad, dt), jnp.asarray(Bd, dt),
                        jnp.asarray(np.asarray(dd).reshape(st.N, st.n_x), dt),
                        jnp.asarray(x0, dt), jnp.asarray(xk, dt),
                        jnp.asarray(delta, dt), jnp.asarray(omega, dt),
                        z, u_des)

    def solve(self):
        import time

        t0 = time.time()
        st = self.stage
        w0 = (jnp.zeros(st.n_var, st.dtype) if self._w is None else self._w)
        y0 = (jnp.zeros(st.n_con, st.dtype) if self._y is None else self._y)
        w, y, J, pri, dua = self._solve_jit(*self._params, w0, y0)
        w = w.block_until_ready()
        self.solve_time = time.time() - t0
        self._w, self._y = w, y
        # 'solved inaccurate' acceptance (fixed-iteration ADMM)
        success = float(pri) < 1e-4 and float(dua) < 1e-3
        return (float(J), True, self) if success else (np.inf, False, None)

    def get_solution(self):
        x, u, s = self.stage.split(np.asarray(self._w))
        return np.asarray(x), np.asarray(u), np.asarray(s)
