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
from soft_robot_control_tpu.qp.structured import btd_factor, btd_solve


class StageLOCP:
    """Stage-structured LOCP (trust region off)."""

    def __init__(self, N, H, Qz, R, U=None, dU=None, X=None, rho: float = 0.1,
                 sigma: float = 1e-6, dtype=jnp.float64):
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
        nx, nu, N_ = self.n_x, self.n_u, self.N
        self.nb = nx + nu
        self.n_var = (N_ + 1) * nx + N_ * nu

        # row layout (same ordering as LOCPSpec tr-off)
        rows = 0
        self.r_init = rows
        rows += nx
        self.r_dyn = rows
        rows += N_ * nx
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
        u = w[(N + 1) * nx:].reshape(N, nu)
        return x, u

    def join(self, x, u):
        return jnp.concatenate([x.reshape(-1), u.reshape(-1)])

    # -- matrix-free constraint application ---------------------------------
    def A_mv(self, Ad, Bd, w):
        """A @ w without materializing A."""
        x, u = self.split(w)
        parts = [x[0]]
        dyn = x[1:] - jnp.einsum("kij,kj->ki", Ad, x[:-1]) \
            - jnp.einsum("kij,kj->ki", Bd, u)
        parts.append(dyn.reshape(-1))
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
        v_init = v[self.r_init:self.r_init + nx]
        x_out = x_out.at[0].add(v_init)
        v_dyn = v[self.r_dyn:self.r_dyn + N * nx].reshape(N, nx)
        x_out = x_out.at[1:].add(v_dyn)
        x_out = x_out.at[:-1].add(-jnp.einsum("kij,ki->kj", Ad, v_dyn))
        u_out = u_out + (-jnp.einsum("kij,ki->kj", Bd, v_dyn))
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
        return self.join(x_out, u_out)

    # -- bounds + linear objective -------------------------------------------
    def bounds(self, x0, dd):
        N, nx = self.N, self.n_x
        inf = jnp.asarray(jnp.inf, self.dtype)
        l = [x0, dd.reshape(-1)]
        u = [x0, dd.reshape(-1)]
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
        x, u = self.split(w)
        HQH = jnp.asarray(2.0 * self.H.T @ self.Qz @ self.H, self.dtype)
        R2 = jnp.asarray(2.0 * self.R, self.dtype)
        return self.join(jnp.einsum("ij,kj->ki", HQH, x),
                         jnp.einsum("ij,kj->ki", R2, u))

    def q_vec(self, z, u_des):
        q_x = -2.0 * jnp.einsum("kz,zw,wi->ki", z,
                                jnp.asarray(self.Qz, self.dtype),
                                jnp.asarray(self.H, self.dtype))
        q_u = -2.0 * jnp.einsum("kz,zw->kw", u_des,
                                jnp.asarray(self.R, self.dtype))
        return self.join(q_x, q_u)

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

        def stage(k, A_k, B_k):
            # diagonal block for stage k (x_k, u_k)
            Dxx = HQH + r_eq * jnp.einsum("ij,ik->jk", A_k, A_k)
            Dxx = Dxx + jnp.where(k == 0, r_eq, 0.0) * jnp.eye(nx, dtype=dt)
            Dxx = Dxx + jnp.where(k > 0, 1.0, 0.0) * (
                r_eq * jnp.eye(nx, dtype=dt) + XtX)  # from dynamics row k-1 (+I) and X row k-1
            Duu = R2 + r_eq * jnp.einsum("ij,ik->jk", B_k, B_k) + UtU
            Duu = Duu + dtd * jnp.where((k > 0) & (k < N), 1.0, 0.0) \
                + dtd * jnp.where(k < N - 1, 1.0, 0.0)
            Dxu = r_eq * jnp.einsum("ij,ik->jk", A_k, B_k)
            D = jnp.zeros((nb, nb), dt)
            D = D.at[:nx, :nx].set(Dxx)
            D = D.at[nx:, nx:].set(Duu)
            D = D.at[:nx, nx:].set(Dxu)
            D = D.at[nx:, :nx].set(Dxu.T)
            return D

        ks = jnp.arange(N)
        diag = jax.vmap(stage)(ks, Ad, Bd)

        # lower off-diagonal block L_k: coupling of stage k+1 rows with
        # stage k columns. From dynamics row k: (+I on x_{k+1}) x (-A_k on
        # x_k, -B_k on u_k) => [-rho_eq A_k, -rho_eq B_k] in the x rows; from
        # dU row k: u_{k+1} x u_k cross -dtd.
        def off(k, A_k, B_k):
            L = jnp.zeros((nb, nb), dt)
            L = L.at[:nx, :nx].set(-r_eq * A_k)
            L = L.at[:nx, nx:].set(-r_eq * B_k)
            L = L.at[nx:, nx:].set(-dtd * jnp.where(k < N - 1, 1.0, 0.0))
            return L

        lower = jax.vmap(off)(ks, Ad, Bd)

        # final stage block: x_N only (identity-padded)
        DxxN = HQH + r_eq * jnp.eye(nx, dtype=dt) + XtX
        DN = jnp.eye(nb, dtype=dt)
        DN = DN.at[:nx, :nx].set(DxxN)
        diag = jnp.concatenate([diag, DN[None]], axis=0)
        # off-diagonal between stage N-1 and N comes from dynamics row N-1:
        # already encoded in lower[N-1]'s x-row part; pad the u-cross to 0
        lowN = jnp.zeros((nb, nb), dt)
        lowN = lowN.at[:nx, :nx].set(-r_eq * Ad[N - 1])
        lowN = lowN.at[:nx, nx:].set(-r_eq * Bd[N - 1])
        lower = jnp.concatenate([lower[:-1], lowN[None]], axis=0)
        return diag, lower

    # -- interleave/deinterleave ----------------------------------------------
    def to_stages(self, w):
        nx, nu, nb, N = self.n_x, self.n_u, self.nb, self.N
        x, u = self.split(w)
        blocks = jnp.concatenate([x[:-1], u], axis=1)      # (N, nb)
        last = jnp.concatenate([x[-1], jnp.zeros(nu, self.dtype)])
        return jnp.concatenate([blocks, last[None]], axis=0)

    def from_stages(self, blocks):
        nx, nu, N = self.n_x, self.n_u, self.N
        x = jnp.concatenate([blocks[:-1, :nx], blocks[-1:, :nx]], axis=0)
        u = blocks[:-1, nx:]
        return self.join(x, u)

    # -- full solve -------------------------------------------------------------
    def solve(self, Ad, Bd, dd, x0, z, u_des=None, iters: int = 200,
              alpha: float = 1.6, w0=None, y0=None):
        """Fixed-iteration ADMM, matrix-free + structured x-step."""
        dt = self.dtype
        Ad = jnp.asarray(Ad, dt)
        Bd = jnp.asarray(Bd, dt)
        dd = jnp.asarray(dd, dt)
        x0 = jnp.asarray(x0, dt)
        z = jnp.asarray(z, dt)
        u_des = (jnp.zeros((self.N, self.n_u), dt) if u_des is None
                 else jnp.asarray(u_des, dt))
        q = self.q_vec(z, u_des)
        l, u_b = self.bounds(x0, dd)
        rho = self.rho_vec
        sigma = self.sigma

        diag, lower = self.K_blocks(Ad, Bd)
        factors = btd_factor(diag, lower)

        w = jnp.zeros(self.n_var, dt) if w0 is None else w0
        y = jnp.zeros(self.n_con, dt) if y0 is None else y0
        zc = jnp.clip(self.A_mv(Ad, Bd, w), l, u_b)

        def body(i, carry):
            w, zc, y = carry
            rhs = sigma * w - q + self.At_mv(Ad, Bd, rho * zc - y)
            rhs_blocks = self.to_stages(rhs)
            w_t = self.from_stages(btd_solve(*factors, rhs_blocks))
            z_t = self.A_mv(Ad, Bd, w_t)
            w_new = alpha * w_t + (1 - alpha) * w
            z_rel = alpha * z_t + (1 - alpha) * zc
            z_new = jnp.clip(z_rel + y / rho, l, u_b)
            y_new = y + rho * (z_rel - z_new)
            return w_new, z_new, y_new

        w, zc, y = jax.lax.fori_loop(0, iters, body, (w, zc, y))
        return w, y
