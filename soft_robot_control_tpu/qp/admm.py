"""On-device OSQP-style ADMM QP solver.

Solves   min 0.5 x'Px + q'x   s.t.  l <= Ax <= u   entirely on device,
replacing the reference's external C OSQP process behind cvxpy
(sofacontrol/scp/locp.py:60-63,181 and the polyhedron reprojection QP,
sofacontrol/utils.py:378-406).

Implements the OSQP algorithm semantics:
- ADMM splitting with over-relaxation (alpha), sigma-regularized x-step,
- per-constraint rho (equality rows l == u get 1e3 x rho, as OSQP does),
- Ruiz equilibration + cost scaling,
- adaptive rho with periodic refactorization,
- warm starting of (x, y),
- a polish step: actively-constrained KKT solve with regularization +
  iterative refinement, which delivers near-machine-precision solutions.

Everything is fixed-shape and jittable: the ADMM loop is a
`lax.while_loop`, the linear solves are dense Cholesky factorizations
(ROM-scale QPs are small-to-medium dense problems; batched instances vmap).
A future optimization is a block-tridiagonal Cholesky exploiting the MPC
banded structure; the dense path is the correctness baseline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

OSQP_RHO_EQ_SCALE = 1e3
RHO_MIN, RHO_MAX = 1e-6, 1e6


class QPSolution(NamedTuple):
    x: jnp.ndarray        # primal solution (n,)
    y: jnp.ndarray        # dual solution (m,)
    z: jnp.ndarray        # Ax at solution (m,)
    obj: jnp.ndarray      # objective value 0.5 x'Px + q'x
    pri_res: jnp.ndarray  # ||Ax - z||_inf
    dua_res: jnp.ndarray  # ||Px + q + A'y||_inf
    iters: jnp.ndarray    # ADMM iterations executed
    solved: jnp.ndarray   # bool: residuals under tolerance
    pri_sc: jnp.ndarray = jnp.asarray(1.0)  # primal residual scale (inf-norms)
    dua_sc: jnp.ndarray = jnp.asarray(1.0)  # dual residual scale


def _ruiz_equilibrate(P, q, A, iters: int = 10):
    """Ruiz equilibration of the KKT matrix [[P, A'], [A, 0]] plus OSQP cost
    scaling. Returns scaled (P, q, A) and scaling vectors (d, e, c) such that
    x = d * x_scaled, y = c^-1 e * y_scaled... following the OSQP paper.
    """
    n, m = P.shape[0], A.shape[0]
    d = jnp.ones(n, dtype=P.dtype)
    e = jnp.ones(m, dtype=P.dtype)
    c = jnp.asarray(1.0, dtype=P.dtype)

    def body(i, carry):
        P, q, A, d, e, c = carry
        # column inf-norms of the scaled KKT
        col_x = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                            jnp.max(jnp.abs(A), axis=0) if m > 0 else 0.0)
        col_y = jnp.max(jnp.abs(A), axis=1) if m > 0 else jnp.zeros(0, P.dtype)
        # zero-norm rows/cols (e.g. a vacuous constraint row) stay
        # unscaled: 1/sqrt(eps) compounds each iteration and overflows
        # the accumulated e in f32 (OSQP clamps scalings the same way)
        dd = jnp.where(col_x > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(col_x, 1e-12)), 1.0)
        ee = jnp.where(col_y > 1e-12,
                       1.0 / jnp.sqrt(jnp.maximum(col_y, 1e-12)), 1.0)
        P = P * dd[:, None] * dd[None, :]
        q = q * dd
        A = A * ee[:, None] * dd[None, :]
        d = d * dd
        e = e * ee
        # cost scaling
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.max(jnp.abs(P), axis=0)),
                        jnp.max(jnp.abs(q))), 1e-12)
        P = P * gamma
        q = q * gamma
        c = c * gamma
        return P, q, A, d, e, c

    P, q, A, d, e, c = jax.lax.fori_loop(0, iters, body, (P, q, A, d, e, c))
    return P, q, A, d, e, c


def _polish(P, q, A, l, u, x, y, z, delta=1e-7, refine_steps: int = 3):
    """OSQP-style solution polishing.

    Guess the active set from the ADMM duals (y<0 -> lower active,
    y>0 -> upper active), then solve the equality-constrained KKT with the
    inactive multipliers pinned to zero, via a masked Schur complement +
    iterative refinement. Fixed shapes throughout.
    """
    n, m = P.shape[0], A.shape[0]
    low_active = y < 0
    up_active = y > 0
    active = low_active | up_active
    mask = active.astype(P.dtype)
    b = jnp.where(low_active, l, jnp.where(up_active, u, 0.0))
    # guard: rows with infinite b can't be active
    finite = jnp.isfinite(b)
    mask = mask * finite.astype(P.dtype)
    b = jnp.where(finite, b, 0.0)

    H = P + delta * jnp.eye(n, dtype=P.dtype)
    Hc = jax.scipy.linalg.cho_factor(H)
    W = jax.scipy.linalg.cho_solve(Hc, A.T)           # H^-1 A'   (n, m)
    G = A @ W                                          # A H^-1 A' (m, m)
    M = mask[:, None] * mask[None, :] * G + jnp.diag(1.0 - mask + delta * mask)
    rhs_nu = mask * (A @ jax.scipy.linalg.cho_solve(Hc, -q) - b)
    nu = jnp.linalg.solve(M, rhs_nu)
    x_p = jax.scipy.linalg.cho_solve(Hc, -q - A.T @ nu)

    # iterative refinement on the *unregularized* masked KKT:
    #   [P  A_act'] [x ]   [-q   ]
    #   [A_act  0 ] [nu] = [b_act]
    # corrections are solved with the regularized factorizations (Hc, M);
    # inactive nu entries stay exactly 0 through the refinement.
    def refine(_, xv):
        x_p, nu = xv
        r1 = -q - P @ x_p - A.T @ (mask * nu)
        r2 = mask * (b - A @ x_p)
        dx0 = jax.scipy.linalg.cho_solve(Hc, r1)
        dnu = jnp.linalg.solve(M, mask * (A @ dx0) - r2)
        dx = dx0 - jax.scipy.linalg.cho_solve(Hc, A.T @ (mask * dnu))
        return x_p + dx, nu + dnu

    x_p, nu = jax.lax.fori_loop(0, refine_steps, refine, (x_p, nu))
    y_p = mask * nu
    z_p = jnp.clip(A @ x_p, l, u)
    return x_p, y_p, z_p


class _ADMMCarry(NamedTuple):
    x: jnp.ndarray
    z: jnp.ndarray
    y: jnp.ndarray
    rho: jnp.ndarray        # scalar rho (per-constraint = rho * eq_scale)
    chol: jnp.ndarray       # cholesky factor of P + sigma I + A' diag(rhov) A
    it: jnp.ndarray
    pri_res: jnp.ndarray
    dua_res: jnp.ndarray
    done: jnp.ndarray


def solve_qp_dense(P, q, A, l, u,
                   x0: Optional[jnp.ndarray] = None,
                   y0: Optional[jnp.ndarray] = None,
                   rho: float = 0.1, sigma: float = 1e-6, alpha: float = 1.6,
                   eps_abs: float = 1e-8, eps_rel: float = 1e-8,
                   max_iter: int = 4000, check_every: int = 25,
                   polish: bool = True, adaptive_rho: bool = True,
                   rho_every: int = 200,
                   scaling_iters: int = 10,
                   x_solver: str = "auto") -> QPSolution:
    """Solve the QP with OSQP semantics. All args dense; jittable; warm-start
    via (x0, y0). Defaults target 1e-8 residuals (tighter than OSQP's 1e-3
    because downstream parity tests demand 1e-6 trajectories).

    x_solver picks the per-iteration x-step linear solve:
    - 'chol': Cholesky factor + cho_solve. Best on CPU, but the triangular
      substitution sequentializes on TPU and dominates latency (measured:
      the trunk campaign's 400-var condensed LOCP spent ~300 ms in 225
      iterations of cho_solve(401)).
    - 'kinv': explicit K^-1 (Jacobi-scaled blocked Cholesky + blocked
      triangular inverse + one Newton step, qp/blocked.py) so every
      iteration is one MXU matmul. Same accuracy at the solver's residual
      targets; refactorization on rho updates rebuilds K^-1.
    - 'auto' (default): 'kinv' on TPU, 'chol' elsewhere.

    Traced under HIGHEST matmul precision: TPU's default f32 matmul runs
    bf16 passes, which stalls ADMM on badly-scaled QPs (the trunk campaign's
    N=50 x 8-cable condensed LOCP failed on TPU while the same f32 problem
    solved on CPU). These QPs are small, so the MXU cost is irrelevant."""
    if x_solver == "auto":
        x_solver = "kinv" if jax.default_backend() == "tpu" else "chol"
    with jax.default_matmul_precision("highest"):
        return _solve_qp_dense_impl(
            P, q, A, l, u, x0=x0, y0=y0, rho=rho, sigma=sigma, alpha=alpha,
            eps_abs=eps_abs, eps_rel=eps_rel, max_iter=max_iter,
            check_every=check_every, polish=polish,
            adaptive_rho=adaptive_rho, rho_every=rho_every,
            scaling_iters=scaling_iters, x_solver=x_solver)


@partial(jax.jit, static_argnames=("max_iter", "check_every", "polish",
                                   "adaptive_rho", "scaling_iters",
                                   "x_solver"))
def _solve_qp_dense_impl(P, q, A, l, u,
                         x0: Optional[jnp.ndarray] = None,
                         y0: Optional[jnp.ndarray] = None,
                         rho: float = 0.1, sigma: float = 1e-6,
                         alpha: float = 1.6,
                         eps_abs: float = 1e-8, eps_rel: float = 1e-8,
                         max_iter: int = 4000, check_every: int = 25,
                         polish: bool = True, adaptive_rho: bool = True,
                         rho_every: int = 200,
                         scaling_iters: int = 10,
                         x_solver: str = "chol") -> QPSolution:
    dtype = P.dtype
    n, m = P.shape[0], A.shape[0]
    P0, q0, A0, l0, u0 = P, q, A, l, u

    # --- scaling ---------------------------------------------------------
    if scaling_iters > 0:
        P, q, A, d_vec, e_vec, c_cost = _ruiz_equilibrate(P, q, A, scaling_iters)
        l = e_vec * l0
        u = e_vec * u0
    else:
        d_vec = jnp.ones(n, dtype)
        e_vec = jnp.ones(m, dtype)
        c_cost = jnp.asarray(1.0, dtype)

    eq = jnp.isfinite(l) & jnp.isfinite(u) & (jnp.abs(u - l) <= 1e-14 * (1 + jnp.abs(u)))
    rho_scale = jnp.where(eq, OSQP_RHO_EQ_SCALE, 1.0)

    use_kinv = x_solver == "kinv"

    def factor(rho_s):
        rhov = rho_s * rho_scale
        if use_kinv:
            from soft_robot_control_tpu.qp.blocked import make_kinv
            return make_kinv(P, A, rhov, sigma=sigma)
        K = P + sigma * jnp.eye(n, dtype=dtype) + (A.T * rhov[None, :]) @ A
        return jnp.linalg.cholesky(K)

    # --- initial point ---------------------------------------------------
    x = jnp.zeros(n, dtype) if x0 is None else x0 / d_vec
    y = jnp.zeros(m, dtype) if y0 is None else c_cost * y0 / e_vec
    z = jnp.clip(A @ x, l, u)
    rho0 = jnp.asarray(rho, dtype)
    chol0 = factor(rho0)

    inf = jnp.asarray(jnp.inf, dtype)
    carry0 = _ADMMCarry(x, z, y, rho0, chol0, jnp.asarray(0), inf, inf,
                        jnp.asarray(False))

    def unscaled_residuals(x, z, y):
        """Residuals in the original problem's units (OSQP sec 5.1)."""
        x_u = d_vec * x
        z_u = z / e_vec
        y_u = e_vec * y / c_cost
        Ax = A0 @ x_u
        pri = jnp.max(jnp.abs(Ax - z_u)) if m > 0 else jnp.asarray(0.0, dtype)
        pri_sc = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z_u))) if m > 0 else 1.0
        Px = P0 @ x_u
        Aty = A0.T @ y_u if m > 0 else 0.0
        dua = jnp.max(jnp.abs(Px + q0 + Aty))
        dua_sc = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Px)),
                                         jnp.max(jnp.abs(Aty))),
                             jnp.max(jnp.abs(q0)))
        return pri, pri_sc, dua, dua_sc

    def cond(c: _ADMMCarry):
        return (c.it < max_iter) & (~c.done)

    def body(c: _ADMMCarry):
        rhov = c.rho * rho_scale
        rhs = sigma * c.x - q + A.T @ (rhov * c.z - c.y)
        if use_kinv:
            x_t = c.chol @ rhs
        else:
            x_t = jax.scipy.linalg.cho_solve((c.chol, True), rhs)
        z_t = A @ x_t
        x_new = alpha * x_t + (1 - alpha) * c.x
        z_rel = alpha * z_t + (1 - alpha) * c.z
        z_new = jnp.clip(z_rel + c.y / rhov, l, u)
        y_new = c.y + rhov * (z_rel - z_new)
        it = c.it + 1

        def check(_):
            pri, pri_sc, dua, dua_sc = unscaled_residuals(x_new, z_new, y_new)
            done = (pri <= eps_abs + eps_rel * pri_sc) & \
                   (dua <= eps_abs + eps_rel * dua_sc)
            if adaptive_rho:
                # rho acts in the Ruiz-SCALED space, so the balance ratio
                # must use scaled residuals (OSQP sec 5.2), and adaptation
                # must be RARE (OSQP's adaptive_rho_interval ~ 200):
                # re-balancing every termination check sets up a rho limit
                # cycle on slack-epigraph QPs (rho 0.6 -> 1e-3 -> 1e-6 with
                # the slack exploding to +-1e4, observed on the condensed
                # trust-region LOCP).
                Ax_s = A @ x_new
                pri_s = jnp.max(jnp.abs(Ax_s - z_new))
                pri_s_sc = jnp.maximum(jnp.max(jnp.abs(Ax_s)),
                                       jnp.max(jnp.abs(z_new)))
                Px_s = P @ x_new
                Aty_s = A.T @ y_new
                dua_s = jnp.max(jnp.abs(Px_s + q + Aty_s))
                dua_s_sc = jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(Px_s)),
                                jnp.max(jnp.abs(Aty_s))),
                    jnp.max(jnp.abs(q)))
                ratio = jnp.sqrt((pri_s / jnp.maximum(pri_s_sc, 1e-12))
                                 / jnp.maximum(dua_s / jnp.maximum(dua_s_sc, 1e-12), 1e-18))
                rho_new = jnp.clip(c.rho * ratio, RHO_MIN, RHO_MAX)
                update = ((rho_new > 5.0 * c.rho) | (rho_new < c.rho / 5.0)) \
                    & ((it % rho_every) == 0)
                rho_new = jnp.where(update, rho_new, c.rho)
                chol_new = jax.lax.cond(update, lambda r: factor(r),
                                        lambda r: c.chol, rho_new)
            else:
                rho_new, chol_new = c.rho, c.chol
            return rho_new, chol_new, pri, dua, done

        def skip(_):
            return c.rho, c.chol, c.pri_res, c.dua_res, jnp.asarray(False)

        rho_new, chol_new, pri, dua, done = jax.lax.cond(
            (it % check_every) == 0, check, skip, None)
        return _ADMMCarry(x_new, z_new, y_new, rho_new, chol_new, it, pri,
                          dua, done)

    cf = jax.lax.while_loop(cond, body, carry0)

    # --- unscale ----------------------------------------------------------
    x_u = d_vec * cf.x
    y_u = e_vec * cf.y / c_cost
    z_u = cf.z / e_vec

    if polish:
        # polish in the Ruiz-equilibrated space (well-conditioned even when
        # the original P is nearly singular, e.g. tiny control costs), then
        # unscale the candidate
        x_ps, y_ps, z_ps = _polish(P, q, A, l, u, cf.x, cf.y, cf.z)
        x_p = d_vec * x_ps
        y_p = e_vec * y_ps / c_cost
        z_p = z_ps / e_vec

        # accept polish iff it reduces the worst-case KKT residual (unscaled)
        def kkt_res(x, y, z):
            pri = jnp.maximum(jnp.max(A0 @ x - u0), jnp.max(l0 - A0 @ x))
            pri = jnp.maximum(pri, 0.0)
            dua = jnp.max(jnp.abs(P0 @ x + q0 + A0.T @ y))
            return jnp.maximum(pri, dua)

        better = kkt_res(x_p, y_p, z_p) < kkt_res(x_u, y_u, z_u)
        x_u = jnp.where(better, x_p, x_u)
        y_u = jnp.where(better, y_p, y_u)
        z_u = jnp.where(better, z_p, z_u)

    pri, pri_sc, dua, dua_sc = _final_residuals(P0, q0, A0, x_u, y_u, z_u)
    solved = (pri <= eps_abs + eps_rel * pri_sc) & (dua <= eps_abs + eps_rel * dua_sc)
    obj = 0.5 * x_u @ (P0 @ x_u) + q0 @ x_u
    return QPSolution(x_u, y_u, z_u, obj, pri, dua, cf.it, solved,
                      pri_sc, dua_sc)


def _final_residuals(P0, q0, A0, x, y, z):
    dtype = P0.dtype
    m = A0.shape[0]
    Ax = A0 @ x
    pri = jnp.max(jnp.abs(Ax - z)) if m > 0 else jnp.asarray(0.0, dtype)
    pri_sc = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(z))) if m > 0 else jnp.asarray(1.0, dtype)
    Px = P0 @ x
    Aty = A0.T @ y if m > 0 else 0.0
    dua = jnp.max(jnp.abs(Px + q0 + Aty))
    dua_sc = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
                         jnp.max(jnp.abs(q0)))
    return pri, pri_sc, dua, dua_sc
