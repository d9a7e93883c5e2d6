"""QP solver tests: KKT optimality to high accuracy on random QPs (with
equality rows, boxes, and one-sided constraints), warm starting, and a
scipy SLSQP cross-check oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from soft_robot_control_tpu.qp.admm import solve_qp_dense


def _random_qp(n=12, m=18, n_eq=4, seed=0, psd_rank=None):
    rng = np.random.default_rng(seed)
    Ph = rng.normal(size=(n, psd_rank or n))
    P = Ph @ Ph.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.3
    margin = rng.uniform(0.1, 1.0, size=m)
    u = A @ x_feas + margin
    l = A @ x_feas - margin
    # make first n_eq rows equalities
    l[:n_eq] = u[:n_eq] = (A @ x_feas)[:n_eq]
    # make a few rows one-sided
    l[n_eq:n_eq + 3] = -np.inf
    return P, q, A, l, u


def _kkt_check(P, q, A, l, u, sol, tol=1e-6):
    x, y = np.asarray(sol.x), np.asarray(sol.y)
    # primal feasibility
    Ax = A @ x
    assert np.max(Ax - u) <= tol, f"upper violation {np.max(Ax - u)}"
    assert np.max(l - Ax) <= tol, f"lower violation {np.max(l - Ax)}"
    # stationarity
    sta = P @ x + q + A.T @ y
    assert np.max(np.abs(sta)) <= tol, f"stationarity {np.max(np.abs(sta))}"
    # dual signs & complementary slackness (inequality rows only)
    eq = np.isfinite(l) & np.isfinite(u) & (u - l < 1e-12)
    for i in range(A.shape[0]):
        if eq[i]:
            continue
        if y[i] > tol:  # upper active
            assert u[i] - Ax[i] <= 1e-5
        elif y[i] < -tol:  # lower active
            assert Ax[i] - l[i] <= 1e-5


@pytest.mark.parametrize("seed", range(5))
def test_qp_kkt_optimality(seed):
    P, q, A, l, u = _random_qp(seed=seed)
    sol = solve_qp_dense(jnp.array(P), jnp.array(q), jnp.array(A),
                         jnp.array(l), jnp.array(u))
    assert bool(sol.solved)
    _kkt_check(P, q, A, l, u, sol)


def test_qp_matches_slsqp_oracle():
    P, q, A, l, u = _random_qp(n=8, m=12, n_eq=2, seed=42)
    sol = solve_qp_dense(jnp.array(P), jnp.array(q), jnp.array(A),
                         jnp.array(l), jnp.array(u))

    # scipy oracle
    cons = []
    for i in range(A.shape[0]):
        if np.isfinite(u[i]):
            cons.append({"type": "ineq", "fun": lambda x, i=i: u[i] - A[i] @ x,
                         "jac": lambda x, i=i: -A[i]})
        if np.isfinite(l[i]):
            cons.append({"type": "ineq", "fun": lambda x, i=i: A[i] @ x - l[i],
                         "jac": lambda x, i=i: A[i]})
    res = minimize(lambda x: 0.5 * x @ P @ x + q @ x, np.zeros(len(q)),
                   jac=lambda x: P @ x + q, constraints=cons, method="SLSQP",
                   options={"maxiter": 500, "ftol": 1e-14})
    assert res.success
    np.testing.assert_allclose(np.asarray(sol.x), res.x, atol=2e-6)
    np.testing.assert_allclose(float(sol.obj), res.fun, atol=1e-8)


def test_qp_equality_only():
    """Pure equality-constrained QP has the closed-form KKT solution."""
    rng = np.random.default_rng(3)
    n, m = 10, 4
    Ph = rng.normal(size=(n, n))
    P = Ph @ Ph.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    sol = solve_qp_dense(jnp.array(P), jnp.array(q), jnp.array(A),
                         jnp.array(b), jnp.array(b))
    KKT = np.block([[P, A.T], [A, np.zeros((m, m))]])
    xy = np.linalg.solve(KKT, np.concatenate([-q, b]))
    np.testing.assert_allclose(np.asarray(sol.x), xy[:n], atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.y), xy[n:], atol=1e-6)


def test_qp_warm_start_fewer_iterations():
    P, q, A, l, u = _random_qp(seed=7)
    sol1 = solve_qp_dense(jnp.array(P), jnp.array(q), jnp.array(A),
                          jnp.array(l), jnp.array(u))
    # perturb q slightly and warm start
    q2 = q + 1e-3
    sol2 = solve_qp_dense(jnp.array(P), jnp.array(q2), jnp.array(A),
                          jnp.array(l), jnp.array(u), x0=sol1.x, y0=sol1.y)
    sol2_cold = solve_qp_dense(jnp.array(P), jnp.array(q2), jnp.array(A),
                               jnp.array(l), jnp.array(u))
    assert bool(sol2.solved)
    assert int(sol2.iters) <= int(sol2_cold.iters)


def test_qp_badly_scaled():
    """Ruiz equilibration should handle 1e6 scale spread."""
    rng = np.random.default_rng(11)
    n = 6
    scales = 10.0 ** np.linspace(-3, 3, n)
    Ph = rng.normal(size=(n, n))
    P = np.diag(scales) @ (Ph @ Ph.T + 0.1 * np.eye(n)) @ np.diag(scales)
    q = rng.normal(size=n) * scales
    A = np.eye(n)
    l = -np.abs(rng.normal(size=n)) * scales
    u = np.abs(rng.normal(size=n)) * scales
    sol = solve_qp_dense(jnp.array(P), jnp.array(q), jnp.array(A),
                         jnp.array(l), jnp.array(u))
    x_unc = np.linalg.solve(P, -q)
    x_exp = np.clip(x_unc, l, u)
    # box-constrained diagonal-A problem: coordinate-wise optimality check
    g = P @ np.asarray(sol.x) + q
    for i in range(n):
        xi = float(sol.x[i])
        if abs(xi - l[i]) < 1e-9 * max(1, abs(l[i])):
            assert g[i] >= -1e-5 * max(1.0, np.abs(g).max())
        elif abs(xi - u[i]) < 1e-9 * max(1, abs(u[i])):
            assert g[i] <= 1e-5 * max(1.0, np.abs(g).max())
        else:
            assert abs(g[i]) <= 1e-4 * max(1.0, np.abs(g).max())


def test_qp_vacuous_zero_row_f32():
    """A zero constraint row (the condensed LOCP's unconstrained
    placeholder) must not blow up the Ruiz scaling: 1/sqrt(eps) compounded
    per iteration overflows the accumulated row scale in float32 and turned
    every unconstrained ROMPC linear-MPC solve into NaN duals."""
    rng = np.random.default_rng(5)
    n = 8
    Ph = rng.normal(size=(n, n)).astype(np.float32)
    P = Ph @ Ph.T + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=n).astype(np.float32)
    A = np.zeros((1, n), dtype=np.float32)
    l = np.full(1, -1e30, dtype=np.float32)
    u = np.full(1, 1e30, dtype=np.float32)
    sol = solve_qp_dense(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         eps_abs=1e-5, eps_rel=1e-5)
    x = np.asarray(sol.x)
    assert np.isfinite(x).all()
    assert np.isfinite(float(sol.dua_res))
    x_unc = np.linalg.solve(np.asarray(P, np.float64), -np.asarray(q, np.float64))
    np.testing.assert_allclose(x, x_unc, atol=5e-4)


def test_qp_kinv_x_solver_matches_chol():
    """x_solver='kinv' (explicit refined K^-1, the TPU mode where
    per-iteration triangular solves sequentialize) must reach the same
    solution as the Cholesky x-step on a constrained and a box QP."""
    rng = np.random.default_rng(11)
    n, m = 40, 60
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    l = -np.ones(m)
    u = np.ones(m)
    s_chol = solve_qp_dense(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                            jnp.asarray(l), jnp.asarray(u), x_solver="chol")
    s_kinv = solve_qp_dense(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                            jnp.asarray(l), jnp.asarray(u), x_solver="kinv")
    assert bool(s_chol.solved) and bool(s_kinv.solved)
    np.testing.assert_allclose(np.asarray(s_kinv.x), np.asarray(s_chol.x),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(s_kinv.obj), float(s_chol.obj),
                               rtol=1e-8, atol=1e-9)
