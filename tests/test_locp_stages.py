"""Block-sparse long-horizon LOCP: exact agreement with the dense path
(matrix-free A ops, analytic K blocks, structured ADMM), then the N=200
Diamond-scale open-loop problem that the dense path cannot assemble."""

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import admm_fixed
from soft_robot_control_tpu.core.constraints import HyperRectangle
from soft_robot_control_tpu.scp.locp import LOCPParams, LOCPSpec
from soft_robot_control_tpu.scp.locp_stages import StageLOCP
from soft_robot_control_tpu.qp.admm import OSQP_RHO_EQ_SCALE


def _problem(N=8, nx=5, nu=2, nz=2, seed=0, with_sets=True):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(nz, nx))
    Qz = np.diag(rng.uniform(0.5, 2.0, nz))
    R = np.diag(rng.uniform(0.05, 0.2, nu))
    U = HyperRectangle(np.ones(nu), -np.ones(nu)) if with_sets else None
    dU = HyperRectangle(0.3 * np.ones(nu), -0.3 * np.ones(nu)) if with_sets else None
    X = HyperRectangle(2 * np.ones(nx), -2 * np.ones(nx)) if with_sets else None
    Ad = rng.normal(size=(N, nx, nx)) * 0.3 + 0.7 * np.eye(nx)
    Bd = rng.normal(size=(N, nx, nu))
    dd = 0.05 * rng.normal(size=(N, nx))
    x0 = rng.normal(size=nx) * 0.3
    z = rng.normal(size=(N + 1, nz))
    return H, Qz, R, U, dU, X, Ad, Bd, dd, x0, z


@pytest.mark.parametrize("with_sets", [False, True])
def test_stage_locp_matches_dense(with_sets):
    N, nx, nu, nz = 8, 5, 2, 2
    H, Qz, R, U, dU, X, Ad, Bd, dd, x0, z = _problem(with_sets=with_sets)

    dense = LOCPSpec(N, H, Qz, R, U=U, dU=dU, X=X, is_tr_active=False)
    params = LOCPParams(
        Ad=jnp.array(Ad), Bd=jnp.array(Bd), dd=jnp.array(dd),
        x0=jnp.array(x0), xk=jnp.zeros((N + 1, nx)), delta=jnp.array(0.0),
        omega=jnp.array(0.0), z=jnp.array(z), zf=jnp.zeros(nz),
        u_des=jnp.zeros((N, nu)), Hd=jnp.zeros((N + 1, nz, nx)),
        cd=jnp.zeros((N + 1, nz)))
    P, q, A, l, u, _ = dense.assemble(params)

    stage = StageLOCP(N, H, Qz, R, U=U, dU=dU, X=X)

    # --- matrix-free ops agree with the dense matrices
    rng = np.random.default_rng(1)
    w = jnp.array(rng.normal(size=dense.n_var))
    v = jnp.array(rng.normal(size=dense.n_con))
    np.testing.assert_allclose(np.asarray(stage.A_mv(jnp.array(Ad), jnp.array(Bd), w)),
                               np.asarray(A) @ np.asarray(w), atol=1e-10)
    np.testing.assert_allclose(np.asarray(stage.At_mv(jnp.array(Ad), jnp.array(Bd), v)),
                               np.asarray(A).T @ np.asarray(v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(stage.P_mv(w)),
                               np.asarray(P) @ np.asarray(w), atol=1e-10)
    np.testing.assert_allclose(np.asarray(stage.q_vec(jnp.array(z),
                                                      jnp.zeros((N, nu)))),
                               np.asarray(q), atol=1e-10)
    lb, ub = stage.bounds(jnp.array(x0), jnp.array(dd))
    np.testing.assert_allclose(np.asarray(lb), np.asarray(l))
    np.testing.assert_allclose(np.asarray(ub), np.asarray(u))

    # --- K blocks reproduce the dense K in interleaved order
    rho_np = np.full(dense.n_con, 0.1)
    rho_np[dense.r_init:dense.r_init + nx] *= OSQP_RHO_EQ_SCALE
    rho_np[dense.r_dyn:dense.r_dyn + N * nx] *= OSQP_RHO_EQ_SCALE
    K = np.asarray(P) + 1e-6 * np.eye(dense.n_var) + \
        (np.asarray(A).T * rho_np[None, :]) @ np.asarray(A)
    from soft_robot_control_tpu.qp.structured import stage_permutation

    perm = stage_permutation(N, nx, nu)
    Kp = K[perm][:, perm]
    diag, lower = stage.K_blocks(jnp.array(Ad), jnp.array(Bd))
    nb = nx + nu
    for k in range(N):
        np.testing.assert_allclose(np.asarray(diag[k]),
                                   Kp[k * nb:(k + 1) * nb, k * nb:(k + 1) * nb],
                                   atol=1e-9, err_msg=f"diag {k}")
        if k >= 1:
            np.testing.assert_allclose(
                np.asarray(lower[k - 1]),
                Kp[k * nb:(k + 1) * nb, (k - 1) * nb:k * nb], atol=1e-9,
                err_msg=f"lower {k - 1}")
    np.testing.assert_allclose(np.asarray(diag[N][:nx, :nx]),
                               Kp[N * nb:, N * nb:], atol=1e-9)
    np.testing.assert_allclose(np.asarray(lower[N - 1][:nx, :]),
                               Kp[N * nb:, (N - 1) * nb:N * nb], atol=1e-9)

    # --- full ADMM agreement
    w0 = jnp.zeros(dense.n_var)
    y0 = jnp.zeros(dense.n_con)
    w_dense, y_dense = admm_fixed(P, q, A, l, u, w0, y0,
                                  jnp.asarray(rho_np), 150)
    w_stage, y_stage = stage.solve(Ad, Bd, dd, x0, z, iters=150)
    np.testing.assert_allclose(np.asarray(w_stage), np.asarray(w_dense),
                               atol=1e-8)


@pytest.mark.slow
def test_stage_locp_long_horizon_diamond_scale():
    """N=200 at Diamond scale (nx=42): assembles and solves without dense
    templates; the solution satisfies the stage dynamics and bounds."""
    N, nx, nu, nz = 200, 42, 4, 6
    rng = np.random.default_rng(2)
    H = rng.normal(size=(nz, nx)) * 0.3
    Qz = np.eye(nz)
    R = 1e-2 * np.eye(nu)
    U = HyperRectangle(np.ones(nu), np.zeros(nu))
    # stable stage dynamics
    Ad = np.tile(0.97 * np.eye(nx), (N, 1, 1)) \
        + 0.01 * rng.normal(size=(N, nx, nx))
    Bd = 0.05 * rng.normal(size=(N, nx, nu))
    dd = 0.001 * rng.normal(size=(N, nx))
    x0 = 0.1 * rng.normal(size=nx)
    z = 0.2 * rng.normal(size=(N + 1, nz))

    stage = StageLOCP(N, H, Qz, R, U=U)
    w, y = stage.solve(Ad, Bd, dd, x0, z, iters=300)
    x_sol, u_sol = [np.asarray(a) for a in stage.split(w)[:2]]
    assert np.all(np.isfinite(x_sol))
    np.testing.assert_allclose(x_sol[0], x0, atol=1e-5)
    for k in range(0, N, 37):
        np.testing.assert_allclose(
            x_sol[k + 1], Ad[k] @ x_sol[k] + Bd[k] @ u_sol[k] + dd[k],
            atol=1e-4)
    assert np.all(u_sol >= -1e-5) and np.all(u_sol <= 1 + 1e-5)


def test_stage_locp_trust_region_matches_dense():
    """TR-on agreement: the slack-extended stage blocks reproduce the dense
    LOCPSpec (is_tr_active=True) ADMM solution exactly."""
    N, nx, nu, nz = 6, 4, 2, 2
    H, Qz, R, U, dU, X, Ad, Bd, dd, x0, z = _problem(N=N, nx=nx, nu=nu,
                                                     with_sets=True, seed=4)
    x_char = np.abs(np.random.default_rng(5).normal(size=nx)) + 0.5
    dense = LOCPSpec(N, H, Qz, R, U=U, dU=dU, X=X, is_tr_active=True,
                     x_char=x_char)
    rng = np.random.default_rng(6)
    xk = 0.2 * rng.normal(size=(N + 1, nx))
    delta, omega = 0.8, 2.0
    params = LOCPParams(
        Ad=jnp.array(Ad), Bd=jnp.array(Bd), dd=jnp.array(dd),
        x0=jnp.array(x0), xk=jnp.array(xk), delta=jnp.array(delta),
        omega=jnp.array(omega), z=jnp.array(z), zf=jnp.zeros(nz),
        u_des=jnp.zeros((N, nu)), Hd=jnp.zeros((N + 1, nz, nx)),
        cd=jnp.zeros((N + 1, nz)))
    P, q, A, l, u, _ = dense.assemble(params)
    rho_np = np.full(dense.n_con, 0.1)
    rho_np[dense.r_init:dense.r_init + nx] *= OSQP_RHO_EQ_SCALE
    rho_np[dense.r_dyn:dense.r_dyn + N * nx] *= OSQP_RHO_EQ_SCALE

    stage = StageLOCP(N, H, Qz, R, U=U, dU=dU, X=X, trust_region=True,
                      x_char=x_char)
    assert stage.n_var == dense.n_var and stage.n_con == dense.n_con

    # matrix-free op agreement
    w = jnp.array(rng.normal(size=dense.n_var))
    v = jnp.array(rng.normal(size=dense.n_con))
    np.testing.assert_allclose(
        np.asarray(stage.A_mv(jnp.array(Ad), jnp.array(Bd), w)),
        np.asarray(A) @ np.asarray(w), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(stage.At_mv(jnp.array(Ad), jnp.array(Bd), v)),
        np.asarray(A).T @ np.asarray(v), atol=1e-10)
    lb, ub = stage.bounds(jnp.array(x0), jnp.array(dd),
                          delta=jnp.array(delta), xk=jnp.array(xk))
    np.testing.assert_allclose(np.asarray(lb), np.asarray(l))
    np.testing.assert_allclose(np.asarray(ub), np.asarray(u))
    np.testing.assert_allclose(
        np.asarray(stage.q_vec(jnp.array(z), jnp.zeros((N, nu)),
                               omega=jnp.array(omega))),
        np.asarray(q), atol=1e-10)

    # full ADMM agreement
    w0 = jnp.zeros(dense.n_var)
    y0 = jnp.zeros(dense.n_con)
    w_dense, _ = admm_fixed(P, q, A, l, u, w0, y0, jnp.asarray(rho_np), 150)
    w_stage, _ = stage.solve(Ad, Bd, dd, x0, z, iters=150, delta=delta,
                             omega=omega, xk=xk)
    np.testing.assert_allclose(np.asarray(w_stage), np.asarray(w_dense),
                               atol=1e-8)


def test_gusto_with_stage_backend_matches_dense_backend():
    """Host GuSTO over the stage backend lands on the same solution as the
    dense backend (Dubins, constrained)."""
    from soft_robot_control_tpu.models.dubins import DubinsCar
    from soft_robot_control_tpu.scp.gusto import GuSTO

    model = DubinsCar()
    N, dt = 30, 0.1
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(2)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    z_tgt = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))

    g_dense = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z_tgt, U=U,
                    verbose=0, warm_start=True)
    x_d, u_d, _, _ = g_dense.get_solution()
    g_stage = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z_tgt, U=U,
                    verbose=0, warm_start=True, locp_backend="stage",
                    iters=600)
    x_s, u_s, _, _ = g_stage.get_solution()

    # SCP on the nonconvex Dubins car may land on different local optima;
    # demand comparable solution quality and feasibility instead
    def true_cost(x, u):
        J = 0.0
        for k in range(N + 1):
            r = x[k] - z_tgt[k]
            J += r @ Qz @ r
        for k in range(N):
            J += u[k] @ R @ u[k]
        return J

    assert true_cost(x_s, u_s) <= 1.1 * true_cost(x_d, u_d)
    assert np.all(u_s[:, 0] >= -1e-5) and np.all(u_s[:, 0] <= 1 + 1e-5)
    x_roll = np.asarray(model.rollout(x0, u_s, dt))
    assert np.linalg.norm(x_roll[-1, :2] - x_s[-1, :2]) < 0.15


@pytest.mark.slow
def test_gusto_long_horizon_stage_backend():
    """Full GuSTO at N=200 (the reference's open-loop trajopt horizon,
    examples/hardware/diamond.py:471) through the block-sparse backend."""
    from soft_robot_control_tpu.models.dubins import DubinsCar
    from soft_robot_control_tpu.scp.standalone import run_gusto_standalone

    model = DubinsCar()
    N, dt = 200, 0.05
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.05 * np.eye(2)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    # moving target: straight line to (4, 2)
    t = dt * np.arange(N + 1)
    z = np.zeros((N + 1, 3))
    z[:, 0] = 4.0 * t / t[-1]
    z[:, 1] = 2.0 * t / t[-1]
    x0 = np.zeros(3)
    # N=200 ADMM needs more iterations to pass the acceptance residuals
    xopt, uopt, zopt, topt, gusto = run_gusto_standalone(
        model, N, dt, Qz, R, x0, z=z, U=U, locp_backend="stage", iters=2000,
        max_gusto_iters=10)
    assert np.all(np.isfinite(xopt))
    # end of trajectory near the end of the target line
    assert np.linalg.norm(xopt[-1, :2] - [4.0, 2.0]) < 0.6, xopt[-1]
    assert np.all(uopt[:, 0] >= -1e-5) and np.all(uopt[:, 0] <= 1 + 1e-5)


def test_condensed_terminal_cost_matches_dense():
    """CondensedLOCPAdapter with Qzf reproduces the sparse LOCP optimum
    including the terminal (H x_N + c_N - zf)' Qzf (...) term
    (locp.py:14,275-304)."""
    from soft_robot_control_tpu.scp.locp import LOCP
    from soft_robot_control_tpu.scp.locp_condensed import CondensedLOCPAdapter

    N, nx, nu, nz = 8, 5, 2, 2
    H, Qz, R, U, dU, X, Ad, Bd, dd, x0, z = _problem(with_sets=False)
    U = HyperRectangle(np.ones(nu), -np.ones(nu))
    Qzf = np.diag([3.0, 7.0])
    rng = np.random.default_rng(9)
    zf = rng.normal(size=nz)

    xk = np.zeros((N + 1, nx))
    dense = LOCP(N, H, Qz, R, Qzf=Qzf, U=U, is_tr_active=False,
                 warm_start=False)
    dense.update(Ad, Bd, dd, x0, xk, 0.0, 0.0, z=z, zf=zf)
    Jd, okd, _ = dense.solve()
    xd, ud, _ = dense.get_solution()

    cond = CondensedLOCPAdapter(N, H, Qz, R, Qzf=Qzf, U=U,
                                is_tr_active=False, warm_start=False)
    cond.update(Ad, Bd, dd, x0, xk, 0.0, 0.0, z=z, zf=zf)
    Jc, okc, _ = cond.solve()
    xc, uc, _ = cond.get_solution()

    assert okd and okc
    np.testing.assert_allclose(Jc, Jd, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(uc), np.asarray(ud), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xc), np.asarray(xd), atol=2e-5)
