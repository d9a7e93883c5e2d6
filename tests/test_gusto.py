"""GuSTO SCP tests: the analytic Dubins-car regression case (mirroring
sofacontrol/scp/example.py), constraint satisfaction, and LOCP QP assembly
verified against a dense numpy reference construction."""

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.constraints import HyperRectangle, Polyhedron
from soft_robot_control_tpu.models.dubins import DubinsCar
from soft_robot_control_tpu.scp.gusto import GuSTO
from soft_robot_control_tpu.scp.locp import LOCP, LOCPSpec, LOCPParams
from soft_robot_control_tpu.qp.admm import solve_qp_dense


def test_dubins_gusto_reaches_target():
    """Reproduces scp/example.py: reach zf=(4,5,0) under dU constraints."""
    model = DubinsCar()
    N, dt = 50, 0.1
    Qz = np.zeros((3, 3))
    R = np.eye(2)
    Qzf = 100 * np.eye(3)
    zf_des = np.array([4.0, 5.0, 0.0])
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    dU = HyperRectangle(np.array([0.1, 0.1]), np.array([-0.1, -0.1]))
    x_char = np.array([1.0, 1.0, np.pi])

    gusto = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, u=u_init,
                  zf=zf_des, Qzf=Qzf, U=None, dU=dU, verbose=0,
                  warm_start=True, x_char=x_char)
    x, u, z, t_solve = gusto.get_solution()

    # terminal state reaches the target region
    assert np.linalg.norm(x[-1, :2] - zf_des[:2]) < 0.5, x[-1]
    # dU constraints respected
    du = np.diff(u, axis=0)
    assert np.max(np.abs(du)) <= 0.1 + 1e-6
    # dynamics feasibility of the SCP solution under its own linearization
    # (defect must be small since converged)
    x_roll = np.asarray(model.rollout(x0, u, dt))
    assert np.linalg.norm(x_roll[-1, :2] - x[-1, :2]) < 0.3


def test_dubins_gusto_with_control_constraints():
    model = DubinsCar()
    N, dt = 30, 0.1
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(2)
    x0 = np.zeros(3)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    z_tgt = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    gusto = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z_tgt,
                  U=U, verbose=0, warm_start=True)
    x, u, z, _ = gusto.get_solution()
    assert np.all(u[:, 0] >= -1e-7) and np.all(u[:, 0] <= 1.0 + 1e-7)
    assert np.all(np.abs(u[:, 1]) <= 1.0 + 1e-7)
    # moves toward (1, 1)
    assert np.linalg.norm(x[-1, :2] - [1, 1]) < np.linalg.norm(x0[:2] - [1, 1])


def test_locp_assembly_matches_dense_reference():
    """Assemble a small LOCP and check (P, q, A, l, u) against a direct
    numpy construction of the same objective/constraints."""
    rng = np.random.default_rng(0)
    N, nx, nu, nz = 3, 4, 2, 2
    H = rng.normal(size=(nz, nx))
    Qz = np.diag([2.0, 1.0])
    R = np.diag([0.5, 0.3])
    U = HyperRectangle(np.ones(nu), -np.ones(nu))
    spec = LOCPSpec(N, H, Qz, R, U=U, x_char=np.array([1.0, 2.0, 0.5, 1.0]))

    Ad = rng.normal(size=(N, nx, nx))
    Bd = rng.normal(size=(N, nx, nu))
    dd = rng.normal(size=(N, nx))
    x0 = rng.normal(size=nx)
    xk = rng.normal(size=(N + 1, nx))
    z = rng.normal(size=(N + 1, nz))
    u_des = rng.normal(size=(N, nu))
    delta, omega = 1.7, 3.1

    params = LOCPParams(Ad=jnp.array(Ad), Bd=jnp.array(Bd), dd=jnp.array(dd),
                        x0=jnp.array(x0), xk=jnp.array(xk),
                        delta=jnp.array(delta), omega=jnp.array(omega),
                        z=jnp.array(z), zf=jnp.zeros(nz),
                        u_des=jnp.array(u_des),
                        Hd=jnp.zeros((N + 1, nz, nx)),
                        cd=jnp.zeros((N + 1, nz)))
    P, q, A, l, u, const = spec.assemble(params)
    sol = solve_qp_dense(P, q, A, l, u)
    assert bool(sol.solved)
    w = np.asarray(sol.x)
    x_sol, u_sol, s_sol = spec.split(w)

    # objective value must equal the direct evaluation
    J_direct = 0.0
    for k in range(N):
        J_direct += (u_sol[k] - u_des[k]) @ R @ (u_sol[k] - u_des[k])
    for k in range(N + 1):
        r = H @ x_sol[k] - z[k]
        J_direct += r @ Qz @ r
    J_direct += omega * np.sum(s_sol)
    J_qp = 0.5 * w @ np.asarray(P) @ w + np.asarray(q) @ w + float(const)
    np.testing.assert_allclose(J_qp, J_direct, rtol=1e-8, atol=1e-8)

    # constraints hold: dynamics, x0, trust region, control box
    np.testing.assert_allclose(x_sol[0], x0, atol=1e-6)
    for k in range(N):
        np.testing.assert_allclose(
            x_sol[k + 1], Ad[k] @ x_sol[k] + Bd[k] @ u_sol[k] + dd[k], atol=1e-6)
    xs = 1.0 / np.abs(np.array([1.0, 2.0, 0.5, 1.0]))
    for k in range(N + 1):
        assert np.max(np.abs(xs * (x_sol[k] - xk[k]))) <= delta + s_sol[k] + 1e-6
    assert np.all(np.abs(u_sol) <= 1.0 + 1e-7)


def test_locp_warm_start_reuse():
    """Second solve with slightly different parameters should be correct."""
    rng = np.random.default_rng(1)
    N, nx, nu, nz = 4, 3, 2, 3
    H = np.eye(3)
    locp = LOCP(N, H, np.eye(nz), np.eye(nu))
    Ad = np.tile(np.eye(nx) * 0.9, (N, 1, 1))
    Bd = np.tile(rng.normal(size=(nx, nu)), (N, 1, 1))
    dd = np.zeros((N, nx))
    x0 = np.ones(nx)
    xk = np.tile(x0, (N + 1, 1))
    locp.update(Ad, Bd, dd, x0, xk, 10.0, 1.0)
    J1, ok1, _ = locp.solve()
    assert ok1
    x1, u1, _ = locp.get_solution()
    locp.update(Ad, Bd, dd, x0 * 1.01, xk, 10.0, 1.0)
    J2, ok2, _ = locp.solve()
    assert ok2
    x2, u2, _ = locp.get_solution()
    np.testing.assert_allclose(x2[0], x0 * 1.01, atol=1e-6)


def test_locp_input_nullspace_penalty():
    """The input-nullspace quadratic penalty (our QP-representable variant
    of locp.py:259-261) drives u components in the nullspace toward zero."""
    rng = np.random.default_rng(5)
    N, nx, nu, nz = 3, 3, 2, 2
    H = rng.normal(size=(nz, nx))
    # nullspace direction: penalize u[0]+u[1]
    Nu = np.array([[50.0, 50.0]])
    spec_pen = LOCPSpec(N, H, np.eye(nz), 1e-3 * np.eye(nu),
                        input_nullspace=Nu)
    spec_free = LOCPSpec(N, H, np.eye(nz), 1e-3 * np.eye(nu))

    Ad = np.tile(0.9 * np.eye(nx), (N, 1, 1))
    Bd = np.tile(rng.normal(size=(nx, nu)), (N, 1, 1))
    dd = np.zeros((N, nx))
    x0 = rng.normal(size=nx)
    xk = np.tile(x0, (N + 1, 1))
    z = rng.normal(size=(N + 1, nz))

    def solve(spec):
        params = LOCPParams(
            Ad=jnp.array(Ad), Bd=jnp.array(Bd), dd=jnp.array(dd),
            x0=jnp.array(x0), xk=jnp.array(xk), delta=jnp.array(100.0),
            omega=jnp.array(1.0), z=jnp.array(z), zf=jnp.zeros(nz),
            u_des=jnp.zeros((N, nu)), Hd=jnp.zeros((N + 1, nz, nx)),
            cd=jnp.zeros((N + 1, nz)))
        P, q, A, l, u, _ = spec.assemble(params)
        sol = solve_qp_dense(P, q, A, l, u)
        return spec.split(np.asarray(sol.x))[1]

    u_pen = solve(spec_pen)
    u_free = solve(spec_free)
    # nullspace component suppressed relative to the unpenalized solve
    ns_pen = np.abs(u_pen.sum(axis=1)).mean()
    ns_free = np.abs(u_free.sum(axis=1)).mean()
    assert ns_pen < 0.2 * ns_free + 1e-9, (ns_pen, ns_free)


def test_linear_mpc_state_constraints():
    """X polytope constraints in the linear-MPC (tr-off) configuration
    bound the planned outputs (diamond_rompc.py:90-145 usage)."""
    from soft_robot_control_tpu.core.constraints import HyperRectangle

    rng = np.random.default_rng(6)
    N, nx, nu = 10, 4, 2
    H = np.zeros((1, nx))
    H[0, 0] = 1.0
    A_sys = 0.95 * np.eye(nx) + 0.01 * rng.normal(size=(nx, nx))
    B_sys = rng.normal(size=(nx, nu))
    X = HyperRectangle(np.array([0.5, 10, 10, 10]),
                       np.array([-0.5, -10, -10, -10]))
    spec = LOCPSpec(N, H, 100 * np.eye(1), 1e-4 * np.eye(nu), X=X,
                    is_tr_active=False)
    params = LOCPParams(
        Ad=jnp.array(np.tile(A_sys, (N, 1, 1))),
        Bd=jnp.array(np.tile(B_sys, (N, 1, 1))), dd=jnp.zeros((N, nx)),
        x0=jnp.zeros(nx), xk=jnp.zeros((N + 1, nx)), delta=jnp.array(0.0),
        omega=jnp.array(0.0), z=jnp.full((N + 1, 1), 5.0),  # far target
        zf=jnp.zeros(1), u_des=jnp.zeros((N, nu)),
        Hd=jnp.zeros((N + 1, 1, nx)), cd=jnp.zeros((N + 1, 1)))
    P, q, A, l, u, _ = spec.assemble(params)
    sol = solve_qp_dense(P, q, A, l, u)
    assert bool(sol.solved)
    x_sol, _, _ = spec.split(np.asarray(sol.x))
    # target is 5.0 but X caps x[0] at 0.5
    assert np.max(x_sol[1:, 0]) <= 0.5 + 1e-6
    assert np.max(x_sol[1:, 0]) > 0.45  # pushes against the bound


def test_gusto_qp_failure_returns_previous_iterate(capsys):
    """Failure fallback (gusto.py:356-365 semantics): an infeasible LOCP
    (contradictory dU bounds) must return the initial iterate unchanged
    rather than raising."""
    model = DubinsCar()
    N, dt = 10, 0.1
    Qz = np.eye(3)
    R = np.eye(2)
    # infeasible: du must be >= 1 and <= -1 simultaneously
    dU = Polyhedron(np.array([[1.0, 0.0], [-1.0, 0.0]]),
                    np.array([-1.0, -1.0]))
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    gusto = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init,
                  z=np.ones((N + 1, 3)), dU=dU, verbose=0, warm_start=True,
                  max_gusto_iters=3)
    x, u, z, _ = gusto.get_solution()
    np.testing.assert_allclose(x, x_init, atol=1e-12)
    np.testing.assert_allclose(u, u_init, atol=1e-12)


def test_gusto_condensed_backend_matches_dense():
    """locp_backend='condensed' reproduces the dense LOCP GuSTO solution on
    the Dubins car (same SCP path, states eliminated exactly)."""
    from soft_robot_control_tpu.models.dubins import DubinsCar
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.scp.gusto import GuSTO

    model = DubinsCar()
    N, dt = 12, 0.1
    Qz = np.eye(model.n_z)
    R = 0.1 * np.eye(model.n_u)
    x0 = np.zeros(model.n_x)
    z = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))[:, :model.n_z]
    U = HyperRectangle(2.0 * np.ones(model.n_u), -2.0 * np.ones(model.n_u))
    u_init = np.zeros((N, model.n_u))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    outs = {}
    for backend in ("dense", "condensed"):
        g = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z, U=U,
                  verbose=0, max_gusto_iters=6, convg_thresh=1e-3,
                  locp_backend=backend)
        xopt, uopt, zopt, _ = g.get_solution()
        outs[backend] = (np.asarray(xopt), np.asarray(uopt))
    np.testing.assert_allclose(outs["condensed"][1], outs["dense"][1],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(outs["condensed"][0], outs["dense"][0],
                               rtol=1e-3, atol=1e-4)


def test_gusto_oneshot_matches_host_loop():
    """The fused one-shot device path (max_gusto_iters=0, condensed, no
    trust region — the campaigns' real-time MPC configuration) must produce
    the same plans as the host single-iteration loop it replaces."""
    model = DubinsCar()
    N, dt = 12, 0.1
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(model.n_u)
    x0 = np.zeros(model.n_x)
    z = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    U = HyperRectangle(2.0 * np.ones(model.n_u), -2.0 * np.ones(model.n_u))
    u_init = np.zeros((N, model.n_u))
    x_init = np.asarray(model.rollout(x0, u_init, dt))

    def make(oneshot):
        return GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z, U=U,
                     verbose=0, max_gusto_iters=0, is_tr_active=False,
                     locp_backend="condensed", oneshot=oneshot)

    g_fast = make(True)
    g_host = make(False)
    assert g_fast._oneshot is not None
    assert g_host._oneshot is None

    # warm-started replans from slightly different states, like a closed loop
    for k in range(3):
        xk = x0 + 0.05 * k
        u_ws = np.asarray(g_host.uopt)
        x_ws = np.asarray(model.rollout(xk, u_ws, dt))
        g_fast.solve(xk, u_ws, x_ws, z=z)
        g_host.solve(xk, u_ws, x_ws, z=z)
        np.testing.assert_allclose(g_fast.uopt, g_host.uopt,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g_fast.xopt, g_host.xopt,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g_fast.zopt, g_host.zopt,
                                   rtol=1e-4, atol=1e-5)


def test_gusto_oneshot_multi_iter_improves_plan():
    """oneshot_iters=2 relinearizes at the first round's solution inside the
    fused call — it must (a) still be accepted, (b) match a 2-iteration
    host-loop relinearization to SCP-iteration accuracy on the Dubins car."""
    model = DubinsCar()
    N, dt = 12, 0.1
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(model.n_u)
    x0 = np.zeros(model.n_x)
    z = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    U = HyperRectangle(2.0 * np.ones(model.n_u), -2.0 * np.ones(model.n_u))
    u_init = np.zeros((N, model.n_u))
    x_init = np.asarray(model.rollout(x0, u_init, dt))

    g2 = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z, U=U,
               verbose=0, max_gusto_iters=0, is_tr_active=False,
               locp_backend="condensed", oneshot_iters=2)
    # one fused call = oneshot_iters host-loop solves, each relinearizing at
    # the previous accepted QP solution — so drive the fused path once and
    # the host loop TWICE from the shared converged construction plan
    g2.solve(x0, np.asarray(g2.uopt), np.asarray(g2.xopt), z=z)
    g_host = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z, U=U,
                   verbose=0, max_gusto_iters=0, is_tr_active=False,
                   locp_backend="condensed", oneshot=False)
    g_host.solve(x0, np.asarray(g_host.uopt), np.asarray(g_host.xopt), z=z)
    g_host.solve(x0, np.asarray(g_host.uopt), np.asarray(g_host.xopt), z=z)
    np.testing.assert_allclose(g2.uopt, g_host.uopt, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(g2.xopt, g_host.xopt, rtol=1e-3, atol=1e-4)


def test_gusto_oneshot_plan_bound_rejects(capsys):
    """A plan whose PLANNED output strays beyond plan_bound of the target is
    rejected and the previous plan kept (with the ADMM warm start reset)."""
    model = DubinsCar()
    N, dt = 12, 0.1
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(model.n_u)
    x0 = np.zeros(model.n_x)
    z = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    U = HyperRectangle(2.0 * np.ones(model.n_u), -2.0 * np.ones(model.n_u))
    u_init = np.zeros((N, model.n_u))
    x_init = np.asarray(model.rollout(x0, u_init, dt))

    # bound so tight even the straight-line plan violates it -> every solve
    # after construction must keep the caller-provided previous plan
    g = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z, U=U,
              verbose=0, max_gusto_iters=0, is_tr_active=False,
              locp_backend="condensed", plan_bound=1e-6)
    u_prev = np.full((N, model.n_u), 0.123)
    x_prev = np.asarray(model.rollout(x0, u_prev, dt))
    g.solve(x0, u_prev, x_prev, z=z)
    out = capsys.readouterr().out
    assert "plan rejected" in out
    np.testing.assert_allclose(g.uopt, u_prev)
    np.testing.assert_allclose(g.xopt, x_prev)
    assert float(np.abs(np.asarray(g._os_w)).max()) == 0.0


def test_linear_mpc_fused_matches_adapter():
    """LinearMPCService's fused condensed path (device-resident constant
    dynamics, one jitted dispatch per solve) returns the same plans as the
    host condensed-adapter path it accelerates (baselines/ros.py contract)."""
    from soft_robot_control_tpu.control.linear_mpc import LinearMPCService
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.core.types import QuadraticCost, Target

    rng = np.random.default_rng(9)
    N, nx, nu, nz = 8, 4, 2, 2
    H_out = np.zeros((nz, nx))
    H_out[0, 0] = H_out[1, 1] = 1.0

    class LTI:
        A_d = 0.9 * np.eye(nx) + 0.02 * rng.normal(size=(nx, nx))
        B_d = 0.1 * rng.normal(size=(nx, nu))
        d_d = 0.01 * rng.normal(size=nx)
        H = H_out

    tt = 0.05 * np.arange(40)
    zt = np.stack([np.sin(tt), np.cos(tt)], axis=1)
    cost = QuadraticCost(Q=10.0 * np.eye(nz), R=0.1 * np.eye(nu),
                         Qf=20.0 * np.eye(nz))
    target = Target(t=tt, z=zt)
    U = HyperRectangle(2.0 * np.ones(nu), -2.0 * np.ones(nu))

    svc_f = LinearMPCService(LTI(), N, 0.05, cost, target, U=U,
                             locp_backend="condensed")
    assert svc_f._fused
    svc_h = LinearMPCService(LTI(), N, 0.05, cost, target, U=U,
                             locp_backend="condensed")
    svc_h._fused = None  # force the host adapter path

    x = 0.1 * rng.normal(size=nx)
    for k in range(3):
        t0 = 0.05 * k
        svc_f.send_request(t0, x, wait=True)
        svc_h.send_request(t0, x, wait=True)
        tf_, uf, xf, _ = svc_f.get_solution()
        th_, uh, xh, _ = svc_h.get_solution()
        np.testing.assert_allclose(uf, uh, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(xf, xh, rtol=1e-4, atol=1e-5)
        x = xf[1]  # roll the loop forward along the plan


def test_linear_mpc_fused_pallas_backend():
    """qp_backend='pallas' (fixed-iteration staged VMEM ADMM, the batched-
    MPC headline solver) agrees with the default adaptive xla backend on
    the fused LTI service — the accuracy gate for wiring the Pallas kernel
    into the serving path (VERDICT r4 #9). Runs the kernel in interpreter
    mode on CPU."""
    from soft_robot_control_tpu.control.linear_mpc import LinearMPCService
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.core.types import QuadraticCost, Target

    rng = np.random.default_rng(9)
    N, nx, nu, nz = 8, 4, 2, 2
    H_out = np.zeros((nz, nx))
    H_out[0, 0] = H_out[1, 1] = 1.0

    class LTI:
        A_d = 0.9 * np.eye(nx) + 0.02 * rng.normal(size=(nx, nx))
        B_d = 0.1 * rng.normal(size=(nx, nu))
        d_d = 0.01 * rng.normal(size=nx)
        H = H_out

    tt = 0.05 * np.arange(40)
    zt = np.stack([np.sin(tt), np.cos(tt)], axis=1)
    cost = QuadraticCost(Q=10.0 * np.eye(nz), R=0.1 * np.eye(nu),
                         Qf=20.0 * np.eye(nz))
    target = Target(t=tt, z=zt)
    U = HyperRectangle(2.0 * np.ones(nu), -2.0 * np.ones(nu))

    svc_p = LinearMPCService(LTI(), N, 0.05, cost, target, U=U,
                             locp_backend="condensed", qp_backend="pallas",
                             qp_iters=200, rho_stages=4)
    assert svc_p._fused
    svc_x = LinearMPCService(LTI(), N, 0.05, cost, target, U=U,
                             locp_backend="condensed")

    x = 0.1 * rng.normal(size=nx)
    for k in range(3):
        t0 = 0.05 * k
        svc_p.send_request(t0, x, wait=True)
        svc_x.send_request(t0, x, wait=True)
        _, up, xp, _ = svc_p.get_solution()
        _, ux_, xx_, _ = svc_x.get_solution()
        # fixed 200-iteration budget vs residual-driven adaptive solve:
        # plans must agree to control accuracy (inputs bounded by 2.0)
        np.testing.assert_allclose(up, ux_, rtol=0, atol=2e-3)
        np.testing.assert_allclose(xp, xx_, rtol=0, atol=2e-3)
        x = xp[1]
