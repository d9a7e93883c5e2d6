"""Device-resident GuSTO: agreement with the host GuSTO on the Dubins car,
and vmapped batched solves."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.models.dubins import DubinsCar
from soft_robot_control_tpu.scp.gusto import GuSTO
from soft_robot_control_tpu.scp.gusto_jit import GuSTOJit
from soft_robot_control_tpu.core.constraints import HyperRectangle


def _dubins_problem(N=30, dt=0.1):
    model = DubinsCar()
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(2)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    z_tgt = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    return model, Qz, R, U, z_tgt, x0, u_init, x_init


def test_gusto_jit_matches_host_on_dubins():
    N, dt = 30, 0.1
    model, Qz, R, U, z_tgt, x0, u_init, x_init = _dubins_problem(N, dt)

    host = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z_tgt, U=U,
                 verbose=0, warm_start=True)
    x_h, u_h, _, _ = host.get_solution()

    dev = GuSTOJit(model, N, dt, Qz, R, U=U, max_iters=25, qp_iters=400)
    res = dev.solve(x0, u_init, x_init, z_tgt)
    assert bool(res.converged)
    x_d, u_d = np.asarray(res.x), np.asarray(res.u)

    # SCP on the (nonconvex) Dubins car may land on different local optima;
    # demand comparable *solution quality*: the device solve's true cost
    # must not exceed the host solve's by more than 10%
    def true_cost(x, u):
        J = 0.0
        for k in range(N + 1):
            r = x[k] - z_tgt[k]
            J += r @ Qz @ r
        for k in range(N):
            J += u[k] @ R @ u[k]
        return J

    J_h, J_d = true_cost(x_h, u_h), true_cost(x_d, u_d)
    assert J_d <= 1.1 * J_h, (J_d, J_h)
    # input constraints respected, dynamics defect small at the fixed point
    assert np.all(u_d[:, 0] >= -1e-6) and np.all(u_d[:, 0] <= 1 + 1e-6)
    assert np.all(np.abs(u_d[:, 1]) <= 1 + 1e-6)
    x_roll = np.asarray(model.rollout(x0, u_d, dt))
    assert np.linalg.norm(x_roll[-1, :2] - x_d[-1, :2]) < 0.15


def test_gusto_jit_batched_solves():
    N, dt = 20, 0.1
    model, Qz, R, U, _, _, u_init, _ = _dubins_problem(N, dt)
    dev = GuSTOJit(model, N, dt, Qz, R, U=U, max_iters=20, qp_iters=300)

    B = 4
    rng = np.random.default_rng(0)
    targets = rng.uniform(0.5, 1.5, size=(B, 2))
    z = np.zeros((B, N + 1, 3))
    z[:, :, :2] = targets[:, None, :]
    x0 = np.zeros((B, 3))
    u0 = np.zeros((B, N, 2))
    x_init = np.stack([np.asarray(model.rollout(x0[b], u0[b], dt))
                       for b in range(B)])
    res = dev.solve_batch(x0, u0, x_init, z)
    x = np.asarray(res.x)
    assert x.shape == (B, N + 1, 3)
    assert np.asarray(res.converged).all()
    # each batch element heads toward its own target
    for b in range(B):
        d0 = np.linalg.norm(targets[b])
        d1 = np.linalg.norm(x[b, -1, :2] - targets[b])
        assert d1 < 0.5 * d0, (b, d0, d1)


def test_gusto_jit_fused_matches_vmapped():
    """solve_batch_fused (lockstep fori + grid-batched Pallas LOCP) must
    reproduce solve_batch per element (f64, interpret kernel on CPU)."""
    N, dt = 20, 0.1
    model, Qz, R, U, _, _, u_init, _ = _dubins_problem(N, dt)
    dev = GuSTOJit(model, N, dt, Qz, R, U=U, max_iters=8, qp_iters=200,
                   x_step="kinv")

    B = 3
    rng = np.random.default_rng(1)
    targets = rng.uniform(0.5, 1.5, size=(B, 2))
    z = np.zeros((B, N + 1, 3))
    z[:, :, :2] = targets[:, None, :]
    x0 = np.zeros((B, 3))
    u0 = np.zeros((B, N, 2))
    x_init = np.stack([np.asarray(model.rollout(x0[b], u0[b], dt))
                       for b in range(B)])
    ref = dev.solve_batch(x0, u0, x_init, z)
    fused = dev.solve_batch_fused(x0, u0, x_init, z)
    np.testing.assert_array_equal(np.asarray(fused.iters),
                                  np.asarray(ref.iters))
    np.testing.assert_array_equal(np.asarray(fused.converged),
                                  np.asarray(ref.converged))
    # same iterates up to the ADMM kernel's contraction-order rounding
    np.testing.assert_allclose(np.asarray(fused.x), np.asarray(ref.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.u), np.asarray(ref.u),
                               atol=1e-6)


def test_gusto_jit_condensed_matches_sparse():
    """The condensed GuSTO (states eliminated, TR as affine rows + one
    slack) must reach the same solution quality as the sparse LOCP GuSTO
    and obey the input bounds; with high ADMM iteration counts the SCP
    paths coincide."""
    N, dt = 20, 0.1
    model, Qz, R, U, z, x0, u_init, x_init = _dubins_problem(N, dt)
    kw = dict(max_iters=10, qp_iters=1500, x_step="kinv")
    dev_s = GuSTOJit(model, N, dt, Qz, R, U=U, formulation="sparse", **kw)
    dev_c = GuSTOJit(model, N, dt, Qz, R, U=U, formulation="condensed", **kw)
    rs = dev_s.solve(x0, u_init, x_init, z)
    rc = dev_c.solve(x0, u_init, x_init, z)
    assert bool(rc.converged)
    u_c = np.asarray(rc.u)
    assert np.all(u_c[:, 0] >= -1e-4) and np.all(u_c[:, 0] <= 1 + 1e-4)
    # same converged trajectory (both solve the same sequence of QPs)
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rs.x), atol=5e-3)
    # true rollout cost comparable
    def cost(u):
        xs = np.asarray(model.rollout(x0, u, dt))
        dz = xs - np.asarray(z)
        return float(np.einsum("ki,ij,kj->", dz, np.asarray(Qz), dz))
    assert cost(np.asarray(rc.u)) <= 1.1 * cost(np.asarray(rs.u)) + 1e-9


def test_gusto_jit_condensed_dU_warm_belief():
    """Regression: the condensed device-TR path once mis-solved IN-LOOP dU
    QPs — construction solves were fine but warm-started belief-x0 solves
    'converged' 40-240 mm off target on the trunk campaign (round-4 note,
    examples/trunk_tet_campaign.py). Root cause was the unequilibrated
    condensed KKT (scale mix between the G-chain output rows and the input
    bounds) + the uniform-rho ADMM stalling only on the harder warm-started
    geometry; fixed by Ruiz equilibration + staged rho rebalancing in
    gusto_jit.qp. This pins the MPC-loop shape: sequential solves with
    shifted warm starts and a PERTURBED initial state, in f32 (the campaign
    dtype), with dU rows active — each must track the target and respect
    the slew bound, matching a cold fresh solve."""
    N, dt = 20, 0.1
    model = DubinsCar()
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.1 * np.eye(2)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    dU = HyperRectangle(np.array([0.15, 0.25]), np.array([-0.15, -0.25]))
    z = np.tile(np.array([1.0, 1.0, 0.0]), (N + 1, 1))
    dev = GuSTOJit(model, N, dt, Qz, R, U=U, dU=dU, formulation="condensed",
                   max_iters=10, qp_iters=1200, x_step="kinv",
                   dtype=jnp.float32)

    x0 = np.zeros(3)
    u_prev = np.zeros((N, 2))
    x_prev = np.asarray(model.rollout(x0, u_prev, dt))
    rng = np.random.default_rng(7)
    for k in range(4):
        res = dev.solve(x0, u_prev, x_prev, z)
        u_k = np.asarray(res.u)
        x_k = np.asarray(res.x)
        assert np.isfinite(u_k).all() and np.isfinite(x_k).all(), k
        # slew bound honored (the rows that used to be mis-solved)
        du = np.abs(np.diff(u_k, axis=0))
        assert (du[:, 0] <= 0.15 + 5e-3).all(), (k, du[:, 0].max())
        assert (du[:, 1] <= 0.25 + 5e-3).all(), (k, du[:, 1].max())
        # the plan heads toward the target, not 'converged' far off it:
        # tail-of-horizon position error must shrink vs the initial state
        d0 = np.linalg.norm(z[0, :2] - x_k[0, :2])
        dT = np.linalg.norm(z[-1, :2] - x_k[-1, :2])
        assert dT < 0.7 * d0 + 1e-3, (k, d0, dT)
        # a cold fresh solve from the same belief agrees on the plan tail
        cold = dev.solve(x_k[0], np.zeros((N, 2)),
                         np.asarray(model.rollout(x_k[0], np.zeros((N, 2)),
                                                  dt)), z)
        dT_cold = np.linalg.norm(z[-1, :2] - np.asarray(cold.x)[-1, :2])
        assert dT <= dT_cold + 0.12, (k, dT, dT_cold)
        # MPC shift: belief = plan state 2 steps in, plus model mismatch
        x0 = x_k[2] + 0.03 * rng.standard_normal(3)
        u_prev = np.concatenate([u_k[2:], u_k[-1:], u_k[-1:]], axis=0)
        x_prev = np.asarray(model.rollout(x0, u_prev, dt))


def test_device_tr_service_packed_roundtrip():
    """GuSTO(device_tr=True) parses the packed one-download result
    correctly: plan arrays, iteration count, and the excursion guard all
    see the same values the unpacked GuSTOJit result carries."""
    N, dt = 20, 0.1
    model, Qz, R, U, z_tgt, x0, u_init, x_init = _dubins_problem(N, dt)
    g = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, z=z_tgt, U=U,
              locp_backend="condensed", device_tr=True,
              device_tr_max_iters=10, device_tr_qp_iters=600,
              plan_bound=50.0, dtype=jnp.float64)
    x_s, u_s, z_s, _ = g.get_solution()
    assert np.isfinite(x_s).all() and np.isfinite(u_s).all()
    assert g.itr_count >= 1 and g.plan_rejects == 0
    # agrees with the raw GuSTOJit result on the same problem
    raw = g._jit_tr.solve(x0, u_init, x_init, z_tgt)
    np.testing.assert_allclose(x_s, np.asarray(raw.x), atol=1e-9)
    np.testing.assert_allclose(u_s, np.asarray(raw.u), atol=1e-9)
    assert g.itr_count == int(raw.iters)


def test_gusto_jit_state_constraints():
    """X polytope keeps the device-GuSTO trajectory inside the box."""
    N, dt = 25, 0.1
    model = DubinsCar()
    Qz = np.diag([1.0, 1.0, 0.0])
    R = 0.05 * np.eye(2)
    U = HyperRectangle(np.array([1.0, 1.0]), np.array([0.0, -1.0]))
    X = HyperRectangle(np.array([0.6, 10.0, 10.0]),
                       np.array([-10.0, -10.0, -10.0]))
    z_tgt = np.tile(np.array([2.0, 0.5, 0.0]), (N + 1, 1))  # x-target beyond the box
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    dev = GuSTOJit(model, N, dt, Qz, R, U=U, X=X, max_iters=20, qp_iters=400)
    res = dev.solve(x0, u_init, x_init, z_tgt)
    x = np.asarray(res.x)
    assert np.max(x[1:, 0]) <= 0.6 + 5e-3, np.max(x[1:, 0])
    assert np.max(x[1:, 0]) > 0.4  # pushes toward the bound
    # condensed: X rows act on the predicted states (regression: the row
    # width must be the input block, not n_var with the TR slack)
    dev_c = GuSTOJit(model, N, dt, Qz, R, U=U, X=X, max_iters=20,
                     qp_iters=800, x_step="kinv", formulation="condensed")
    res_c = dev_c.solve(x0, u_init, x_init, z_tgt)
    x_c = np.asarray(res_c.x)
    assert np.max(x_c[1:, 0]) <= 0.6 + 5e-3, np.max(x_c[1:, 0])
    assert np.max(x_c[1:, 0]) > 0.4
