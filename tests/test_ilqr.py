"""iLQR tests: exact agreement with the LQR tracking solution on a linear
system (iLQR on an LTI plant with quadratic cost converges in one pass), and
trajectory tracking quality on the nonlinear TPWL chain (BASELINE config 2
analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.types import QuadraticCost
from soft_robot_control_tpu.lqr.ilqr import iLQR, iLQRConfig
from soft_robot_control_tpu.models.tpwl import TPWLModel
from soft_robot_control_tpu.models.tpwl_build import build_tpwl_model, tpwl_config
from soft_robot_control_tpu.rom.pod import POD, compute_POD
from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot, simulate
from soft_robot_control_tpu.control.sequences import DiamondRobotSequences


def _lti_tpwl(seed=0, r=3, m=2, nz=2):
    """Single-point TPWL == LTI system; H random output."""
    rng = np.random.default_rng(seed)
    n = 2 * r
    A = rng.normal(size=(n, n)) * 0.3 - 1.0 * np.eye(n)
    B = rng.normal(size=(n, m))
    nf = 8
    U, _ = np.linalg.qr(rng.normal(size=(nf, r)))
    rom = POD({"U": U, "q_ref": np.zeros(nf), "v_ref": np.zeros(nf)})
    model = TPWLModel(q=np.zeros((1, r)), v=np.zeros((1, r)), u=np.zeros((1, m)),
                      A_c=A[None], B_c=B[None], d_c=np.zeros((1, n)), rom=rom,
                      discr_method="zoh", tpwl_method="nn")
    Hf = rng.normal(size=(nz, 2 * nf))
    model = model.set_output_model(Hf)
    return model


def test_ilqr_matches_lqr_on_linear_system():
    """On an LTI system with u-cost (no delta-u), iLQR must land on the
    finite-horizon LQR tracking optimum, computed here by a numpy DP oracle."""
    model = _lti_tpwl()
    T, dt = 30, 0.05
    n, m = model.state_dim, model.input_dim
    H = np.asarray(model.H)
    z_ref = np.asarray(model.z_ref)
    rng = np.random.default_rng(1)
    z_target_const = z_ref + 0.1 * rng.normal(size=H.shape[0])
    z_target = np.tile(z_target_const, (T + 1, 1))

    Q = np.eye(H.shape[0])
    R = 0.1 * np.eye(m)
    cost = QuadraticCost(Q=Q, R=R, Qf=Q)

    cfg = iLQRConfig()
    cfg.include_input_var_constraint = False
    cfg.epsilon = 1e-10
    ilqr = iLQR(dt=dt, model=model, cost_params=cost, planning_horizon=T,
                config=cfg)
    ilqr.set_target(z_target)
    x0 = 0.05 * rng.normal(size=n)
    x_bar, u_bar, K = ilqr.ilqr_computation(x0)

    # ----- numpy DP oracle: affine LQR tracking on the discretized system
    # cost: 0.5 (Hx + z_ref - zt)'Q(...) + 0.5 u'Ru; terminal with Qf = Q.
    # value V_t(x) = 0.5 x'P x + p'x + const
    Ad, Bd, dd = [np.asarray(v) for v in
                  model.get_jacobians(jnp.array(x0), dt=dt)]
    c_x = H.T @ Q @ (z_ref - z_target_const)
    P = H.T @ Q @ H
    p = H.T @ Q @ (z_ref - z_target_const)
    us = []
    for t in reversed(range(T)):
        Quu = R + Bd.T @ P @ Bd
        Qux = Bd.T @ P @ Ad
        qu = Bd.T @ (p + P @ dd)
        Kt = -np.linalg.solve(Quu, Qux)
        kt = -np.linalg.solve(Quu, qu)
        P_new = H.T @ Q @ H + Ad.T @ P @ Ad + Qux.T @ Kt
        p_new = c_x + Ad.T @ (p + P @ dd) + Qux.T @ kt
        P, p = P_new, p_new
        us.append((Kt, kt))
    us = us[::-1]
    x_o = np.zeros((T + 1, n))
    u_o = np.zeros((T, m))
    x_o[0] = x0
    for t in range(T):
        Kt, kt = us[t]
        u_o[t] = Kt @ x_o[t] + kt
        x_o[t + 1] = Ad @ x_o[t] + Bd @ u_o[t] + dd

    np.testing.assert_allclose(u_bar, u_o, atol=1e-5)
    np.testing.assert_allclose(x_bar, x_o, atol=1e-5)


@pytest.mark.slow
def test_ilqr_tracks_on_tpwl_chain():
    """Trunk-iLQR-style tracking on the nonlinear chain TPWL ROM."""
    plant = make_chain_robot(n_nodes=8, n_cables=3, seed=2)
    seqs = DiamondRobotSequences(dt=0.02, t0=0.3)
    seqs.m = 3
    seqs.u0 = np.zeros(3)
    seqs.u_base, seqs.save_base, _ = seqs.constant_input(seqs.u0, 0.3,
                                                         add_base=False)
    seqs.save_base[-5:] = True
    seqs.umax = 4.0 * np.ones(3)
    seqs.umin = np.zeros(3)
    seqs.active_inputs = [True] * 3
    u_seq, _, _ = seqs.lhs_sequence(nbr_samples=10, t_step=0.3, seed=3)
    u = np.asarray(u_seq).T
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u), 0.02))

    n = plant.n_nodes_dof
    snaps = np.concatenate([X[1:, :n], X[1:, n:] - X[0, n:]], axis=0)
    _, U, r, _ = compute_POD(snaps.T, 1e-7)
    rom = POD({"U": U, "q_ref": X[0, n:], "v_ref": np.zeros(n)})
    Hf = np.zeros((1, 2 * n))
    Hf[0, 2 * n - 1] = 1.0
    model = build_tpwl_model(
        plant, rom, X[:-1], u, config=tpwl_config(TPWL_threshold=1.0,
                                                  TPWL_weighting_factors={"q": 10.0, "v": 1.0}),
        Hf=Hf, params={"dist_weights": {"q": 10.0, "v": 1.0}},
        discr_method="be").pre_discretize(0.02)

    # target: move the tip to a reachable deflected position and hold
    z0 = float((X[0] @ Hf.T)[0])
    z_goal = z0 + 0.15
    T = 60
    z_target = np.full((T + 1, 1), z_goal)

    cost = QuadraticCost(Q=np.array([[500.0]]), R=0.01 * np.eye(3),
                         Qf=np.array([[500.0]]))
    cfg = iLQRConfig()
    cfg.max_iter = 20
    ilqr = iLQR(dt=0.02, model=model, cost_params=cost, planning_horizon=T,
                config=cfg)
    ilqr.set_target(z_target)
    x0_r = np.asarray(rom.project_x(jnp.asarray(X[0])))
    x_bar, u_bar, K = ilqr.ilqr_computation(x0_r)

    z_final = float((np.asarray(model.H) @ x_bar[-1] + np.asarray(model.z_ref))[0])
    assert abs(z_final - z_goal) < 0.05 * abs(z_goal - z0) + 0.01, \
        f"z_final {z_final} vs goal {z_goal} (start {z0})"
