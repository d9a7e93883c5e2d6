"""Tet-mesh FEM plant (sim/fem_tet.py) — mesh IO, element physics, stepping,
and the matrix-free reduced-dynamics projections.

Reference parity targets: robots/environments.py:139-238 (Diamond scene:
diamond.vtu 1628 nodes, 4 cables, BoxROI base), :39-137 (Trunk: trunk.vtk
709 nodes, 8 polyline cables), sofacontrol/utils.py:251-299 (extract_AB /
extract_AB_d roles played by reduced_affine_dynamics /
reduced_discrete_dynamics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.packing import x2qv
from soft_robot_control_tpu.sim import fem_tet
from soft_robot_control_tpu.sim.fem_surrogate import simulate
from soft_robot_control_tpu.sim.fem_tet import (build_tet_fem,
                                                load_vtk_legacy,
                                                load_vtu_ascii,
                                                make_box_mesh,
                                                transform_mesh)


# ---------------------------------------------------------------------------
# mesh IO


def test_diamond_vtu_loads_reference_dims():
    pts, tets = load_vtu_ascii(
        fem_tet.REFERENCE_MESH_DIR + "/diamond.vtu")
    assert pts.shape == (1628, 3)          # robots/environments.py:144
    assert tets.shape == (4147, 4)
    pts2 = transform_mesh(pts, (90.0, 0.0, 0.0), (0.0, 0.0, 35.0))
    # rotation about x maps (x, y, z) -> (x, -z, y) then +35 in z
    np.testing.assert_allclose(pts2[:, 0], pts[:, 0], atol=1e-12)
    np.testing.assert_allclose(pts2[:, 2], pts[:, 1] + 35.0, atol=1e-9)


def test_trunk_vtk_loads_reference_dims():
    pts, tets = load_vtk_legacy(fem_tet.REFERENCE_MESH_DIR + "/trunk.vtk")
    assert pts.shape == (709, 3)           # robots/environments.py:44
    assert tets.shape[1] == 4 and tets.shape[0] > 1500
    assert pts[:, 2].min() >= -1e-9 and pts[:, 2].max() <= 195 + 1e-9


# ---------------------------------------------------------------------------
# small synthetic plant


@pytest.fixture(scope="module")
def box_plant():
    pts, tets = make_box_mesh(3, 3, 5, spacing=10.0)
    cables = [{"waypoints": np.array([[10.0, 10.0, 38.0]]),
               "pull_point": np.array([10.0, 10.0, 0.0])},
              {"waypoints": np.array([[2.0, 10.0, 15.0], [2.0, 10.0, 25.0],
                                      [2.0, 10.0, 38.0]])}]
    return build_tet_fem(pts, tets, young=200.0, poisson=0.45,
                         total_mass=0.05, alpha=0.5, beta=0.02,
                         fixed_box=(-1.0, -1.0, -1.0, 21.0, 21.0, 1.0),
                         cables=cables, dt=0.01)


def test_rest_is_equilibrium(box_plant):
    p = box_plant
    f = np.asarray(p.f_int(p.rest_pos))
    assert np.abs(f).max() < 1e-8
    X = np.asarray(simulate(p, p.x_rest(), jnp.zeros((10, 2)), 0.01))
    assert np.abs(X[-1, p.n_nodes_dof:] - np.asarray(p.q_eq)).max() < 1e-10


def test_corotational_force_rotation_equivariant(box_plant):
    """A rigid rotation of the whole (deformed) configuration rotates the
    internal forces: f(R q) = R f(q) — the defining property of the
    corotational model (SOFA method='large')."""
    p = box_plant
    rng = np.random.default_rng(0)
    q = np.asarray(p.rest_pos) + 0.5 * rng.normal(size=p.n_nodes_dof)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0.0],
                  [np.sin(th), np.cos(th), 0.0], [0.0, 0.0, 1.0]])
    # unmask for this test: compare raw element force sums via free_mask=1
    mask = np.asarray(p.free_mask).copy()
    try:
        p.free_mask = jnp.ones_like(p.free_mask)
        f = np.asarray(p.f_int(jnp.asarray(q))).reshape(-1, 3)
        qR = (q.reshape(-1, 3) @ R.T).reshape(-1)
        fR = np.asarray(p.f_int(jnp.asarray(qR))).reshape(-1, 3)
        np.testing.assert_allclose(fR, f @ R.T, rtol=1e-8, atol=1e-8)
    finally:
        p.free_mask = jnp.asarray(mask)


def test_tangent_matvec_matches_fd(box_plant):
    p = box_plant
    rng = np.random.default_rng(1)
    q = jnp.asarray(np.asarray(p.rest_pos) + 0.2 * rng.normal(size=p.n_nodes_dof))
    w = jnp.asarray(rng.normal(size=p.n_nodes_dof))
    eps = 1e-6
    fd = (np.asarray(p.f_int(q + eps * w)) - np.asarray(p.f_int(q - eps * w))) \
        / (2 * eps)
    kt_w = np.asarray(p.kt_matvec(q, w))
    np.testing.assert_allclose(-kt_w, fd, rtol=1e-4, atol=1e-5)


def test_step_matches_dense_solve(box_plant):
    """The PCG step equals the exact dense solve of the same
    linearly-implicit system."""
    p = box_plant
    n3 = p.n_nodes_dof
    rng = np.random.default_rng(2)
    q = jnp.asarray(np.asarray(p.q_eq) + 0.3 * rng.normal(size=n3))
    v = jnp.asarray(2.0 * rng.normal(size=n3) * np.asarray(p.free_mask))
    u = jnp.asarray(np.array([30.0, 20.0]))
    x = jnp.concatenate([v, q])
    dt = p.dt
    tol_save = p.cg_tol
    try:
        p.cg_tol = 1e-12  # drive PCG to convergence for the exactness check
        x2 = np.asarray(p.step(x, u, dt))
    finally:
        p.cg_tol = tol_save
    # dense reference
    R = p.rotations(q)
    cm = (1 + dt * float(p.alpha)) * float(p.m_node)
    cs = dt * float(p.beta) + dt * dt
    cols = jax.vmap(lambda w: cm * w + cs * p.kt_frozen_matvec(w, R),
                    in_axes=1, out_axes=1)(jnp.eye(n3))
    S = np.array(cols)
    fm = np.asarray(p.free_mask)
    fix = fm == 0
    S[fix] = 0.0
    S[:, fix] = 0.0
    S[fix, fix] = cm
    Kv = p.kt_frozen_matvec(v, R)
    f = (p._f_int_frozen(q, R) + p.m_node * p.g_full + p.H @ u
         - p.alpha * p.m_node * v - p.beta * Kv)
    rhs = dt * (np.asarray(f) * fm - dt * np.asarray(Kv)) * fm
    dv = np.linalg.solve(S, rhs) * fm
    v2 = (np.asarray(v) + dv) * fm
    q2 = np.asarray(q) + dt * v2
    np.testing.assert_allclose(x2[:n3], v2, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(x2[n3:], q2, rtol=1e-6, atol=1e-8)


def test_cable_columns(box_plant):
    H = np.asarray(box_plant.H)
    assert H.shape[1] == 2
    # pull-point cable: net force points from attachment toward pull point
    col = H[:, 0].reshape(-1, 3).sum(axis=0)
    d = np.array([0.0, 0.0, -38.0])
    np.testing.assert_allclose(col / np.linalg.norm(col),
                               d / np.linalg.norm(d), atol=0.3)
    # polyline cable: interior forces mostly cancel; endpoint forces remain
    assert np.abs(H[:, 1]).max() > 0.1


def test_reduced_affine_tangency(box_plant):
    """(A_r, B_r, d_r) is exactly tangent: A_r x_r + B_r u + d_r equals the
    projected xdot at the linearization point."""
    from soft_robot_control_tpu.rom.pod import POD

    p = box_plant
    n3 = p.n_nodes_dof
    rng = np.random.default_rng(3)
    U, _ = np.linalg.qr(rng.normal(size=(n3, 6)))
    rom = POD({"U": U, "q_ref": np.asarray(p.q_eq), "v_ref": np.zeros(n3)})
    x = jnp.asarray(np.concatenate([
        0.5 * rng.normal(size=n3) * np.asarray(p.free_mask),
        np.asarray(p.q_eq) + 0.3 * rng.normal(size=n3)]))
    u = jnp.asarray(np.array([25.0, 10.0]))
    Ar, Br, dr = p.reduced_affine_dynamics(rom, x, u)
    xr = rom.project_x(x)
    pred = np.asarray(Ar @ xr + Br @ u + dr)
    xdot = p.f(x, u)
    qdot, vdot = x2qv(xdot)
    truth = np.concatenate([U.T @ np.asarray(vdot), U.T @ np.asarray(qdot)])
    np.testing.assert_allclose(pred, truth, rtol=1e-7, atol=1e-8)


def test_reduced_discrete_exact_at_point(box_plant):
    """A_d x_r + B_d u + d_d reproduces the projected plant step at the
    linearization point (the extract_AB_d role, utils.py:289-299)."""
    from soft_robot_control_tpu.rom.pod import POD

    p = box_plant
    n3 = p.n_nodes_dof
    rng = np.random.default_rng(4)
    U, _ = np.linalg.qr(rng.normal(size=(n3, 6)))
    rom = POD({"U": U, "q_ref": np.asarray(p.q_eq), "v_ref": np.zeros(n3)})
    x = jnp.asarray(np.concatenate([
        0.5 * rng.normal(size=n3) * np.asarray(p.free_mask),
        np.asarray(p.q_eq) + 0.2 * rng.normal(size=n3)]))
    u = jnp.asarray(np.array([40.0, 15.0]))
    Ad, Bd, dd = p.reduced_discrete_dynamics(rom, x, u, p.dt)
    xr = rom.project_x(x)
    pred = np.asarray(Ad @ xr + Bd @ u + dd)
    truth = np.asarray(rom.project_x(p.step(x, u, p.dt)))
    np.testing.assert_allclose(pred, truth, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# reference-mesh robots (slow)


@pytest.mark.slow
def test_trunk_tet_stable_under_cable_pull():
    from soft_robot_control_tpu.robots.robots import TrunkTetRobot

    robot = TrunkTetRobot(gravity_on=False, settle_time=0.0)
    p = robot.plant
    assert p.n_nodes == 709 and p.input_dim == 8
    # 60 steps: enough to prove stability + motion; the single-core-CPU
    # cost of this test is dominated by plant-step XLA compiles and scales
    # with nothing here, but execution is ~0.5 s/step in f64
    u = 400.0 * jnp.ones((60, 8)) * jnp.asarray(
        np.array([1, 0, 0, 0, 0, 0, 0, 0.0]))
    X = np.asarray(simulate(p, p.x_rest(), u, robot.dt))
    assert np.isfinite(X).all()
    tip = X[:, p.n_nodes_dof:][:, 3 * 51:3 * 51 + 3]
    assert np.linalg.norm(tip[-1] - tip[0]) > 2.0  # it actually moves


@pytest.mark.slow
def test_diamond_tet_pipeline_smoke(tmp_path):
    """POD -> discrete TPWL -> rollout fidelity on the full 1628-node
    Diamond (short campaign)."""
    from soft_robot_control_tpu.robots.robots import DiamondTetRobot
    from soft_robot_control_tpu.tasks import recipes

    robot = DiamondTetRobot(gravity_on=False, settle_time=0.0)
    assert robot.plant.state_dim == 9768   # reference full-state dimension
    d = str(tmp_path)
    # smallest campaign that exercises every stage: each discrete TPWL
    # point costs a 9768-dim multi-rhs PCG solve, minutes apiece on the
    # single-core CPU the suite runs on, so keep the dictionary tiny —
    # full-fidelity campaigns run on TPU (examples/diamond_tet_campaign.py)
    # and their committed artifacts are gated by test_campaign_artifacts.py
    recipes.collect_pod_data(robot, d, nbr_samples=2, t_step=0.15)
    res = recipes.compute_pod_basis(d, pod_tolerance=5e-5, pod_type="a",
                                    rom_dim=12)
    assert res["POD_info"]["U"].shape[0] == 4884
    recipes.collect_tpwl_data(robot, d, threshold=150.0, nbr_samples=2,
                              t_step=0.15, dynamics="discrete")
    chk = recipes.tpwl_rollout_check(robot, d, nbr_samples=1, seed=333,
                                     t_step=0.15)
    assert np.isfinite(chk["mse"])
    assert chk["rel_err"] < 1.0, chk["rel_err"]


def test_reference_modes_load_and_match_dims():
    """mode1-3.mat (robots/data/) load, rotate to the scene frame, and have
    the Diamond's 4884-dof layout (launch_sofa_modal_analysis.py:96-126)."""
    from soft_robot_control_tpu.sim.modal import load_reference_modes

    modes = load_reference_modes()
    assert modes.shape == (3, 4884)
    # unit-ish scaling: the exported modes are normalized vectors
    norms = np.linalg.norm(modes, axis=1)
    assert np.all(norms > 0.1) and np.all(norms < 100.0)


@pytest.mark.slow
def test_modal_decay_with_reference_modes():
    """Batched modal-decay campaign on the Diamond tet plant seeded by the
    shipped reference mode shapes."""
    from soft_robot_control_tpu.robots.robots import DiamondTetRobot
    from soft_robot_control_tpu.sim.modal import load_reference_modes, modal_decay_batch

    robot = DiamondTetRobot(gravity_on=False, settle_time=0.0)
    modes = load_reference_modes()
    out = modal_decay_batch(robot.plant, modes[:1], amplitudes=[5.0],
                            signs=(1.0,), duration=0.3, dt=robot.dt)
    (name, traj), = out.items()
    assert np.isfinite(traj).all()
    # energy decays: final displacement smaller than initial
    n3 = robot.plant.n_nodes_dof
    dq0 = np.linalg.norm(traj[0, n3:] - np.asarray(robot.plant.q_eq))
    dqT = np.linalg.norm(traj[-1, n3:] - np.asarray(robot.plant.q_eq))
    assert dqT < dq0
