"""End-to-end recipe tests: the full offline pipeline (collect POD data ->
POD basis -> TPWL dictionary -> fidelity check) and a closed-loop recipe on
the Diamond surrogate robot, all through the public recipe API."""

import numpy as np
import pytest

from soft_robot_control_tpu.robots import DiamondRobot
from soft_robot_control_tpu.tasks import recipes
from soft_robot_control_tpu.tasks.analysis import summarize
from soft_robot_control_tpu.tasks.targets import figure8, sine_setpoint


@pytest.fixture(scope="module")
def diamond(tmp_path_factory):
    """Diamond robot + offline artifacts (POD basis, TPWL dictionary).

    The fixture runs the offline pipeline itself so every dependent test is
    self-sufficient (e.g. `pytest -m slow` must pass standalone without the
    unmarked pipeline test having populated the directory first).
    """
    save_dir = str(tmp_path_factory.mktemp("diamond"))
    # smaller/faster than defaults for CI: fewer samples, coarser dt
    robot = DiamondRobot(n_nodes=10, seed=0)
    robot.dt = 0.02
    robot.sequences.dt = 0.02
    snap = recipes.collect_pod_data(robot, save_dir, nbr_samples=15,
                                    t_step=0.3, seed=1)
    res = recipes.compute_pod_basis(save_dir, pod_tolerance=1e-8,
                                    pod_type="v")
    model = recipes.collect_tpwl_data(robot, save_dir, threshold=0.4,
                                      nbr_samples=15, seed=2)
    return robot, save_dir, snap, res, model


def test_offline_pipeline_trunk(tmp_path):
    """The same recipe API runs for the 8-cable Trunk robot."""
    from soft_robot_control_tpu.robots import TrunkRobot

    robot = TrunkRobot(n_nodes=10, seed=1)
    robot.dt = 0.02
    robot.sequences.dt = 0.02
    d = str(tmp_path)
    recipes.collect_pod_data(robot, d, nbr_samples=10, t_step=0.3, seed=5)
    recipes.compute_pod_basis(d, pod_tolerance=1e-8, pod_type="v")
    model = recipes.collect_tpwl_data(robot, d, threshold=0.4,
                                      nbr_samples=10, seed=6)
    assert model.input_dim == 8
    check = recipes.tpwl_rollout_check(robot, d, nbr_samples=5, seed=7)
    z_scale = np.var(check["z_true"] - check["z_true"][0]) + 1e-12
    assert check["mse"] / z_scale < 0.5


def test_offline_pipeline_recipes(diamond):
    robot, save_dir, snap, res, model = diamond
    assert len(snap["q"]) > 50

    r = res["POD_info"]["U"].shape[1]
    assert 2 <= r <= robot.nb_nodes

    assert model.num_points >= 2

    check = recipes.tpwl_rollout_check(robot, save_dir, nbr_samples=6, seed=3)
    # 'be'-discretized TPWL on its own plant: near-exact where covered
    z_scale = np.var(check["z_true"] - check["z_true"][0]) + 1e-12
    assert check["mse"] / z_scale < 0.5, check["mse"] / z_scale


@pytest.mark.slow
def test_run_scp_recipe_closed_loop(diamond):
    robot, save_dir, _, _, _ = diamond
    # target: gentle sine on the tip around rest
    Hf = robot.get_output_model()
    import jax.numpy as jnp

    z0 = float((np.asarray(robot.plant.x_rest()) @ Hf.T)[0])
    t_t, z_t = sine_setpoint(T=4.0, duration=12.0, dt=0.02, amplitude=0.05)
    z_t = z_t + z0

    sim = recipes.run_scp(robot, save_dir, t_t, z_t, N=5, N_replan=2,
                          Qz=np.array([[200.0]]),
                          R=1e-6 * np.eye(robot.n_cables),
                          sim_duration=5.0, delay=0.5)
    stats = summarize(sim, t_t + 0.5, z_t, t_start=1.5, label="scp")
    rel = np.sqrt(stats["tracking"]["mse"]) / 0.05
    assert rel < 0.5, stats
    assert stats["solve_times"] is not None
    assert sim["u"].shape[1] == robot.n_cables


def test_targets_shapes():
    t, z = figure8(M=2, T=5.0, N=100, radius=3.0)
    assert z.shape == (201, 2)
    assert abs(z[0, 0]) < 1e-9
    # figure-8 reaches +-radius in x
    assert abs(np.max(z[:, 0]) - 3.0) < 0.05
