"""Auxiliary subsystem tests: modal analysis, calibration, sysID export,
timing, marshalling, plotting (headless), launcher CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot, simulate
from soft_robot_control_tpu.sim.modal import mode_shapes, modal_decay_batch
from soft_robot_control_tpu.tasks import calibration as cal
from soft_robot_control_tpu.tasks import sysid_export
from soft_robot_control_tpu.utils.marshal import arr2np, np2arr
from soft_robot_control_tpu.utils.timing import Timer, block_time


@pytest.fixture(scope="module")
def plant():
    return make_chain_robot(n_nodes=8, n_cables=3, seed=0)


def test_mode_shapes_orthogonal(plant):
    w, phi = mode_shapes(plant, n_modes=4)
    assert np.all(np.diff(w) >= -1e-9)
    np.testing.assert_allclose(phi.T @ phi, np.eye(4), atol=1e-10)


def test_modal_decay_batch_with_resume(plant, tmp_path):
    w, phi = mode_shapes(plant, n_modes=2)
    d = str(tmp_path / "modal")
    res = modal_decay_batch(plant, phi.T, amplitudes=[0.05], dt=0.02,
                            duration=1.0, save_dir=d)
    assert len(res) == 4  # 2 modes x 1 amp x 2 signs
    for name, traj in res.items():
        assert np.all(np.isfinite(traj))
        # decay: final velocity smaller than initial displacement scale
        n = plant.n_nodes_dof
        assert np.linalg.norm(traj[-1, :n]) < 0.5
    # resume: second call loads from disk without re-simulating
    res2 = modal_decay_batch(plant, phi.T, amplitudes=[0.05], dt=0.02,
                             duration=1.0, save_dir=d)
    assert set(res2) == set(res)
    np.testing.assert_allclose(res2[sorted(res)[0]], res[sorted(res)[0]],
                               atol=1e-12)


def test_calibrate_rest(plant):
    q, v = cal.calibrate_rest(plant, settle_time=3.0, dt=0.02)
    np.testing.assert_allclose(q, np.asarray(plant.q_rest), atol=1e-6)
    assert np.linalg.norm(v) < 1e-6


def test_calibrate_output_node(plant):
    n = plant.n_nodes_dof
    u = np.zeros((100, plant.input_dim))
    u[:, 0] = 2.0
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u), 0.02))
    q_traj = X[:, n:]
    target_node = n - 2
    measured = q_traj[:, target_node] + 0.3  # constant marker offset
    best, mses = cal.calibrate_output_node(q_traj[1:], measured[1:])
    assert best == target_node


def test_calibrate_actuator_gains(plant):
    # small forces keep the cubic term negligible so the one-shot gain fit
    # is meaningful (same linear-regime assumption as the reference's
    # actuator calibration)
    n = plant.n_nodes_dof
    u = np.zeros((150, plant.input_dim))
    u[:, 0] = 0.3
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u), 0.02))
    true_defl = X[-1, n + n - 1] - np.asarray(plant.q_rest)[n - 1]
    gains = cal.calibrate_actuator_gains(plant, {0: 1.5 * true_defl}, 0.3,
                                         dt=0.02)
    assert gains[0] == pytest.approx(1.5, rel=1e-3)
    # exact identity: the gain-scaled plant under u equals the original
    # plant under gains*u (H @ diag(g) @ u == H @ (g*u)), regardless of the
    # plant's nonlinearity
    plant2 = cal.apply_actuator_gains(plant, gains)
    X2 = np.asarray(simulate(plant2, plant2.x_rest(), jnp.asarray(u), 0.02))
    X3 = np.asarray(simulate(plant, plant.x_rest(),
                             jnp.asarray(u * gains[None, :]), 0.02))
    np.testing.assert_allclose(X2, X3, atol=1e-9)


def test_sysid_export(plant, tmp_path):
    n = plant.n_nodes_dof
    Hf = np.zeros((1, 2 * n))
    Hf[0, 2 * n - 1] = 1.0
    decays = sysid_export.collect_decay_trajectories(
        plant, Hf, u_levels=[np.array([2.0, 0, 0]), np.array([0, 2.0, 0])],
        hold_time=1.0, decay_time=1.0, dt=0.02)
    assert len(decays) == 2
    paths = sysid_export.export_decays_csv(decays, str(tmp_path))
    back = np.loadtxt(paths[0], delimiter=",")
    np.testing.assert_allclose(back[:, 1:], decays[0][1], atol=1e-12)


def test_timer_and_marshal():
    t = Timer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        sum(range(1000))
    s = t.stats("a")
    assert s["count"] == 2 and s["max"] >= s["min"] > 0

    x = [1.0, 2.0, 3.0, 4.0]
    a = arr2np(x, 2)
    assert a.shape == (2, 2)
    assert np2arr(a) == x


def test_plotting_headless(tmp_path):
    from soft_robot_control_tpu.tasks.plotting import (plot_inputs,
                                                       plot_solve_times,
                                                       plot_tracking)

    sim = {"t": np.linspace(0, 1, 50),
           "z": np.sin(np.linspace(0, 1, 50))[:, None],
           "u": np.random.default_rng(0).random((50, 4)),
           "info": {"solve_times": [0.01, 0.02, 0.015]}}
    plot_tracking(sim, sim["t"], sim["z"] * 0.9,
                  save_path=str(tmp_path / "track.png"))
    plot_inputs(sim, save_path=str(tmp_path / "inputs.png"))
    plot_solve_times(sim, realtime_limit=0.05,
                     save_path=str(tmp_path / "solves.png"))
    for f in ("track.png", "inputs.png", "solves.png"):
        assert (tmp_path / f).stat().st_size > 1000


@pytest.mark.slow
def test_launcher_cli(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    d = str(tmp_path / "run")
    for recipe, key in [("collect_pod_data", "snapshots"),
                        ("compute_pod_basis", "rom_dim"),
                        ("collect_tpwl_data", "tpwl_points"),
                        ("tpwl_check", "rollout_mse")]:
        out = subprocess.run(
            [sys.executable, "launch.py", "diamond", recipe, "--save-dir", d,
             "--platform", "cpu"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=500)
        assert out.returncode == 0, out.stderr[-2000:]
        last = out.stdout.strip().splitlines()[-1]
        res = json.loads(last)
        assert key in res, res


def test_baseline_comparison(tmp_path):
    """Baseline-comparison analysis (tasks/baseline_comparison.py):
    reference MSE methodology + figure set over multiple labeled runs
    (examples/hardware/plotting.py role)."""
    import numpy as np
    from soft_robot_control_tpu.tasks.baseline_comparison import (
        compare_runs, load_run, tracking_mse)
    from soft_robot_control_tpu.utils.io import save_data

    t = np.arange(0, 5, 0.01)
    z_target = np.stack([np.sin(t), np.cos(t)], axis=1)
    runs = {}
    for label, lag in (("good", 0.0), ("laggy", 0.3)):
        z = np.stack([np.sin(t - lag), np.cos(t - lag)], axis=1)
        sim = {"t": t, "z": z, "u": np.zeros((len(t), 4)),
               "info": {"solve_times": 1e-3 * np.abs(np.random.default_rng(0)
                                                     .normal(1, 0.1, 50))}}
        p = str(tmp_path / f"{label}_sim.pkl")
        save_data(p, sim)
        runs[label] = load_run(p, t_start=0.0)
    table = compare_runs(runs, t, z_target, dims=(0, 1),
                         realtime_limit=0.01,
                         save_prefix=str(tmp_path / "cmp"))
    assert table["good"]["mse"] < table["laggy"]["mse"]
    assert (tmp_path / "cmp_xy.png").exists()
    assert (tmp_path / "cmp_t.png").exists()
    assert (tmp_path / "cmp_solvetimes.png").exists()
    assert table["good"]["solve_times"]["n"] == 50
