"""End-to-end closed-loop tests on the FEM surrogate plant — the BASELINE
config analogs:

- config 1: finite-horizon tracking LQR on the saved TPWL ROM, closed loop
  against the true plant with an EKF observer;
- config 3: GuSTO SCP MPC (in-process solver service) tracking a sine target
  with EKF state estimation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.types import QuadraticCost, Target
from soft_robot_control_tpu.control.mpc import scp
from soft_robot_control_tpu.control.policies import TrajTracking
from soft_robot_control_tpu.control.service import GuSTOService
from soft_robot_control_tpu.estimators.ekf import DiscreteEKFObserver
from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
from soft_robot_control_tpu.sim.closed_loop import run_closed_loop
from soft_robot_control_tpu.sim.fem_surrogate import simulate
from soft_robot_control_tpu.sim.measurement import linearModel

from helpers import chain_pipeline


@pytest.fixture(scope="module")
def pipeline():
    return chain_pipeline(n_nodes=10, n_cables=4, dt=0.02, threshold=0.5)


class _TipOutput:
    """Full-order output model z = Hf x for logging."""

    def __init__(self, Hf):
        self.Hf = jnp.asarray(Hf)

    def evaluate(self, x):
        return self.Hf @ x


class _TipMeasurement:
    def __init__(self, Cf):
        self.Cf = jnp.asarray(Cf)

    def evaluate(self, x, key=None):
        return self.Cf @ x


def test_config1_traj_tracking_lqr_closed_loop(pipeline):
    plant, rom, model, Hf, Cf, X, u_data = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)

    # target: an actual plant trajectory under a known input sequence
    T_steps = 150
    t_traj = dt * np.arange(T_steps + 1)
    u_traj = np.zeros((T_steps + 1, plant.input_dim))
    u_traj[:, 0] = 1.5 * (1 - np.cos(2 * np.pi * t_traj / 1.5)) / 2
    u_traj[:, 2] = 1.0 * (1 - np.cos(2 * np.pi * t_traj / 2.0)) / 2
    X_des = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u_traj[:-1]), dt))
    x_des_red = np.asarray(jax.vmap(rom.project_x)(jnp.asarray(X_des)))

    target = Target(t=t_traj, x=x_des_red, u=u_traj)
    nx = model.state_dim
    cost = QuadraticCost(Q=np.eye(nx), R=0.01 * np.eye(plant.input_dim))

    # default observer = FullStateObserver on the projected true state
    # (the reference's default, tpwl/controllers.py:36-39)
    controller = TrajTracking(model, cost, target, dt=dt, delay=0.0)

    sim = run_closed_loop(plant, controller, sim_duration=T_steps * dt, dt=dt,
                          measurement_model=_TipMeasurement(Cf),
                          output_model=_TipOutput(Hf))

    z_sim = sim["z"][:, 0]
    z_des = X_des[:-1] @ Hf[0]
    err = z_sim - z_des
    scale = np.std(z_des - z_des[0]) + 1e-9
    rel = np.sqrt(np.mean(err**2)) / scale
    assert rel < 0.2, f"tracking LQR rel RMSE {rel:.3f}"


@pytest.mark.slow
def test_config3_gusto_mpc_closed_loop(pipeline):
    plant, rom, model, Hf, Cf, X, u_data = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    gusto_model = TPWLGuSTO(model)

    # sine target on the tip position around the rest value; the period is
    # chosen large relative to the N_replan planning latency, like the
    # reference's 5-10 s figure-8 periods (plan-ahead semantics introduce an
    # inherent phase lag of about one replanning window)
    z0 = float(X[0] @ Hf[0])
    t_target = np.arange(0, 12, dt)
    z_target = (z0 + 0.08 * np.sin(2 * np.pi * t_target / 4.0))[:, None]

    N = 5
    Qz = np.array([[200.0]])
    R = 1e-3 * np.eye(plant.input_dim)
    x0_red = np.asarray(rom.project_x(jnp.asarray(X[0])))

    service = GuSTOService(gusto_model, N, dt * 2, Qz, R, x0_red,
                           t=t_target, z=z_target, verbose=0,
                           max_gusto_iters=5, convg_thresh=1e-2)

    # feedback-gain cost mirrors the reference recipe: output-space Qz
    # projected to the state, small R (examples/diamond/diamond.py:239-246)
    nx = model.state_dim
    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ Qz @ H, R=1e-3 * np.eye(4))
    dx_char = np.asarray(model.get_characteristic_dx(dt))
    observer = DiscreteEKFObserver(model, W=np.diag(dx_char + 1e-8),
                                   V=0.1 * np.eye(Cf.shape[0]))
    controller = scp(model, cost, dt, N_replan=2, observer=observer,
                     delay=0.2, wait=True, solver_service=service, mpc=True)

    sim = run_closed_loop(plant, controller, sim_duration=6.0, dt=dt,
                          measurement_model=_TipMeasurement(Cf),
                          output_model=_TipOutput(Hf))

    # evaluate tracking after the delay window
    t_sim = sim["t"]
    z_sim = sim["z"][:, 0]
    z_des = np.interp(t_sim, t_target, z_target[:, 0])
    mask = t_sim > 1.0
    err = z_sim[mask] - z_des[mask]
    amp = 0.08
    rel = np.sqrt(np.mean(err**2)) / amp
    assert rel < 0.3, f"MPC tracking rel RMSE {rel:.3f}"
    # solver stayed healthy
    assert len(service.gusto.uopt) == N


@pytest.mark.slow
def test_config3_async_solver_overlap(pipeline):
    """The wait=False path: solves run in a background thread while the
    simulation executes the current plan (the reference's ROS-async
    contract, scp/ros.py:183-210 / tpwl/controllers.py:263-274)."""
    plant, rom, model, Hf, Cf, X, u_data = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    gusto_model = TPWLGuSTO(model)

    z0 = float(X[0] @ Hf[0])
    t_target = np.arange(0, 12, dt)
    z_target = (z0 + 0.05 * np.sin(2 * np.pi * t_target / 4.0))[:, None]

    N = 5
    Qz = np.array([[200.0]])
    R = 1e-3 * np.eye(plant.input_dim)
    x0_red = np.asarray(rom.project_x(jnp.asarray(X[0])))
    service = GuSTOService(gusto_model, N, dt * 2, Qz, R, x0_red,
                           t=t_target, z=z_target, verbose=0,
                           max_gusto_iters=3, convg_thresh=1e-2)
    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ Qz @ H, R=1e-3 * np.eye(4))
    dx_char = np.asarray(model.get_characteristic_dx(dt))
    observer = DiscreteEKFObserver(model, W=np.diag(dx_char + 1e-8),
                                   V=0.1 * np.eye(Cf.shape[0]))
    controller = scp(model, cost, dt, N_replan=4, observer=observer,
                     delay=0.2, wait=False, solver_service=service, mpc=True)

    sim = run_closed_loop(plant, controller, sim_duration=4.0, dt=dt,
                          measurement_model=_TipMeasurement(Cf),
                          output_model=_TipOutput(Hf))
    t_sim = sim["t"]
    z_sim = sim["z"][:, 0]
    z_des = np.interp(t_sim, t_target, z_target[:, 0])
    mask = t_sim > 1.5
    rel = np.sqrt(np.mean((z_sim[mask] - z_des[mask])**2)) / 0.05
    assert rel < 0.4, f"async MPC rel RMSE {rel:.3f}"
    # multiple async solves actually happened
    assert len(controller.solve_times) >= 3
