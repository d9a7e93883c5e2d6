"""Policy-class tests: setpoint LQR (discrete + continuous), open-loop
replay with observer, and the single-shot iLQR controller, all in closed
loop on the chain plant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.types import QuadraticCost, Target
from soft_robot_control_tpu.control.policies import (OpenLoop, StateCLQR,
                                                     StateDLQR, ilqr)
from soft_robot_control_tpu.estimators.full_state import FullStateObserver
from soft_robot_control_tpu.sim.closed_loop import run_closed_loop
from soft_robot_control_tpu.sim.fem_surrogate import simulate

from helpers import chain_pipeline


@pytest.fixture(scope="module")
def pipeline():
    return chain_pipeline()


class _Lin:
    def __init__(self, M):
        self.M = jnp.asarray(M)

    def evaluate(self, x, key=None):
        return self.M @ x


def _setpoint_target(plant, rom, model, u_set, dt=0.02, hold=6.0):
    """Steady state under a constant input as the regulation target, with
    the local linearization (A, B) at that point."""
    N = int(hold / dt)
    u = np.tile(u_set, (N, 1))
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u), dt))
    x_set = np.asarray(rom.project_x(jnp.asarray(X[-1])))
    A, B, _ = model.get_jacobians(jnp.asarray(x_set))
    return Target(x=x_set, u=u_set, A=np.asarray(A), B=np.asarray(B))


@pytest.mark.parametrize("cls", [StateDLQR, StateCLQR])
def test_setpoint_lqr_regulates(pipeline, cls):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    u_set = np.array([1.5, 0.0, 1.0, 0.0])
    target = _setpoint_target(plant, rom, model, u_set, dt=dt)
    nx = model.state_dim
    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ np.array([[500.0]]) @ H + 1e-3 * np.eye(nx),
                         R=0.1 * np.eye(4))
    ctrl = cls(model, cost, target, dt=dt, delay=0.2)
    sim = run_closed_loop(plant, ctrl, sim_duration=5.0, dt=dt,
                          measurement_model=_Lin(Cf), output_model=_Lin(Hf))
    z_goal = float(np.asarray(rom.lift_x(jnp.asarray(target.x))) @ Hf[0])
    z_final = float(np.mean(sim["z"][-40:, 0]))
    z0 = float(X[0] @ Hf[0])
    assert abs(z_final - z_goal) < 0.25 * abs(z_goal - z0) + 0.01, \
        (z_final, z_goal, z0)


def test_open_loop_replay_with_observer(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    T = 100
    t_seq = dt * np.arange(T)
    u_seq = np.zeros((4, T))
    u_seq[0] = 1.0 * (1 - np.cos(2 * np.pi * t_seq / 1.0)) / 2
    # pass-through observer on the raw plant state (the reduced-H variant
    # is only meaningful when fed reduced states, as in TemplateController)
    ctrl = OpenLoop(4, t_seq, u_seq, np.ones(T, dtype=bool), delay=0.3)
    ctrl.add_observer(FullStateObserver(model.state_dim))
    sim = run_closed_loop(plant, ctrl, sim_duration=3.0, dt=dt,
                          measurement_model=_Lin(Cf), output_model=_Lin(Hf))
    u_sim = sim["u"]
    t_sim = sim["t"]
    # during the delay the input is zero; afterwards it replays the sequence
    assert np.all(u_sim[t_sim < 0.3] == 0)
    mask = (t_sim > 0.35) & (t_sim < 0.3 + t_seq[-1] - 0.05)
    expect = np.interp(t_sim[mask], t_seq + 0.0, u_seq[0])  # interp at t
    # reference quirk: the replay interpolates at sim time t, not t - delay
    # (tpwl/controllers.py:486) — verify our port matches that semantics
    expect_t = np.interp(t_sim[mask], t_seq, u_seq[0])
    np.testing.assert_allclose(u_sim[mask, 0], expect_t, atol=1e-9)


@pytest.mark.slow
def test_ilqr_controller_closed_loop(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    z0 = float(X[0] @ Hf[0])
    tf = 3.0
    t_traj = np.arange(0, tf + dt, dt)
    z_traj = (z0 + 0.06 * np.sin(2 * np.pi * t_traj / 3.0))[:, None]
    target = Target(t=t_traj, z=z_traj, Hf=Hf)
    cost = QuadraticCost(Q=np.array([[500.0]]), R=0.01 * np.eye(4),
                         Qf=np.array([[500.0]]))
    ctrl = ilqr(model, cost, target, dt=dt, delay=0.2)
    sim = run_closed_loop(plant, ctrl, sim_duration=tf, dt=dt,
                          measurement_model=_Lin(Cf), output_model=_Lin(Hf))
    t_sim = sim["t"]
    mask = t_sim > 0.6
    z_des = np.interp(t_sim[mask] - 0.2, t_traj, z_traj[:, 0])
    err = sim["z"][mask, 0] - z_des
    rel = np.sqrt(np.mean(err**2)) / 0.06
    assert rel < 0.4, rel