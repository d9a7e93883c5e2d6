"""Golden closed-loop trajectory regression (VERDICT r1 weak #7).

A deterministic float64 closed loop (chain plant + TPWL + EKF + GuSTO MPC)
is compared bit-for-bit-ish against a committed fixture; unit-level 1e-6
parity cannot catch silent behavioral drift in the orchestration layer —
this can. Regenerate deliberately with REGEN=1 python -m pytest
tests/test_golden.py after an intentional behavior change.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.types import QuadraticCost
from soft_robot_control_tpu.control.mpc import scp
from soft_robot_control_tpu.control.service import GuSTOService
from soft_robot_control_tpu.estimators.ekf import DiscreteEKFObserver
from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
from soft_robot_control_tpu.sim.closed_loop import run_closed_loop

from helpers import chain_pipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "closed_loop_chain.npz")


def _run():
    plant, rom, model, Hf, Cf, X, u_data = chain_pipeline(
        n_nodes=10, n_cables=4, dt=0.02, threshold=0.5)
    dt = 0.02
    model = model.pre_discretize(dt)
    gmodel = TPWLGuSTO(model)
    nz = np.asarray(model.H).shape[0]
    Qz = 200.0 * np.eye(nz)
    R = 1e-5 * np.eye(plant.input_dim)

    t_t = np.arange(0.0, 8.0, dt)
    z_eq = float(np.asarray(plant.x_rest()) @ np.asarray(Hf).T)
    z_t = (z_eq + 0.05 * np.sin(2 * np.pi * t_t / 3.0))[:, None]
    z_solver = np.asarray(model.zfyf_to_zy(zf=jnp.asarray(z_t)))

    x0 = np.asarray(model.rom.project_x(model.rom.x_ref))
    service = GuSTOService(gmodel, 5, 2 * dt, Qz, R, x0, t=t_t, z=z_solver,
                           max_gusto_iters=2, convg_thresh=1e-2, verbose=0)
    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ Qz @ H, R=R)
    dx_char = np.asarray(model.get_characteristic_dx(dt))
    observer = DiscreteEKFObserver(model, W=np.diag(dx_char + 1e-8),
                                   V=0.1 * np.eye(np.asarray(Cf).shape[0]))
    controller = scp(model, cost, dt, N_replan=2, observer=observer,
                     delay=0.5, wait=True, solver_service=service, mpc=True)

    class _Lin:
        def __init__(self, M):
            self.M = jnp.asarray(M)

        def evaluate(self, x, key=None):
            return self.M @ x

    sim = run_closed_loop(plant, controller, sim_duration=3.0, dt=dt,
                          measurement_model=_Lin(Cf), output_model=_Lin(Hf))
    return np.asarray(sim["z"]), np.asarray(sim["u"])


def test_closed_loop_matches_golden():
    z, u = _run()
    if os.environ.get("REGEN") == "1" or not os.path.exists(GOLDEN):
        np.savez(GOLDEN, z=z, u=u)
        if os.environ.get("REGEN") != "1":
            pytest.skip("golden fixture created; rerun to compare")
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(z, ref["z"], rtol=1e-6, atol=1e-9,
                               err_msg="closed-loop z drifted from golden")
    np.testing.assert_allclose(u, ref["u"], rtol=1e-5, atol=1e-8,
                               err_msg="closed-loop u drifted from golden")
