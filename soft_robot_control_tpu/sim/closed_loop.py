"""Closed-loop simulation harness — the SOFA launch-loop replacement.

Capability parity with sofacontrol/closed_loop_controller.py +
launch_sofa.py:66-90: step the plant, form the (optionally noisy)
measurement, call `controller.evaluate(t, y, x, u_prev)`, apply the command,
and log {t, u, z, z_hat, q, x} until `sim_duration`, returning the same
sim_data dict layout the reference pickles.

The plant here is the in-repo FEM surrogate (ground-truth physics on
device); the controller objects are the policies in control/. The fully
jitted, vmapped closed-loop (MPC + EKF across a batch of targets) lives in
control/batch_mpc.py — this module is the general harness that accepts any
host-side controller.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.sim.fem_surrogate import FEMSurrogate


def run_closed_loop(plant: FEMSurrogate, controller, sim_duration, dt,
                    x0=None, measurement_model=None, output_model=None,
                    key: Optional[jax.Array] = None, save_full_state=False,
                    u_limits=None):
    """Run the closed loop and return the sim_data dict
    (closed_loop_controller.py:50-58,118-137 layout).

    u_limits=(u_min, u_max) clamps the applied command to the actuation
    limits — the reference bridge clamps actuator values at min_force
    (closed_loop_controller.py:104-117; cables are pull-only and bounded),
    which in particular bounds the LQR feedback term u_bar + K (x_hat -
    x_bar) that the plan-level QP constraints cannot see."""
    if x0 is None:
        x0 = plant.x_rest()
    x = jnp.asarray(x0)
    controller.set_sim_timestep(dt)

    step_fn = jax.jit(lambda x_, u_: plant.step(x_, u_, dt))

    n_steps = int(round(sim_duration / dt))
    m = plant.input_dim
    u_prev = np.zeros(m)

    data = {"t": [], "u": [], "z": [], "z_hat": [], "q": [], "x": []}
    for i in range(n_steps):
        t = i * dt
        if measurement_model is not None:
            if key is not None:
                key, sub = jax.random.split(key)
                y = measurement_model.evaluate(x, key=sub)
            else:
                y = measurement_model.evaluate(x)
        else:
            y = x
        u = controller.evaluate(t, np.asarray(y), np.asarray(x), u_prev)
        if u_limits is not None:
            u = np.clip(np.asarray(u), u_limits[0], u_limits[1])
        x = step_fn(x, jnp.asarray(u, x.dtype))
        u_prev = np.asarray(u)

        data["t"].append(t)
        data["u"].append(np.asarray(u))
        if output_model is not None:
            data["z"].append(np.asarray(output_model.evaluate(x)))
        if getattr(controller, "observer", None) is not None and \
                getattr(controller.observer, "z", None) is not None:
            data["z_hat"].append(np.asarray(controller.observer.z))
        if save_full_state:
            data["x"].append(np.asarray(x))

    sim_data = {k: np.asarray(v) for k, v in data.items() if len(v)}
    sim_data["dt"] = dt
    if hasattr(controller, "save_controller_info"):
        sim_data["info"] = controller.save_controller_info()
    return sim_data
