"""Shared test pipeline: chain plant -> snapshots -> POD -> TPWL model."""

import numpy as np
import jax.numpy as jnp

from soft_robot_control_tpu.models.tpwl_build import build_tpwl_model, tpwl_config
from soft_robot_control_tpu.rom.pod import POD, compute_POD
from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot, simulate
from soft_robot_control_tpu.control.sequences import BaseRobotSequences


def chain_pipeline(n_nodes=10, n_cables=4, dt=0.02, umax=3.0, seed=0,
                   threshold=0.5, pod_tol=1e-8, discr_method="be"):
    """Returns (plant, rom, tpwl_model, Hf, Cf, X, u) for a chain robot.

    Output z: tip position (1-dim). Measurement y: tip position + velocity.
    """
    plant = make_chain_robot(n_nodes=n_nodes, n_cables=n_cables, seed=seed)
    seqs = BaseRobotSequences(n_cables, u0=np.zeros(n_cables),
                              umax=umax * np.ones(n_cables),
                              umin=np.zeros(n_cables), dt=dt, t0=0.5)
    seqs.active_inputs = [True] * n_cables
    u_seq, _, _ = seqs.lhs_sequence(nbr_samples=12, t_step=0.3, seed=seed + 1)
    u = np.asarray(u_seq).T
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u), dt))

    n = plant.n_nodes_dof
    snaps = np.concatenate([X[1:, :n], X[1:, n:] - X[0, n:]], axis=0)
    _, U, r, _ = compute_POD(snaps.T, pod_tol)
    rom = POD({"U": U, "q_ref": X[0, n:], "v_ref": np.zeros(n)})

    # output: tip position; measurement: velocity + position of 3 nodes
    # (a single-node measurement leaves the reduced state weakly observable
    # and the EKF useless — the reference likewise measures multiple DoF)
    Hf = np.zeros((1, 2 * n))
    Hf[0, 2 * n - 1] = 1.0
    meas_nodes = [n // 3, 2 * n // 3, n - 1]
    Cf = np.zeros((2 * len(meas_nodes), 2 * n))
    for i, node in enumerate(meas_nodes):
        Cf[i, node] = 1.0                          # velocity
        Cf[len(meas_nodes) + i, n + node] = 1.0    # position

    cfg = tpwl_config(TPWL_threshold=threshold,
                      TPWL_weighting_factors={"q": 10.0, "v": 1.0})
    model = build_tpwl_model(plant, rom, X[:-1], u, config=cfg, Hf=Hf, Cf=Cf,
                             params={"dist_weights": {"q": 10.0, "v": 1.0}},
                             discr_method=discr_method)
    return plant, rom, model, Hf, Cf, X, u
