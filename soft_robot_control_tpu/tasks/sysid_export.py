"""System-identification data export.

Capability parity with examples/diamond/SSM_sysID.py + collectData.py: run
decay experiments (release from actuated deflections), record the observed
outputs, and export them as CSV in the layout the SSMLearn MATLAB pipeline
consumes (one trajectory per file, columns = outputs over time), plus
pkl->csv conversion of recorded simulations.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.sim.fem_surrogate import FEMSurrogate, simulate
from soft_robot_control_tpu.utils.io import load_data


def collect_decay_trajectories(plant: FEMSurrogate, Hf, u_levels,
                               hold_time: float = 2.0, decay_time: float = 4.0,
                               dt: float = 0.01):
    """For each input level: hold u constant until (near) steady state,
    release (u=0) and record the decay of z = Hf x.

    Returns list of (t, z) decay trajectories (the SSMLearn training
    format: unforced decays toward the origin of the observed coordinates).
    """
    from soft_robot_control_tpu.sim.fem_surrogate import simulate_batch_chunked

    Hf = np.asarray(Hf)
    N_hold = int(hold_time / dt)
    N_decay = int(decay_time / dt)
    # one vmapped batch over all levels: at reference mesh scale the
    # per-step solve is bandwidth-bound on its preconditioner matrices,
    # which amortize across the batch (GEMM instead of per-level GEMV);
    # chunked in time — large batched scans kernel-fault the TPU runtime
    u_seqs = np.stack([
        np.concatenate([np.tile(np.asarray(u, float), (N_hold, 1)),
                        np.zeros((N_decay, plant.input_dim))], axis=0)
        for u in u_levels])
    x0 = jnp.tile(plant.x_rest()[None], (len(u_levels), 1))
    dtype = jnp.asarray(plant.H).dtype
    X = np.asarray(simulate_batch_chunked(plant, x0,
                                          jnp.asarray(u_seqs, dtype), dt))
    out = []
    t = dt * np.arange(N_decay + 1)
    for b in range(len(u_levels)):
        z = X[b, N_hold:] @ Hf.T
        out.append((t, z))
    return out


def export_decays_csv(decays, out_dir: str, prefix: str = "decay"):
    """Write each (t, z) decay to <prefix>_<i>.csv with columns [t, z...]."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, (t, z) in enumerate(decays):
        path = os.path.join(out_dir, f"{prefix}_{i}.csv")
        np.savetxt(path, np.column_stack([t, z]), delimiter=",")
        paths.append(path)
    return paths


def sim_pkl_to_csv(pkl_path: str, out_dir: Optional[str] = None):
    """Convert a recorded *_sim.pkl into t/u/z CSV files
    (examples/diamond/collectData.py role)."""
    data = load_data(pkl_path)
    out_dir = out_dir or os.path.dirname(pkl_path)
    base = os.path.splitext(os.path.basename(pkl_path))[0]
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for key in ("t", "u", "z", "z_hat"):
        if key in data and np.asarray(data[key]).size:
            path = os.path.join(out_dir, f"{base}_{key}.csv")
            np.savetxt(path, np.atleast_2d(np.asarray(data[key])),
                       delimiter=",")
            paths[key] = path
    return paths


def collect_actuated_trajectories(plant: FEMSurrogate, Hf, u_seqs,
                                  dt: float = 0.01):
    """Simulate the plant under each input sequence (T, m) from rest and
    record z = Hf x — training data for the SSM input-matrix fit
    (models/ssm_learn.py step 6; the reference gathers the same kind of
    actuated runs for SSMLearn via examples/diamond/SSM_sysID.py)."""
    from soft_robot_control_tpu.sim.fem_surrogate import simulate_batch_chunked

    Hf = np.asarray(Hf)
    u_arr = [np.atleast_2d(np.asarray(u, float)) for u in u_seqs]
    if len({u.shape for u in u_arr}) == 1:   # uniform lengths: one batch
        dtype = jnp.asarray(plant.H).dtype
        x0 = jnp.tile(plant.x_rest()[None], (len(u_arr), 1))
        X = np.asarray(simulate_batch_chunked(
            plant, x0, jnp.asarray(np.stack(u_arr), dtype), dt))
        return [(X[b, :-1] @ Hf.T, u_arr[b]) for b in range(len(u_arr))]
    out = []
    for u_seq in u_arr:
        X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u_seq),
                                dt))
        out.append((X[:-1] @ Hf.T, u_seq))
    return out


def train_ssm_native(plant: FEMSurrogate, Hf, u_levels, state_dim: int,
                     SSM_order: int = 3, ROM_order: int = 3,
                     n_delay: int = 0, hold_time: float = 2.0,
                     decay_time: float = 4.0, dt: float = 0.01,
                     settle_skip: int = 0, actuated_inputs=None,
                     save_path: Optional[str] = None, **learn_kwargs):
    """End-to-end native SSM identification: run the decay campaign on the
    plant and fit an SSMModel with models/ssm_learn.py — the workflow the
    reference splits across SSM_sysID.py -> CSV export -> MATLAB SSMLearn ->
    SSM_model.mat, collapsed into one on-device call.

    The equilibrium is taken from the plant rest state (the role of the
    reference's rest calibration) rather than estimated from decay tails.
    settle_skip drops the first samples of every decay: right after release
    the state still carries fast off-manifold transients whose projection
    corrupts the reduced-dynamics fit (SSMLearn's t_trunc plays this role);
    a model trained this way is valid ON the manifold, so predictions
    should likewise start post-transient.
    Returns the fitted SSMModel; optionally writes an SSM_model.mat.
    """
    from soft_robot_control_tpu.models.ssm_learn import learn_ssm, save_mat

    decays = collect_decay_trajectories(plant, Hf, u_levels,
                                        hold_time=hold_time,
                                        decay_time=decay_time, dt=dt)
    if actuated_inputs is not None:
        acts = collect_actuated_trajectories(plant, Hf, actuated_inputs,
                                             dt=dt)
        learn_kwargs.setdefault("actuated_trajs", [z for z, _ in acts])
        learn_kwargs.setdefault("input_trajs", [u for _, u in acts])
    Hf = np.asarray(Hf)
    z_eq = Hf @ np.asarray(plant.x_rest())
    if n_delay > 0:
        z_eq = np.tile(z_eq, n_delay + 1)
    model = learn_ssm([z[settle_skip:] for _, z in decays], dt,
                      state_dim=state_dim,
                      SSM_order=SSM_order, ROM_order=ROM_order,
                      n_delay=n_delay, z_ref=z_eq, **learn_kwargs)
    if save_path is not None:
        save_mat(model, save_path)
    return model
