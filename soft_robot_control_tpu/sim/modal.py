"""Modal analysis: mode shapes of the plant + batched decay simulations.

Capability parity with launch_sofa_modal_analysis.py: compute structural
mode shapes, build initial conditions as mode shape x amplitude x sign
combinations, simulate the free decay of each, and save per-case decay
trajectories with crude resume (already-produced cases are skipped,
launch_sofa_modal_analysis.py:253-256).

TPU-first: all cases run as ONE vmapped batch of decay simulations instead
of the reference's serial sweep — the entire modal campaign is a single
device program.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import qv2x
from soft_robot_control_tpu.sim.fem_surrogate import FEMSurrogate, simulate_batch
from soft_robot_control_tpu.utils.io import load_data, save_data


def mode_shapes(plant: FEMSurrogate, n_modes: Optional[int] = None):
    """Undamped structural modes of the plant: solve K phi = w^2 M phi.

    Returns (frequencies_rad, modes (n, n_modes)), ascending frequency —
    the role of the reference's MATLAB-exported mode1-3.mat vectors
    (robots/data/, used by launch_sofa_modal_analysis.py:96-126).
    """
    K = np.asarray(plant.K0 if hasattr(plant, "K0") else plant.K, float)
    if hasattr(plant, "free_mask"):  # restrict to free dofs (Dirichlet base)
        free = np.asarray(plant.free_mask) > 0
        Kf = K[np.ix_(free, free)]
        m = float(plant.m_node)
        w2f, phif = np.linalg.eigh(Kf / m)
        phi_full = np.zeros((K.shape[0], phif.shape[1]))
        phi_full[free] = phif
        order = np.argsort(np.maximum(w2f, 0.0))
        w = np.sqrt(np.maximum(w2f, 0.0)[order])
        phi = phi_full[:, order]
        if n_modes is not None:
            w, phi = w[:n_modes], phi[:, :n_modes]
        return w, phi
    m = float(plant.m_node)
    w2, phi = np.linalg.eigh(K / m)
    w2 = np.maximum(w2, 0.0)
    order = np.argsort(w2)
    w = np.sqrt(w2[order])
    phi = phi[:, order]
    if n_modes is not None:
        w, phi = w[:n_modes], phi[:, :n_modes]
    return w, phi


def modal_decay_batch(plant: FEMSurrogate, modes, amplitudes: Sequence[float],
                      signs: Sequence[float] = (1.0, -1.0),
                      duration: float = 3.0, dt: float = 0.01,
                      save_dir: Optional[str] = None):
    """Simulate free decay from q = q_rest + sign * amp * mode for every
    (mode, amplitude, sign) combination, as one vmapped batch.

    Returns dict case_name -> trajectory (T+1, 2n). With save_dir set,
    each case is written to <case>.pkl and existing files are skipped.
    """
    modes = np.atleast_2d(np.asarray(modes, float))
    if modes.shape[0] == plant.n_nodes_dof and modes.shape[1] != plant.n_nodes_dof:
        modes = modes.T
    cases = []
    ics = []
    for mi, mode in enumerate(modes):
        for amp in amplitudes:
            for sign in signs:
                name = f"mode{mi + 1}_amp{amp:g}_sign{int(np.sign(sign))}"
                if save_dir is not None and os.path.isfile(
                        os.path.join(save_dir, name + ".pkl")):
                    continue  # crude resume
                q0 = np.asarray(plant.q_rest) + sign * amp * mode
                ics.append(qv2x(q0, np.zeros_like(q0)))
                cases.append(name)

    results = {}
    if cases:
        N = int(duration / dt)
        x0 = jnp.asarray(np.stack(ics))
        u = jnp.zeros((len(cases), N, plant.input_dim), x0.dtype)
        X = np.asarray(simulate_batch(plant, x0, u, dt))
        for name, traj in zip(cases, X):
            results[name] = traj
            if save_dir is not None:
                os.makedirs(save_dir, exist_ok=True)
                n = plant.n_nodes_dof
                save_data(os.path.join(save_dir, name + ".pkl"),
                          {"t": dt * np.arange(traj.shape[0]),
                           "q": traj[:, n:], "v": traj[:, :n], "dt": dt})
    # load any previously produced cases
    if save_dir is not None and os.path.isdir(save_dir):
        for f in os.listdir(save_dir):
            if f.endswith(".pkl"):
                name = f[:-4]
                if name not in results and name.startswith("mode"):
                    data = load_data(os.path.join(save_dir, f))
                    results[name] = np.concatenate(
                        (np.asarray(data["v"]), np.asarray(data["q"])), axis=1)
    return results


REFERENCE_MODE_DIR = "/root/reference/robots/data"


def load_reference_modes(mode_dir: str = None, transform: bool = True):
    """Load the shipped Diamond mode-shape vectors mode1-3.mat
    (robots/data/, each (3, 1628) per-node displacement), flattened to
    (4884,) and rotated into the Diamond scene frame (the loader applies
    rotation [90,0,0]; displacement vectors rotate, translations don't) —
    ready to drive `modal_decay_batch` exactly like
    launch_sofa_modal_analysis.py:96-126 uses them with q0 * scale_mode."""
    import scipy.io as sio

    mode_dir = mode_dir or REFERENCE_MODE_DIR
    modes = []
    for i in (1, 2, 3):
        m = sio.loadmat(os.path.join(mode_dir, f"mode{i}.mat"))
        vec = np.asarray(m[f"mode{i}"], float)          # (3, n_nodes)
        if transform:
            R = np.array([[1.0, 0.0, 0.0],
                          [0.0, 0.0, -1.0],
                          [0.0, 1.0, 0.0]])             # Rx(90 deg)
            vec = R @ vec
        modes.append(vec.T.reshape(-1))                 # (3 n_nodes,)
    return np.stack(modes)
