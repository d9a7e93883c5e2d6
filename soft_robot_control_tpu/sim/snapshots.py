"""Snapshot capture during open-loop excitation.

Capability parity with the reference's snapshot machinery
(sofacontrol/utils.py:19-118 Point/SnapshotData and
sofacontrol/open_loop_controller.py:71-205): a per-step `Point` record, a
`SnapshotData` collector with the save_snapshot/add_point/simulation_end
contract, and an open-loop runner that drives the plant under a sequence,
asks the collector whether to save each point, and (with
save_dynamics=True) attaches the analytic dynamics matrices — the role of
SOFA's LDL export + extract_KDMb, here taken by plant.jacobians.

The TPWL-specific collector lives in models/tpwl_build.py (vectorized);
this module is the generic, reference-shaped API used by the POD pipeline
and custom collectors.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.sim.fem_surrogate import FEMSurrogate, simulate
from soft_robot_control_tpu.utils.io import save_data


class Point:
    """One captured simulation step (utils.py:19-39 field set; the FEM
    matrices K/D/M/H/S/b/f are replaced by the analytic (A, B, d))."""

    def __init__(self):
        self.step = None
        self.t = None
        self.q = None
        self.v = None
        self.u = None
        self.q_next = None
        self.v_next = None
        self.dt = None
        self.A = None
        self.B = None
        self.d = None


class SnapshotData:
    """Generic snapshot collector (utils.py:42-118 contract)."""

    def __init__(self, save_dynamics: bool = True):
        self.save_dynamics = save_dynamics
        self.dict = {"t": [], "q": [], "v": [], "u": [], "q+": [], "v+": [],
                     "dt": -1}
        if save_dynamics:
            self.dict.update({"A": [], "B": [], "d": []})

    def save_snapshot(self, point: Point, prev_point: Optional[Point]) -> bool:
        """Override to implement selective capture; default saves all."""
        return True

    def add_point(self, point: Point):
        if self.dict["dt"] == -1:
            self.dict["dt"] = point.dt
        self.dict["t"].append(point.t)
        self.dict["q"].append(point.q)
        self.dict["v"].append(point.v)
        self.dict["u"].append(point.u)
        self.dict["q+"].append(point.q_next)
        self.dict["v+"].append(point.v_next)
        if self.save_dynamics:
            self.dict["A"].append(point.A)
            self.dict["B"].append(point.B)
            self.dict["d"].append(point.d)

    def simulation_end(self, filename: Optional[str]):
        if self.dict["q"]:
            if filename is not None:
                save_data(filename, self.dict)
        else:
            print("No snapshots to save.")
        return self.dict


def run_open_loop_collection(plant: FEMSurrogate, u_sequence, save_sequence,
                             dt: float, snapshots: SnapshotData,
                             x0=None, filename: Optional[str] = None):
    """Drive the plant under (u_sequence (m, T) or (T, m), save_sequence)
    and feed the collector — the OpenLoopController capture loop
    (open_loop_controller.py:71-205), with the whole trajectory simulated
    as one device scan and the capture decisions made on host afterwards.
    """
    u = np.asarray(u_sequence, float)
    if u.shape[0] == plant.input_dim and u.ndim == 2 and u.shape[0] != u.shape[1]:
        u = u.T
    T = u.shape[0]
    save_seq = np.asarray(save_sequence, bool)
    x0 = plant.x_rest() if x0 is None else x0
    X = np.asarray(simulate(plant, jnp.asarray(x0), jnp.asarray(u), dt))
    n = plant.n_nodes_dof

    prev_point = None
    for i in range(T):
        if not save_seq[min(i, len(save_seq) - 1)]:
            continue
        pt = Point()
        pt.step = i
        pt.t = i * dt
        pt.q = X[i, n:]
        pt.v = X[i, :n]
        pt.u = u[i]
        pt.q_next = X[i + 1, n:]
        pt.v_next = X[i + 1, :n]
        pt.dt = dt
        if snapshots.save_dynamics:
            A, B, d = plant.jacobians(jnp.asarray(X[i]), jnp.asarray(u[i]))
            pt.A, pt.B, pt.d = np.asarray(A), np.asarray(B), np.asarray(d)
        if snapshots.save_snapshot(pt, prev_point):
            snapshots.add_point(pt)
        prev_point = pt
    return snapshots.simulation_end(filename)
