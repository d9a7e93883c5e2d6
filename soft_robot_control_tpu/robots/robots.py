"""Robot definitions: geometry/actuation metadata + surrogate plant.

Capability parity with robots/environments.py + examples/hardware/model.py:
each robot class bundles the plant (here the in-repo FEM surrogate instead
of a SOFA scene graph), actuation limits, default measurement/output nodes,
simulation timestep, and its excitation-sequence factory.

Reference parameters honored:
- Diamond: 4 cables, u in [0, 1500] mN (hardware-calibrated u_max=1500,
  examples/hardware/model.py:25; 1628 nodes / 9768-dim full state,
  robots/environments.py:144) — surrogate scaled to n_nodes DoF.
- Trunk: 8 cables, u in [0, 800] (robots/environments.py:44).
- Finger: 1 cable, u in [0, 2000] (open_loop_sequences.py:244-250).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from soft_robot_control_tpu.control import sequences as seqs
from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot


class SurrogateRobot:
    """Base robot: surrogate plant + metadata + sequence factory."""

    name = "surrogate"
    n_cables = 4
    u_min = 0.0
    u_max = 1.0
    dt = 0.01
    n_nodes = 12

    def __init__(self, n_nodes: Optional[int] = None, seed: int = 0, **plant_kwargs):
        self.nb_nodes = n_nodes or self.n_nodes
        self.plant = self._make_plant(self.nb_nodes, seed, **plant_kwargs)
        self.sequences = self._make_sequences()

    def _make_plant(self, n_nodes, seed, **kw):
        return make_chain_robot(n_nodes=n_nodes, n_cables=self.n_cables,
                                seed=seed, **kw)

    def _make_sequences(self):
        s = seqs.BaseRobotSequences(
            self.n_cables, u0=np.zeros(self.n_cables),
            umax=self.u_max * np.ones(self.n_cables),
            umin=self.u_min * np.ones(self.n_cables), dt=self.dt, t0=1.0)
        s.active_inputs = [True] * self.n_cables
        return s

    # measurement / output models over surrogate DoF (1 DoF per node here;
    # the reference uses 3 DoF per mesh node) -----------------------------
    @property
    def default_output_nodes(self):
        return [self.nb_nodes - 1]

    @property
    def default_measurement_nodes(self):
        n = self.nb_nodes
        return [n // 3, 2 * n // 3, n - 1]

    def get_measurement_model(self, nodes=None, noise_q=0.0, noise_v=0.0):
        nodes = nodes if nodes is not None else self.default_measurement_nodes
        n = self.nb_nodes
        rows = []
        for node in nodes:
            rows.append(("v", node))
        for node in nodes:
            rows.append(("q", node))
        C = np.zeros((len(rows), 2 * n))
        for i, (kind, node) in enumerate(rows):
            C[i, node if kind == "v" else n + node] = 1.0
        return C

    def get_output_model(self, nodes=None):
        nodes = nodes if nodes is not None else self.default_output_nodes
        n = self.nb_nodes
        H = np.zeros((len(nodes), 2 * n))
        for i, node in enumerate(nodes):
            H[i, n + node] = 1.0
        return H


class DiamondRobot(SurrogateRobot):
    """Hardware-calibrated Diamond analog (examples/hardware/model.py:28-45)."""

    name = "diamond"
    n_cables = 4
    u_min = 0.0
    u_max = 1500.0
    dt = 0.01
    n_nodes = 12

    def _make_plant(self, n_nodes, seed, **kw):
        # stiffness scaled so u_max-scale forces give O(1) deflections
        defaults = dict(k=40.0 * 500.0, m_node=0.45 / n_nodes, alpha=2.5,
                        beta=0.01, gamma=25.0 * 500.0)
        defaults.update(kw)
        return make_chain_robot(n_nodes=n_nodes, n_cables=self.n_cables,
                                seed=seed, **defaults)

    def _make_sequences(self):
        s = seqs.DiamondRobotSequences(dt=self.dt, t0=1.0)
        return s


class TrunkRobot(SurrogateRobot):
    """Trunk analog: 8 cables, u in [0, 800] (robots/environments.py:39-137)."""

    name = "trunk"
    n_cables = 8
    u_min = 0.0
    u_max = 800.0
    dt = 0.01
    n_nodes = 10

    def _make_plant(self, n_nodes, seed, **kw):
        defaults = dict(k=40.0 * 300.0, m_node=0.42 / n_nodes, alpha=1.5,
                        beta=0.01, gamma=25.0 * 300.0)
        defaults.update(kw)
        return make_chain_robot(n_nodes=n_nodes, n_cables=self.n_cables,
                                seed=seed, **defaults)

    def _make_sequences(self):
        return seqs.TrunkRobotSequences(dt=self.dt, t0=1.0)


class FingerRobot(SurrogateRobot):
    """Finger: 1 cable, u in [0, 2000] (open_loop_sequences.py:244-250;
    the reference has sequences + mesh but no environment class)."""

    name = "finger"
    n_cables = 1
    u_min = 0.0
    u_max = 2000.0
    dt = 0.01
    n_nodes = 8

    def _make_plant(self, n_nodes, seed, **kw):
        defaults = dict(k=40.0 * 600.0, m_node=0.2 / n_nodes, alpha=1.5,
                        beta=0.01, gamma=25.0 * 600.0)
        defaults.update(kw)
        return make_chain_robot(n_nodes=n_nodes, n_cables=1, seed=seed,
                                **defaults)

    def _make_sequences(self):
        return seqs.FingerRobotSequences(dt=self.dt, t0=1.0)


# ---------------------------------------------------------------------------
# Reference-mesh tet-FEM robots (full scale)


class TetMeshRobot:
    """Robot over the tet-FEM plant built from the reference's shipped mesh
    — full reference dimensions (Diamond 1628 nodes -> 9768-dim state, Trunk
    709 -> 4254). Measurement/output models follow the reference node
    conventions with 3 DoF per node (sofacontrol/measurement_models.py)."""

    name = "tetmesh"
    n_cables = 4
    u_min = 0.0
    u_max = 1.0
    dt = 0.01
    default_output_nodes = [0]
    default_measurement_nodes = [0]

    def __init__(self, dt: float = None, **plant_kwargs):
        if dt is not None:
            self.dt = dt
        self.plant = self._make_plant(dt=self.dt, **plant_kwargs)
        self.nb_nodes = self.plant.n_nodes
        self.sequences = self._make_sequences()

    def _make_plant(self, **kw):
        raise NotImplementedError

    def _make_sequences(self):
        s = seqs.BaseRobotSequences(
            self.n_cables, u0=np.zeros(self.n_cables),
            umax=self.u_max * np.ones(self.n_cables),
            umin=self.u_min * np.ones(self.n_cables), dt=self.dt, t0=1.0)
        s.active_inputs = [True] * self.n_cables
        return s

    def get_measurement_model(self, nodes=None, pos=True, vel=True):
        from soft_robot_control_tpu.sim.measurement import linearModel
        nodes = nodes if nodes is not None else self.default_measurement_nodes
        return linearModel(nodes, self.nb_nodes, pos=pos, vel=vel).C_dense()

    def get_output_model(self, nodes=None, pos=True, vel=False):
        """Position outputs of the end-effector node by default (the
        reference tracks node positions; velocities excluded unless asked,
        examples/diamond/diamond.py:167,222)."""
        from soft_robot_control_tpu.sim.measurement import linearModel
        nodes = nodes if nodes is not None else self.default_output_nodes
        return linearModel(nodes, self.nb_nodes, pos=pos, vel=vel).C_dense()


class DiamondTetRobot(TetMeshRobot):
    """Hardware-calibrated Diamond on the shipped diamond.vtu
    (examples/hardware/model.py:28-45; robots/environments.py:139-238).
    End effector node 1354, elbows [726, 139, 1445, 729]
    (examples/diamond/diamond.py:14-15)."""

    name = "diamond_tet"
    n_cables = 4
    u_min = 0.0
    u_max = 1500.0
    dt = 0.01
    default_output_nodes = [1354]
    default_measurement_nodes = [1354, 726, 139, 1445, 729]

    def _make_plant(self, **kw):
        from soft_robot_control_tpu.sim.fem_tet import diamond_tet_fem
        return diamond_tet_fem(**kw)

    def _make_sequences(self):
        return seqs.DiamondRobotSequences(dt=self.dt, t0=1.0)


class TrunkTetRobot(TetMeshRobot):
    """Trunk on the shipped trunk.vtk (robots/environments.py:39-137).
    Tip node 51, defaults [51, 22, 37] (examples/trunk/trunk.py:15)."""

    name = "trunk_tet"
    n_cables = 8
    u_min = 0.0
    u_max = 800.0
    dt = 0.01
    default_output_nodes = [51]
    default_measurement_nodes = [51, 22, 37]

    def _make_plant(self, **kw):
        from soft_robot_control_tpu.sim.fem_tet import trunk_tet_fem
        return trunk_tet_fem(**kw)

    def _make_sequences(self):
        return seqs.TrunkRobotSequences(dt=self.dt, t0=1.0)
