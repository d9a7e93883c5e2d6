"""Snapshot-capture API tests: selective capture contract, dynamics
attachment, file roundtrip, and a distance-threshold custom collector."""

import numpy as np
import pytest

from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot
from soft_robot_control_tpu.sim.snapshots import (Point, SnapshotData,
                                                  run_open_loop_collection)
from soft_robot_control_tpu.utils.io import load_data


@pytest.fixture(scope="module")
def plant():
    return make_chain_robot(n_nodes=8, n_cables=3, seed=0)


def test_collects_all_points_with_dynamics(plant, tmp_path):
    T = 40
    u = np.abs(np.random.default_rng(0).normal(size=(T, 3)))
    snaps = SnapshotData(save_dynamics=True)
    path = str(tmp_path / "snaps.pkl")
    out = run_open_loop_collection(plant, u, np.ones(T, bool), 0.02, snaps,
                                   filename=path)
    assert len(out["q"]) == T
    assert out["dt"] == 0.02
    # dynamics tangency: f-consistency of the attached affine model
    A, B, d = out["A"][5], out["B"][5], out["d"][5]
    x = np.concatenate((out["v"][5], out["q"][5]))
    import jax.numpy as jnp

    f = np.asarray(plant.f(jnp.asarray(x), jnp.asarray(u[5])))
    np.testing.assert_allclose(A @ x + B @ u[5] + d, f, atol=1e-10)
    # roundtrip
    back = load_data(path)
    np.testing.assert_allclose(back["q"][3], out["q"][3])


def test_selective_capture(plant):
    T = 30
    u = np.abs(np.random.default_rng(1).normal(size=(T, 3)))
    save = np.zeros(T, bool)
    save[::5] = True
    snaps = SnapshotData(save_dynamics=False)
    out = run_open_loop_collection(plant, u, save, 0.02, snaps, filename=None)
    assert len(out["q"]) == int(save.sum())
    assert "A" not in out


def test_custom_collector_distance_threshold(plant):
    class DistanceCollector(SnapshotData):
        def __init__(self, threshold):
            super().__init__(save_dynamics=False)
            self.threshold = threshold

        def save_snapshot(self, point, prev_point):
            if not self.dict["q"]:
                return True
            d = np.linalg.norm(np.asarray(self.dict["q"]) - point.q, axis=1)
            return d.min() >= self.threshold

    T = 60
    u = np.abs(np.random.default_rng(2).normal(size=(T, 3))) * 2
    col = DistanceCollector(0.05)
    out = run_open_loop_collection(plant, u, np.ones(T, bool), 0.02, col,
                                   filename=None)
    assert 1 <= len(out["q"]) < T
    # all saved points are pairwise >= threshold apart
    Q = np.asarray(out["q"])
    for i in range(len(Q)):
        for j in range(i + 1, len(Q)):
            assert np.linalg.norm(Q[i] - Q[j]) >= 0.05 - 1e-12