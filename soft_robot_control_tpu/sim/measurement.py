"""Measurement / output models: sparse node-selection matrices y = C x.

Capability parity with sofacontrol/measurement_models.py: select positions
and/or velocities of a node subset out of the packed full state x = [v; q]
(3 DoF per node), with optional additive Gaussian noise.

TPU-first: `MeasurementModel.evaluate` takes an explicit PRNG key (pure,
vmappable across batched plants) instead of np.random global state. The C
matrix is kept as (rows, cols, vals) index form so projections and products
avoid materializing the (n_y, 2*3*num_nodes) zero matrix; `C_dense()`
materializes on demand for ROM projection.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import x2qv


def _selection_rows(nodes, num_nodes, pos: bool, vel: bool):
    """Column indices of the selected components in x = [v(3n); q(3n)],
    ordered [v-block; q-block] like buildCv/buildCq stacking
    (measurement_models.py:29-37)."""
    nodes = list(nodes)
    cols = []
    if vel:
        for node in nodes:
            cols += [3 * node, 3 * node + 1, 3 * node + 2]
    if pos:
        for node in nodes:
            cols += [3 * num_nodes + 3 * node, 3 * num_nodes + 3 * node + 1,
                     3 * num_nodes + 3 * node + 2]
    return np.asarray(cols, dtype=np.int64)


class linearModel:
    """y = C x via gather; matches measurement_models.py:7-44 semantics."""

    def __init__(self, nodes, num_nodes, pos=True, vel=True):
        self.pos, self.vel = pos, vel
        self.num_nodes = num_nodes
        self.cols = _selection_rows(nodes, num_nodes, pos, vel)
        self.n_full = 6 * num_nodes

    @property
    def C(self):
        return self.C_dense()

    def C_dense(self):
        C = np.zeros((len(self.cols), self.n_full))
        C[np.arange(len(self.cols)), self.cols] = 1.0
        return C

    def evaluate(self, x, qv=False):
        z = jnp.asarray(x)[..., self.cols]
        if qv:
            q, v = x2qv(z)
            return jnp.concatenate((q, v), axis=-1)
        return z


class MeasurementModel(linearModel):
    """Noisy measurement y = C x + w, w ~ N(mean, blockdiag(S_v, S_q))
    (measurement_models.py:47-84). Noise draws take an explicit PRNG key."""

    def __init__(self, nodes, num_nodes, pos=True, vel=True, mu_q=None,
                 S_q=None, mu_v=None, S_v=None, qv=False):
        super().__init__(nodes, num_nodes, pos=pos, vel=vel)
        ny = len(self.cols)
        pos_dim = 3 * len(nodes) if pos else 0
        vel_dim = 3 * len(nodes) if vel else 0
        mu_q = np.zeros(pos_dim) if mu_q is None else np.asarray(mu_q)
        mu_v = np.zeros(vel_dim) if mu_v is None else np.asarray(mu_v)
        S_q = np.zeros((pos_dim, pos_dim)) if S_q is None else np.asarray(S_q)
        S_v = np.zeros((vel_dim, vel_dim)) if S_v is None else np.asarray(S_v)
        self.mean = jnp.asarray(np.concatenate((mu_v, mu_q)))
        cov = np.zeros((ny, ny))
        cov[:vel_dim, :vel_dim] = S_v
        cov[vel_dim:, vel_dim:] = S_q
        self.covariance = jnp.asarray(cov)
        # cholesky factor for sampling (guard zero covariance)
        self._chol = jnp.asarray(np.linalg.cholesky(cov + 1e-300 * np.eye(ny)))
        self.qv = qv

    def evaluate(self, x, key: Optional[jax.Array] = None):
        z = jnp.asarray(x)[..., self.cols]
        if key is not None:
            noise = self.mean + self._chol @ jax.random.normal(
                key, (len(self.cols),), dtype=z.dtype)
            z = z + noise
        if self.qv:
            q, v = x2qv(z)
            return jnp.concatenate((q, v), axis=-1)
        return z
