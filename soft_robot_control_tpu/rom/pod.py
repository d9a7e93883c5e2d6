"""POD (proper orthogonal decomposition) model order reduction.

Capabilities match sofacontrol/mor/pod.py: SVD of a snapshot matrix with an
energy tolerance, affine projection x_r = U^T (x_f - x_ref) and lift
x_f = U x_r + x_ref, and matrix projection U^T M U.

TPU-first differences:
- The block basis V = kron(I_2, U) (mor/pod.py:19) is never materialized;
  projection/lifting of the packed state x=[v;q] operates on the two halves
  directly, halving FLOPs and memory traffic.
- All maps are jit/vmap-friendly pure functions of a `POD` pytree.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import qv2x


class POD:
    """POD basis pytree. U: (n_f, r); q_ref, v_ref: (n_f,)."""

    def __init__(self, info: dict):
        self.U = jnp.asarray(info["U"])
        self.q_ref = jnp.asarray(info["q_ref"])
        self.v_ref = jnp.asarray(info["v_ref"])

    def tree_flatten(self):
        return (self.U, self.q_ref, self.v_ref), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.U, obj.q_ref, obj.v_ref = children
        return obj

    # ------------------------------------------------------------------
    @property
    def x_ref(self):
        return qv2x(self.q_ref, self.v_ref)

    @property
    def rom_dim(self) -> int:
        return self.U.shape[1]

    @property
    def full_dim(self) -> int:
        return self.U.shape[0]

    def get_info(self) -> dict:
        return {"q_ref": np.asarray(self.q_ref), "v_ref": np.asarray(self.v_ref),
                "U": np.asarray(self.U), "type": "POD"}

    # ------------------------------------------------------------------
    # Reduced -> full (lift); mirrors compute_FO_state (mor/pod.py:22-37)
    def lift_q(self, q):
        return jnp.einsum("ij,...j->...i", self.U, q) + self.q_ref

    def lift_v(self, v):
        return jnp.einsum("ij,...j->...i", self.U, v) + self.v_ref

    def lift_x(self, x):
        r = self.rom_dim
        v = jnp.einsum("ij,...j->...i", self.U, x[..., :r]) + self.v_ref
        q = jnp.einsum("ij,...j->...i", self.U, x[..., r:]) + self.q_ref
        return qv2x(q, v)

    # Full -> reduced (project); mirrors compute_RO_state (mor/pod.py:39-54)
    def project_q(self, qf):
        return jnp.einsum("ji,...j->...i", self.U, qf - self.q_ref)

    def project_v(self, vf):
        return jnp.einsum("ji,...j->...i", self.U, vf - self.v_ref)

    def project_x(self, xf):
        n = self.full_dim
        v = jnp.einsum("ji,...j->...i", self.U, xf[..., :n] - self.v_ref)
        q = jnp.einsum("ji,...j->...i", self.U, xf[..., n:] - self.q_ref)
        return qv2x(q, v)

    # Matrix projection; mirrors compute_RO_matrix (mor/pod.py:56-72)
    def project_matrix(self, M, left: bool = False, right: bool = False):
        M = jnp.asarray(M)
        if (left and right) or (not left and not right):
            return self.U.T @ M @ self.U
        if left:
            return self.U.T @ M
        return M @ self.U

    def project_block_matrix(self, Mf):
        """Project a full-state matrix Mf (2n_f, 2n_f or n_rows, 2n_f shaped
        operator acting on x=[v;q]) with the block basis V = kron(I2, U):
        returns V^T Mf V or Mf V without materializing V."""
        n, r = self.full_dim, self.rom_dim
        Mf = jnp.asarray(Mf)
        # Right-multiply by V: columns [v-block @ U, q-block @ U]
        MV = jnp.concatenate((Mf[..., :n] @ self.U, Mf[..., n:] @ self.U), axis=-1)
        if Mf.shape[0] == 2 * n:
            return jnp.concatenate((self.U.T @ MV[:n], self.U.T @ MV[n:]), axis=0)
        return MV

    def project_output_matrix(self, Hf):
        """H = Hf V for a full-order output matrix Hf (n_z, 2 n_f)."""
        n = self.full_dim
        Hf = jnp.asarray(Hf)
        return jnp.concatenate((Hf[:, :n] @ self.U, Hf[:, n:] @ self.U), axis=1)


jax.tree_util.register_pytree_node(POD, lambda c: c.tree_flatten(), POD.tree_unflatten)


class pod_config:
    """POD options with the reference defaults (mor/pod.py:81-90)."""

    def __init__(self):
        self.pod_type = "v"  # 'q', 'v' or 'a'
        self.pod_tolerance = 1e-4
        self.preprocess = []
        self.preprocess_args = {"nbr_clusters": 0}


def get_snapshots(data: dict, pod_type: str) -> np.ndarray:
    """Extract snapshot matrix from a snapshot dict (mor/pod.py:144-154)."""
    if pod_type == "q":
        return np.asarray(data["q"]) - np.asarray(data["q"][0])
    if pod_type == "v":
        return np.asarray(data["v"])
    if pod_type == "a":
        return np.asarray(data["v+"]) - np.asarray(data["v"])
    raise ValueError(f"unknown pod_type {pod_type!r}")


def process_snapshots(snapshots: np.ndarray, preprocess, args) -> np.ndarray:
    if "normalize" in preprocess:
        lo, hi = snapshots.min(axis=0), snapshots.max(axis=0)
        snapshots = (snapshots - lo) / (hi + 1e-15 - lo)
    if "substract_mean" in preprocess:
        snapshots = snapshots - snapshots.mean(axis=0, keepdims=True)
    if "clustering" in preprocess and args.get("nbr_clusters", 0) > 0:
        snapshots = compute_kmeans_centroids(snapshots, args["nbr_clusters"])
    return snapshots


def compute_POD(snapshots: np.ndarray, tol: float, rom_dim: Optional[int] = None):
    """SVD-based POD of snapshots (n_f, n_snap).

    Keeps the smallest r such that discarded singular-value energy <= tol
    (with r >= 1), exactly the reference's loop (mor/pod.py:190-200).
    Returns (U_full, U, r, S).
    """
    U_full, S, _ = np.linalg.svd(snapshots, full_matrices=False)
    if rom_dim is not None:
        r = int(rom_dim)
    else:
        s2 = S**2
        tail = np.cumsum(s2[::-1])[::-1] / np.sum(s2)  # tail[i] = sum(s2[i:])/sum
        # smallest i >= 1 with tail[i] <= tol
        ok = np.nonzero(tail <= tol)[0]
        candidates = ok[ok >= 1]
        r = int(candidates[0]) if candidates.size else len(S)
    return U_full, U_full[:, :r], r, S


def run_POD(snapshots_file: str, POD_file: str, config: pod_config,
            rom_dim: Optional[int] = None) -> dict:
    """Offline POD pipeline: load snapshots pkl, SVD, save POD pkl.

    Artifact layout matches mor/pod.py:137-141 ({'POD_info', 'config',
    'Sigma'}) so reference POD pickles and ours are interchangeable.
    """
    from soft_robot_control_tpu.utils.io import load_data, save_data

    data = load_data(snapshots_file)
    snapshots = get_snapshots(data, config.pod_type)
    snapshots = process_snapshots(snapshots, config.preprocess, config.preprocess_args)
    _, U, r, S = compute_POD(snapshots.T, config.pod_tolerance, rom_dim=rom_dim)
    POD_info = {"U": U, "q_ref": np.asarray(data["q"][0]),
                "v_ref": np.zeros(np.shape(data["v"][0]))}
    results = {"POD_info": POD_info, "config": vars(config), "Sigma": S}
    save_data(POD_file, results)
    return results


def load_POD(POD_file: str) -> POD:
    """Load a POD model from a reference-format pickle (mor/pod.py:93-107)."""
    from soft_robot_control_tpu.utils.io import load_data

    if not os.path.isfile(POD_file):
        raise RuntimeError("POD file specified is not a valid file")
    return POD(load_data(POD_file)["POD_info"])


def compute_kmeans_centroids(snapshot: np.ndarray, k: int) -> np.ndarray:
    """k-means centroids for POD preprocessing (mor/pod.py:207-216)."""
    from sklearn.cluster import KMeans

    km = KMeans(k, n_init=100, max_iter=1000, random_state=0).fit(snapshot)
    return km.cluster_centers_
