"""Single-linearization (ROMPC-style) linear reduced-order model.

Capability parity with sofacontrol/baselines/rompc/rompc_utils.py
(LinearROM / TPWL2LinearROM): take one linearization point, ZOH-discretize
it once, and expose the same output/measurement API as the TPWL model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core import discretize as disc
from soft_robot_control_tpu.rom.pod import POD


@jax.tree_util.register_pytree_node_class
class LinearROM:
    _children = ("A_d", "B_d", "d_d", "C", "y_ref", "H", "z_ref", "rom")

    def __init__(self, data, dt, Cf=None, Hf=None):
        if not isinstance(data, dict):
            from soft_robot_control_tpu.utils.io import load_data

            data = load_data(data)
        if "A_d" in data and data.get("dt") is not None and \
                abs(float(data["dt"]) - float(dt)) < 1e-12:
            # prefer the dictionary's projected implicit step map
            # (rompc_utils.py TPWL2LinearROM uses the discrete point when
            # available): the continuous Galerkin point is stiff at tet
            # scale and its ZOH is unstable (spectral radius >1).
            self.A_d = jnp.asarray(data["A_d"])
            self.B_d = jnp.asarray(data["B_d"])
            self.d_d = jnp.asarray(np.asarray(data["d_d"]).reshape(-1))
        else:
            A_c = jnp.asarray(data["A_c"])
            B_c = jnp.asarray(data["B_c"])
            d_c = jnp.asarray(np.asarray(data["d_c"]).reshape(-1))
            self.A_d, self.B_d, self.d_d = disc.zoh_affine(A_c, B_c, d_c, dt)
        if data["rom_info"]["type"] != "POD":
            raise NotImplementedError("Unknown ROM type")
        self.rom = POD(data["rom_info"])
        self.C = None
        self.y_ref = None
        self.H = None
        self.z_ref = None
        if Cf is not None:
            self.C = self.rom.project_output_matrix(_dense(Cf))
            self.y_ref = jnp.asarray(_dense(Cf)) @ self.rom.x_ref
        if Hf is not None:
            self.H = self.rom.project_output_matrix(_dense(Hf))
            self.z_ref = jnp.asarray(_dense(Hf)) @ self.rom.x_ref

    def tree_flatten(self):
        return tuple(getattr(self, k) for k in self._children), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for k, c in zip(cls._children, children):
            setattr(obj, k, c)
        return obj

    # dims ----------------------------------------------------------------
    @property
    def state_dim(self):
        return self.A_d.shape[0]

    @property
    def input_dim(self):
        return self.B_d.shape[1]

    def get_state_dim(self):
        return self.state_dim

    def get_input_dim(self):
        return self.input_dim

    def get_output_dim(self):
        return None if self.H is None else self.H.shape[0]

    def get_meas_dim(self):
        return None if self.C is None else self.C.shape[0]

    nonlinear_observer = False

    # dynamics -------------------------------------------------------------
    def get_jacobians(self, x, dt=None, u=None):
        return self.A_d, self.B_d, self.d_d

    @staticmethod
    def update_dynamics(x, u, A_d, B_d, d_d):
        return A_d @ x + B_d @ u + d_d

    def update_state(self, x, u):
        return self.A_d @ x + self.B_d @ u + self.d_d

    def rollout(self, x0, u, dt=None):
        def step(x, u_t):
            x1 = self.update_state(x, u_t)
            return x1, x1

        x0 = jnp.asarray(x0)
        _, xs = jax.lax.scan(step, x0, jnp.asarray(u))
        x = jnp.concatenate((x0[None], xs), axis=0)
        z = self.x_to_zfyf(x, zf=True) if self.H is not None else None
        return x, z

    # output maps (same contract as TPWLModel) ------------------------------
    def zfyf_to_zy(self, zf=None, yf=None):
        if zf is not None and self.z_ref is not None:
            return zf - self.z_ref
        if yf is not None and self.y_ref is not None:
            return yf - self.y_ref
        raise RuntimeError("Need to set output or meas. model")

    def zy_to_zfyf(self, z=None, y=None):
        if z is not None and self.z_ref is not None:
            return z + self.z_ref
        if y is not None and self.y_ref is not None:
            return y + self.y_ref
        raise RuntimeError("Need to set output or meas. model")

    def x_to_zfyf(self, x, zf=False, yf=False):
        if zf and self.H is not None:
            return jnp.einsum("ij,...j->...i", self.H, x) + self.z_ref
        if yf and self.C is not None:
            return jnp.einsum("ij,...j->...i", self.C, x) + self.y_ref
        raise RuntimeError("Need to set output or meas. model")

    def get_sim_params(self):
        return {"type": "LinearROM"}


def _dense(M):
    if hasattr(M, "todense"):
        return np.asarray(M.todense())
    return np.asarray(M)


def tpwl_to_linear_rom(tpwl_path_or_dict, save_path=None):
    """Extract the first TPWL linearization point as a LinearROM data dict
    (rompc_utils.py:131-147)."""
    from soft_robot_control_tpu.utils.io import load_data, save_data

    data = tpwl_path_or_dict
    if not isinstance(data, dict):
        data = load_data(data)
    out = {"A_c": np.asarray(data["A_c"][0]), "B_c": np.asarray(data["B_c"][0]),
           "d_c": np.asarray(data["d_c"][0]), "rom_info": data["rom_info"]}
    if "A_d" in data:
        # carry the dictionary's discrete family: at tet scale the
        # ZOH of the continuous Galerkin point is unstable (spectral
        # radius >1 — stiff modes that backward Euler statically
        # condenses), while the projected implicit step map is stable.
        out.update(A_d=np.asarray(data["A_d"][0]),
                   B_d=np.asarray(data["B_d"][0]),
                   d_d=np.asarray(data["d_d"][0]), dt=float(data["dt"]))
    if save_path is not None:
        save_data(save_path, out)
    return out
