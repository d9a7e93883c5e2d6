"""Data-driven Spectral Submanifold (SSM) reduced dynamics.

Capability parity with sofacontrol/SSM/ssm.py (SSM / SSMDynamics): polynomial
reduced dynamics xdot = R phi(x) + B_r u (continuous) or x+ = Rd phi(x) +
Bd_r u (discrete), manifold chart C_map (reduced -> observed) and
parametrization W_map (observed -> reduced), Jacobians by automatic
differentiation, fe/be/bil discretization, and the algebraic manifold
observer x = W_map(z - z_ref).

TPU-first differences:
- sympy lambdify is replaced by static monomial exponent tables evaluated as
  power-product kernels (ops/monomials.py) — no symbolic code at runtime;
- Jacobians use jax.jacfwd (forward mode: n_x is tiny, outputs are wide);
- the model is a registered pytree: all maps are pure and vmappable, so
  whole-horizon linearization and batched rollouts are single vmap calls.

Loads the MATLAB artifacts produced by SSMLearn unchanged
(examples/hardware/SSMmodels/SSM_model.mat layout: py_data.model.{w_coeff,
v_coeff, r_coeff, B, rd_coeff, Bd, Ts}, py_data.params.{state_dim,
input_dim, output_dim, SSM_order, ROM_order}; ssm.py:30-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core import discretize as disc
from soft_robot_control_tpu.ops.monomials import eval_monomials, monomial_exponents


@jax.tree_util.register_pytree_node_class
class SSMModel:
    """SSM reduced dynamics pytree.

    Children: coefficient matrices + equilibrium point. Aux (static): exponent
    tables (as nested tuples), dims, flags.
    """

    _children = ("w_coeff", "v_coeff", "r_coeff", "B_r", "rd_coeff", "Bd_r",
                 "z_ref")

    def __init__(self, w_coeff, v_coeff, r_coeff, B_r, rd_coeff, Bd_r, z_ref,
                 state_dim: int, input_dim: int, output_dim: int,
                 SSM_order: int, ROM_order: int, Ts: float = 0.0,
                 discrete: bool = False, discr_method: str = "fe"):
        self.w_coeff = jnp.asarray(w_coeff)
        self.v_coeff = jnp.asarray(v_coeff)
        self.r_coeff = jnp.asarray(r_coeff)
        self.B_r = jnp.asarray(B_r)
        self.rd_coeff = None if rd_coeff is None else jnp.asarray(rd_coeff)
        self.Bd_r = None if Bd_r is None else jnp.asarray(Bd_r)
        self.z_ref = jnp.asarray(z_ref)
        self.state_dim = int(state_dim)
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)
        self.SSM_order = int(SSM_order)
        self.ROM_order = int(ROM_order)
        self.Ts = float(Ts)
        self.discrete = bool(discrete)
        self.discr_method = discr_method

    # pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, k) for k in self._children)
        aux = (self.state_dim, self.input_dim, self.output_dim, self.SSM_order,
               self.ROM_order, self.Ts, self.discrete, self.discr_method)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for k, c in zip(cls._children, children):
            setattr(obj, k, c)
        (obj.state_dim, obj.input_dim, obj.output_dim, obj.SSM_order,
         obj.ROM_order, obj.Ts, obj.discrete, obj.discr_method) = aux
        return obj

    # basis tables (cached per (dim, order)) ------------------------------
    @property
    def _rom_exps(self):
        return monomial_exponents(self.state_dim, self.ROM_order)

    @property
    def _ssm_exps(self):
        return monomial_exponents(self.output_dim, self.SSM_order)

    # dims / flags ---------------------------------------------------------
    nonlinear_observer = True

    @property
    def H(self):
        """Zeros placeholder (n_z, n_x): the true output map is nonlinear
        (ssm.py:73)."""
        return jnp.zeros((self.output_dim, self.state_dim),
                         dtype=self.w_coeff.dtype)

    def get_state_dim(self):
        return self.state_dim

    def get_input_dim(self):
        return self.input_dim

    def get_output_dim(self):
        return self.output_dim

    # polynomial maps --------------------------------------------------------
    def reduced_dynamics(self, x, u):
        return self.r_coeff @ eval_monomials(x, self._rom_exps) + self.B_r @ u

    def reduced_dynamics_discrete(self, x, u):
        return self.rd_coeff @ eval_monomials(x, self._rom_exps) + self.Bd_r @ u

    def C_map(self, x):
        """Reduced -> observed (chart); single vector in, vector out."""
        return self.w_coeff @ eval_monomials(x, self._ssm_exps)

    def W_map(self, z):
        """Observed -> reduced (parametrization)."""
        return self.v_coeff @ eval_monomials(z, self._ssm_exps)

    reduced_to_observed = C_map
    observed_to_reduced = W_map

    # shifted-output helpers (ssm.py:83-119) ---------------------------------
    def zfyf_to_zy(self, zf):
        return zf - self.z_ref

    def zy_to_zfyf(self, z):
        return z + self.z_ref

    def x_to_zfyf(self, x, zf=True):
        if jnp.ndim(x) == 1:
            return self.C_map(x) + self.z_ref
        return jax.vmap(self.C_map)(x) + self.z_ref

    def x_to_zy(self, x):
        if jnp.ndim(x) == 1:
            return self.C_map(x)
        return jax.vmap(self.C_map)(x)

    def compute_RO_state(self, z):
        """Manifold projection of an (unshifted) observation (ssm.py:338-344)."""
        return self.W_map(z - self.z_ref)

    # jacobians ----------------------------------------------------------------
    def get_continuous_jacobians(self, x, u):
        A = jax.jacfwd(self.reduced_dynamics, argnums=0)(x, u)
        B = self.B_r
        d = self.reduced_dynamics(x, u) - A @ x - B @ u
        return A, B, d

    def get_discrete_jacobians(self, x, u):
        A = jax.jacfwd(self.reduced_dynamics_discrete, argnums=0)(x, u)
        B = self.Bd_r
        d = self.reduced_dynamics_discrete(x, u) - A @ x - B @ u
        return A, B, d

    def get_jacobians(self, x, u, dt=None):
        """Discrete (A, B, d) at (x, u): native discrete model if available,
        else discretized continuous Jacobians (ssm.py:216-225)."""
        if self.discrete:
            return self.get_discrete_jacobians(x, u)
        A, B, d = self.get_continuous_jacobians(x, u)
        if dt is not None:
            A, B, d = self.discretize_dynamics(A, B, d, dt)
        return A, B, d

    def get_observer_jacobians(self, x):
        """(H, c) of the chart at x: z ≈ H x + c (ssm.py:228-235)."""
        H = jax.jacfwd(self.C_map)(x)
        c = self.C_map(x) - H @ x
        return H, c

    def discretize_dynamics(self, A_c, B_c, d_c, dt):
        return disc.discretize_affine(A_c, B_c, d_c, dt,
                                      method=self.discr_method)

    # simulation -----------------------------------------------------------
    @staticmethod
    def update_dynamics(x, u, A_d, B_d, d_d):
        return A_d @ x + B_d @ u + d_d

    def update_state(self, x, u, dt):
        A, B, d = self.get_jacobians(x, u, dt)
        return self.update_dynamics(x, u, A, B, d)

    def update_observer_state(self, x):
        H, c = self.get_observer_jacobians(x)
        return H @ x + c

    def rollout(self, x0, u, dt):
        """Scan rollout of the locally-linearized dynamics (ssm.py:134-156).
        Returns (x (N+1, n_x), z (N+1, n_z)) with z the unshifted output."""
        def step(x, u_t):
            x1 = self.update_state(x, u_t, dt)
            return x1, x1

        x0 = jnp.asarray(x0)
        _, xs = jax.lax.scan(step, x0, jnp.asarray(u))
        x = jnp.concatenate((x0[None], xs), axis=0)
        z = self.x_to_zfyf(x)
        return x, z

    def get_ref_point(self):
        return self.z_ref

    def get_sim_params(self):
        return {"discr_method": self.discr_method, "discrete": self.discrete}


# alias matching the reference class name (SSM/ssm.py:181)
SSMDynamics = SSMModel


def from_mat(data, eq_point, discrete=False, discr_method="fe") -> SSMModel:
    """Build an SSMModel from SSMLearn .mat content.

    `data` is either a path to the .mat file or the already-indexed
    py_data[0, 0] struct (the reference passes model=SSM_data['model'],
    params=SSM_data['params']; examples/hardware/diamond_SSM.py:40-44).
    """
    if isinstance(data, str):
        from scipy.io import loadmat

        data = loadmat(data)["py_data"][0, 0]
    model = data["model"]
    params = data["params"]

    def p(name):
        return int(params[name][0, 0][0, 0])

    def m(name):
        return model[name][0, 0]

    if eq_point is None and "z_ref" in getattr(model.dtype, "names", ()):
        # natively-trained artifacts carry their equilibrium (the reference
        # supplies it separately from rest_qv.pkl)
        eq_point = model["z_ref"][0, 0]
    return SSMModel(
        w_coeff=m("w_coeff"), v_coeff=m("v_coeff"), r_coeff=m("r_coeff"),
        B_r=m("B"), rd_coeff=m("rd_coeff"), Bd_r=m("Bd"),
        z_ref=np.asarray(eq_point, dtype=float).reshape(-1),
        state_dim=p("state_dim"), input_dim=p("input_dim"),
        output_dim=p("output_dim"), SSM_order=p("SSM_order"),
        ROM_order=p("ROM_order"), Ts=float(m("Ts")[0, 0]),
        discrete=discrete, discr_method=discr_method)
