"""Trajectory-PieceWise-Linear (TPWL) reduced dynamics, TPU-native.

Capability parity with sofacontrol/tpwl/tpwl.py (TPWL / TPWLATV): a
dictionary of linearization points {q, v, u, A_c, B_c, d_c}, point selection
by weighted nearest neighbor or exponential weighting, discretization
(fe/be/bil/zoh), pre-discretization caching, rollout, and ROM-projected
output/measurement maps C = Cf V, H = Hf V.

TPU-first design:
- The point dictionary is stored as stacked arrays (P, 2r, 2r)… so point
  selection is one fused distance reduction + argmin and the dynamics fetch
  is a single gather (or, in 'weighting' mode, one einsum over the stacked
  tensor that maps onto the MXU). No Python loops anywhere.
- `pre_discretize` discretizes all P points in one vmapped expm batch
  (vs the Python loop at tpwl/tpwl.py:299-322).
- `rollout` is a `lax.scan`; batched rollouts are `vmap` of that scan.
- The model is a registered pytree: it can be closed over by jit, donated,
  sharded over a mesh (shard the P axis), and vmapped.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core import discretize as disc
from soft_robot_control_tpu.core.packing import qv2x, x2qv
from soft_robot_control_tpu.rom.pod import POD

DISCR_METHOD_DEFAULT = "fe"  # reference default in TPWL.__init__ (tpwl.py:28)
TPWL_METHOD_DEFAULT = "nn"


@jax.tree_util.register_pytree_node_class
class TPWLModel:
    """Stacked TPWL dictionary + ROM + output maps (immutable pytree).

    Children: all arrays. Aux (static): discr_method, tpwl_method,
    pre_discretized_dt.
    """

    _children = ("q", "v", "u", "A_c", "B_c", "d_c", "A_d", "B_d", "d_d",
                 "C", "y_ref", "H", "z_ref", "dist_w_q", "dist_w_v", "beta",
                 "rom")

    def __init__(self, q, v, u, A_c, B_c, d_c, rom: POD,
                 A_d=None, B_d=None, d_d=None,
                 C=None, y_ref=None, H=None, z_ref=None,
                 dist_w_q=1.0, dist_w_v=1.0, beta=None,
                 discr_method: str = DISCR_METHOD_DEFAULT,
                 tpwl_method: str = TPWL_METHOD_DEFAULT,
                 pre_discretized_dt: Optional[float] = None):
        self.q, self.v, self.u = jnp.asarray(q), jnp.asarray(v), jnp.asarray(u)
        self.A_c, self.B_c, self.d_c = jnp.asarray(A_c), jnp.asarray(B_c), jnp.asarray(d_c)
        self.A_d = None if A_d is None else jnp.asarray(A_d)
        self.B_d = None if B_d is None else jnp.asarray(B_d)
        self.d_d = None if d_d is None else jnp.asarray(d_d)
        self.C = None if C is None else jnp.asarray(C)
        self.y_ref = None if y_ref is None else jnp.asarray(y_ref)
        self.H = None if H is None else jnp.asarray(H)
        self.z_ref = None if z_ref is None else jnp.asarray(z_ref)
        self.dist_w_q = jnp.asarray(dist_w_q, dtype=self.q.dtype)
        self.dist_w_v = jnp.asarray(dist_w_v, dtype=self.q.dtype)
        self.beta = None if beta is None else jnp.asarray(beta, dtype=self.q.dtype)
        self.rom = rom
        self.discr_method = discr_method
        self.tpwl_method = tpwl_method
        self.pre_discretized_dt = pre_discretized_dt

    # pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = tuple(getattr(self, k) for k in self._children)
        aux = (self.discr_method, self.tpwl_method, self.pre_discretized_dt)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for k, c in zip(cls._children, children):
            setattr(obj, k, c)
        obj.discr_method, obj.tpwl_method, obj.pre_discretized_dt = aux
        return obj

    def _replace(self, **kw):
        children = {k: getattr(self, k) for k in self._children}
        aux = dict(discr_method=self.discr_method, tpwl_method=self.tpwl_method,
                   pre_discretized_dt=self.pre_discretized_dt)
        children.update({k: v for k, v in kw.items() if k in children})
        aux.update({k: v for k, v in kw.items() if k in aux})
        obj = TPWLModel.__new__(TPWLModel)
        for k, c in children.items():
            setattr(obj, k, c)
        obj.discr_method = aux["discr_method"]
        obj.tpwl_method = aux["tpwl_method"]
        obj.pre_discretized_dt = aux["pre_discretized_dt"]
        return obj

    # dims --------------------------------------------------------------
    @property
    def num_points(self) -> int:
        return self.q.shape[0]

    @property
    def state_dim(self) -> int:
        return 2 * self.q.shape[1]

    @property
    def input_dim(self) -> int:
        return self.u.shape[1]

    @property
    def output_dim(self):
        return None if self.H is None else self.H.shape[0]

    @property
    def meas_dim(self):
        return None if self.C is None else self.C.shape[0]

    # aliases for controller code written against the reference API
    def get_state_dim(self):
        return self.state_dim

    def get_input_dim(self):
        return self.input_dim

    def get_output_dim(self):
        return self.output_dim

    def get_meas_dim(self):
        return self.meas_dim

    nonlinear_observer = False

    # output / measurement models ----------------------------------------
    def set_measurement_model(self, Cf):
        """C = Cf V, y_ref = Cf x_ref (tpwl.py:81-84), V never materialized."""
        Cf = _dense(Cf)
        return self._replace(C=self.rom.project_output_matrix(Cf),
                             y_ref=jnp.asarray(Cf) @ self.rom.x_ref)

    def set_output_model(self, Hf):
        Hf = _dense(Hf)
        return self._replace(H=self.rom.project_output_matrix(Hf),
                             z_ref=jnp.asarray(Hf) @ self.rom.x_ref)

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

    def x_to_zy(self, x, z=False, y=False):
        if z and self.H is not None:
            return jnp.einsum("ij,...j->...i", self.H, x)
        if y and self.C is not None:
            return jnp.einsum("ij,...j->...i", self.C, x)
        raise RuntimeError("Need to set output or meas. model")

    # point selection -----------------------------------------------------
    def point_distances(self, x):
        """Weighted distances to every dictionary point (tpwl.py:160-168)."""
        q, v = x2qv(x)
        q_dist = self.dist_w_q * jnp.linalg.norm(self.q - q, axis=1)
        v_dist = self.dist_w_v * jnp.linalg.norm(self.v - v, axis=1)
        return q_dist + v_dist

    def calc_nearest_point(self, x):
        return jnp.argmin(self.point_distances(x))

    def calc_weighting_factors(self, x):
        """Exponential weights exp(-beta d/d_min), normalized; exact nearest
        point gets weight 1 if its distance is 0 (tpwl.py:170-191)."""
        dist = self.point_distances(x)
        m_idx = jnp.argmin(dist)
        m = dist[m_idx]
        safe_m = jnp.where(m == 0, 1.0, m)
        w = jnp.exp(-self.beta * dist / safe_m)
        w = w / jnp.sum(w)
        one_hot = jnp.zeros_like(dist).at[m_idx].set(1.0)
        return jnp.where(m == 0, one_hot, w)

    # jacobians ------------------------------------------------------------
    def get_jacobians(self, x, dt=None, u=None):
        """(A, B, d) at x: continuous if dt is None, else discrete.

        Uses the pre-discretized cache when dt == pre_discretized_dt (a
        Python-level check, so it is resolved at trace time), mirroring
        tpwl.py:236-270.
        """
        if self.tpwl_method == "weighting":
            w = self.calc_weighting_factors(x)
            A = jnp.einsum("i,ijk->jk", w, self.A_c)
            B = jnp.einsum("i,ijk->jk", w, self.B_c)
            d = jnp.einsum("i,ij->j", w, self.d_c)
            if dt is not None:
                A, B, d = self.discretize_dynamics(A, B, d, dt)
            return A, B, d

        if self.tpwl_method != "nn":
            raise RuntimeError("tpwl method should be nn or weighting")

        i = self.calc_nearest_point(x)
        if (self.pre_discretized_dt is not None and dt is not None
                and dt == self.pre_discretized_dt):
            return self.A_d[i], self.B_d[i], self.d_d[i]
        A, B, d = self.A_c[i], self.B_c[i], self.d_c[i]
        if dt is not None:
            A, B, d = self.discretize_dynamics(A, B, d, dt)
        return A, B, d

    def discretize_dynamics(self, A_c, B_c, d_c, dt):
        return disc.discretize_affine(A_c, B_c, d_c, dt, method=self.discr_method)

    def pre_discretize(self, dt) -> "TPWLModel":
        """Discretize every dictionary point in one vmapped batch. A
        discrete-native dictionary (A_d already present at this dt, e.g.
        built by TetFEM.reduced_discrete_dynamics) is returned as-is."""
        if self.A_d is not None and self.pre_discretized_dt is not None:
            if abs(self.pre_discretized_dt - float(dt)) < 1e-12:
                return self
            # re-discretize the continuous matrices below at the new dt
            # (valid: discrete-mode dictionaries carry both families)
        if self.tpwl_method != "nn":
            raise RuntimeError("tpwl method should be nn to pre-discretize")
        A_d, B_d, d_d = disc.discretize_affine_batch(
            self.A_c, self.B_c, self.d_c, dt, method=self.discr_method)
        return self._replace(A_d=A_d, B_d=B_d, d_d=d_d,
                             pre_discretized_dt=float(dt))

    # simulation -------------------------------------------------------------
    @staticmethod
    def update_dynamics(x, u, A_d, B_d, d_d):
        return A_d @ x + B_d @ u + d_d

    def update_state(self, x, u, dt):
        A, B, d = self.get_jacobians(x, dt=dt)
        return self.update_dynamics(x, u, A, B, d)

    def rollout(self, x0, u, dt):
        """Scan-based rollout: x (N+1, n_x), z (N+1, n_z) (tpwl.py:193-216)."""
        x = rollout(self, x0, u, dt)
        z = self.x_to_zfyf(x, zf=True) if self.H is not None else None
        return x, z

    def get_characteristic_dx(self, dt):
        """max |x_{k+1}-x_k| over dictionary points (tpwl.py:324-334)."""
        x = qv2x(self.q, self.v)
        step = jax.vmap(lambda xi, ui: self.update_state(xi, ui, dt) - xi)
        return jnp.abs(step(x, self.u)).max(axis=0)

    # sim params (for experiment logs)
    def get_sim_params(self):
        return {"beta_weighting": None if self.beta is None else float(self.beta),
                "discr_method": self.discr_method,
                "tpwl_method": self.tpwl_method,
                "dist_weights": {"q": float(self.dist_w_q), "v": float(self.dist_w_v)}}


def _dense(M):
    """Accept scipy sparse or dense input."""
    if hasattr(M, "todense"):
        return np.asarray(M.todense())
    return np.asarray(M)


# ---------------------------------------------------------------------------
# Pure jitted rollout kernels


@partial(jax.jit, static_argnames=("dt", "use_prediscretized"))
def _rollout_impl(model: TPWLModel, x0, u, dt: float, use_prediscretized: bool):
    # dt is static (a Python float): the model's pre-discretization cache
    # check is a trace-time branch, and recompiles per distinct dt are cheap.
    def step(x, u_t):
        if use_prediscretized:
            i = model.calc_nearest_point(x)
            A, B, d = model.A_d[i], model.B_d[i], model.d_d[i]
        else:
            A, B, d = model.get_jacobians(x, dt=dt)
        x_next = A @ x + B @ u_t + d
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, u)
    return jnp.concatenate((x0[None], xs), axis=0)


def rollout(model: TPWLModel, x0, u, dt):
    """Roll the TPWL dynamics forward through `lax.scan`.

    Uses the pre-discretized cache when dt matches (tpwl.py:226-234).
    """
    use_cache = (model.pre_discretized_dt is not None
                 and model.tpwl_method == "nn"
                 and float(dt) == model.pre_discretized_dt)
    return _rollout_impl(model, x0, u, float(dt), use_cache)


@partial(jax.jit, static_argnames=("dt",))
def _rollout_batch_matmul(model: TPWLModel, x0, u, dt: float):
    """Batch-fused rollout: nearest-point distances for the WHOLE batch as
    two (B, r) x (r, P) matmuls per step instead of a (B, P, r) broadcast —
    at reference dictionary scale (P ~ 1e3) the broadcast materializes
    ~250 MB of HBM traffic per step and dominates the rollout. Matmuls run
    at HIGHEST precision (f32 accumulate): bf16-rounded distances flip up
    to ~13% of selections; f32 leaves only genuine near-ties (output
    deviation measured ~4e-4 on the P=1087 campaign ROM)."""
    qp = model.q
    vp = model.v
    hp = jax.lax.Precision.HIGHEST
    wq = jnp.asarray(model.dist_w_q, x0.dtype)
    wv = jnp.asarray(model.dist_w_v, x0.dtype)
    qn = jnp.sum(qp * qp, axis=1)[None]
    vn = jnp.sum(vp * vp, axis=1)[None]

    def step(X, u_t):
        q, v = x2qv(X)
        dq2 = jnp.maximum(jnp.sum(q * q, axis=1)[:, None]
                          - 2.0 * jnp.matmul(q, qp.T, precision=hp) + qn, 0.0)
        dv2 = jnp.maximum(jnp.sum(v * v, axis=1)[:, None]
                          - 2.0 * jnp.matmul(v, vp.T, precision=hp) + vn, 0.0)
        idx = jnp.argmin(wq * jnp.sqrt(dq2) + wv * jnp.sqrt(dv2), axis=1)
        A = model.A_d[idx]
        B = model.B_d[idx]
        d = model.d_d[idx]
        Xn = (jnp.einsum("bij,bj->bi", A, X, precision=hp)
              + jnp.einsum("bij,bj->bi", B, u_t, precision=hp) + d)
        return Xn, Xn

    _, Xs = jax.lax.scan(step, x0, jnp.swapaxes(u, 0, 1))
    return jnp.concatenate([x0[:, None], jnp.swapaxes(Xs, 0, 1)], axis=1)


def _batch_distances(model: TPWLModel, X):
    """Fused (B, P) weighted point distances: two (B, r) x (r, P) matmuls
    per step instead of a (B, P, r) broadcast (see _rollout_batch_matmul)."""
    hp = jax.lax.Precision.HIGHEST
    qp, vp = model.q, model.v
    wq = jnp.asarray(model.dist_w_q, X.dtype)
    wv = jnp.asarray(model.dist_w_v, X.dtype)
    qn = jnp.sum(qp * qp, axis=1)[None]
    vn = jnp.sum(vp * vp, axis=1)[None]
    q, v = x2qv(X)
    dq2 = jnp.maximum(jnp.sum(q * q, axis=1)[:, None]
                      - 2.0 * jnp.matmul(q, qp.T, precision=hp) + qn, 0.0)
    dv2 = jnp.maximum(jnp.sum(v * v, axis=1)[:, None]
                      - 2.0 * jnp.matmul(v, vp.T, precision=hp) + vn, 0.0)
    return wq * jnp.sqrt(dq2) + wv * jnp.sqrt(dv2)


@partial(jax.jit, static_argnames=("dt",))
def _rollout_batch_weighting(model: TPWLModel, x0, u, dt: float):
    """Batched exponential-weighting rollout (reference simulation mode
    tpwl.py:170-191,219-234): per step, weights w_i = exp(-beta d_i/d_min)
    normalized over the dictionary, weighted-average the CONTINUOUS
    matrices, then discretize the blend — the same semantics as
    get_jacobians(tpwl_method='weighting') per sample, but the weight
    computation is the fused matmul-distance reduction and the dictionary
    blend is a (B, P) x (P, n^2) MXU contraction instead of P broadcasts."""
    P = model.num_points
    n = model.state_dim
    m = model.input_dim
    hp = jax.lax.Precision.HIGHEST
    Af = model.A_c.reshape(P, n * n)
    Bf = model.B_c.reshape(P, n * m)
    beta = jnp.asarray(model.beta, x0.dtype)

    def step(X, u_t):
        dist = _batch_distances(model, X)                       # (B, P)
        dmin = jnp.min(dist, axis=1, keepdims=True)
        safe = jnp.where(dmin == 0, 1.0, dmin)
        w = jnp.exp(-beta * dist / safe)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        # exact-hit tie-break: weight 1 on the first zero-distance point
        idx = jnp.argmin(dist, axis=1)
        one_hot = jax.nn.one_hot(idx, P, dtype=w.dtype)
        w = jnp.where(dmin == 0, one_hot, w)
        A = jnp.matmul(w, Af, precision=hp).reshape(-1, n, n)
        Bm = jnp.matmul(w, Bf, precision=hp).reshape(-1, n, m)
        d = jnp.matmul(w, model.d_c, precision=hp)
        Ad, Bd, dd = jax.vmap(
            lambda a, b, c: disc.discretize_affine(
                a, b, c, dt, method=model.discr_method))(A, Bm, d)
        Xn = (jnp.einsum("bij,bj->bi", Ad, X, precision=hp)
              + jnp.einsum("bij,bj->bi", Bd, u_t, precision=hp) + dd)
        return Xn, Xn

    _, Xs = jax.lax.scan(step, x0, jnp.swapaxes(u, 0, 1))
    return jnp.concatenate([x0[:, None], jnp.swapaxes(Xs, 0, 1)], axis=1)


@partial(jax.jit, static_argnames=("dt", "wq", "wv", "interpret"))
def _rollout_batch_pallas(model: TPWLModel, x0, u, dt: float,
                          wq: float, wv: float, interpret: bool = False):
    """Batched rollout with the fused Pallas selection+gather kernel
    (ops/pallas_tpwl.py): distances, argmin and the dictionary fetch run in
    one VMEM-resident kernel per step; the gather is a one-hot MXU matmul."""
    from soft_robot_control_tpu.ops.pallas_tpwl import tpwl_gather_pallas

    hp = jax.lax.Precision.HIGHEST

    def step(X, u_t):
        A, B, d = tpwl_gather_pallas(
            X, model.q, model.v, model.A_d, model.B_d, model.d_d,
            wq, wv, interpret=interpret)
        Xn = (jnp.einsum("bij,bj->bi", A, X, precision=hp)
              + jnp.einsum("bij,bj->bi", B, u_t, precision=hp) + d)
        return Xn, Xn

    _, Xs = jax.lax.scan(step, x0, jnp.swapaxes(u, 0, 1))
    return jnp.concatenate([x0[:, None], jnp.swapaxes(Xs, 0, 1)], axis=1)


def rollout_batch(model: TPWLModel, x0, u, dt, select: str = "auto",
                  interpret: bool = False):
    """vmapped rollout over a batch of initial conditions and input plans.

    x0: (B, n_x); u: (B, N, n_u). Returns (B, N+1, n_x).
    This is the 1024-way batched rollout path (BASELINE.json config 5).

    select: 'exact' = per-sample scans with direct-difference distances;
    'matmul' = batch-fused matmul distances (faster at large B x P; argmin
    ties among near-duplicate dictionary points may resolve differently
    within fp noise); 'pallas' = fused VMEM selection+one-hot-MXU-gather
    kernel (ops/pallas_tpwl.py); 'weighting' = exponential-weighting
    simulation mode (auto-selected when model.tpwl_method == 'weighting');
    'auto' picks 'matmul' for B >= 32 nn-cached models.
    """
    use_cache = (model.pre_discretized_dt is not None
                 and model.tpwl_method == "nn"
                 and float(dt) == model.pre_discretized_dt)
    if select == "auto":
        if model.tpwl_method == "weighting":
            select = "weighting"
        else:
            select = "matmul" if (use_cache and x0.shape[0] >= 32) else "exact"
    if select == "weighting":
        if model.beta is None:
            raise ValueError("weighting mode needs beta (params"
                             "['beta_weighting'], tpwl.py:170-191)")
        return _rollout_batch_weighting(model, x0, u, float(dt))
    if select in ("matmul", "pallas"):
        if not use_cache:
            raise ValueError(f"select='{select}' needs the pre-discretized "
                             "nn cache at this dt")
        if select == "pallas":
            return _rollout_batch_pallas(model, x0, u, float(dt),
                                         float(model.dist_w_q),
                                         float(model.dist_w_v), interpret)
        return _rollout_batch_matmul(model, x0, u, float(dt))
    fn = jax.vmap(lambda a, b: _rollout_impl(model, a, b, float(dt), use_cache))
    return fn(x0, u)


# ---------------------------------------------------------------------------
# Construction from reference-format artifacts


def from_tpwl_dict(data, params: Optional[dict] = None, Cf=None, Hf=None,
                   discr_method: str = DISCR_METHOD_DEFAULT) -> TPWLModel:
    """Build a TPWLModel from a reference-format TPWL dictionary or pkl path.

    Accepts the pickle layout produced by TPWLSnapshotData.simulation_end
    (sofacontrol/tpwl/tpwl_utils.py:130-153): keys q, v, u, A_c, B_c, d_c,
    rom_info{type,U,q_ref,v_ref}.
    """
    from soft_robot_control_tpu.utils.io import load_data

    if not isinstance(data, dict):
        data = load_data(data)
    if data["rom_info"]["type"] != "POD":
        raise NotImplementedError("Unknown ROM type")
    rom = POD(data["rom_info"])
    params = params or {}
    dw = params.get("dist_weights") or {"q": 1.0, "v": 1.0}
    # discrete matrices travel with the dict when the builder produced them
    # (reference layout also carries A_d/B_d/d_d + dt, tpwl_utils.py:130-153)
    has_disc = ("A_d" in data and data["A_d"] is not None
                and len(np.shape(data["A_d"])) == 3
                and data.get("dt", -1) not in (-1, None))
    model = TPWLModel(
        q=np.asarray(data["q"]), v=np.asarray(data["v"]),
        u=np.atleast_2d(np.asarray(data["u"])),
        A_c=np.asarray(data["A_c"]), B_c=np.asarray(data["B_c"]),
        d_c=np.asarray(data["d_c"]), rom=rom,
        A_d=np.asarray(data["A_d"]) if has_disc else None,
        B_d=np.asarray(data["B_d"]) if has_disc else None,
        d_d=np.asarray(data["d_d"]) if has_disc else None,
        dist_w_q=dw["q"], dist_w_v=dw["v"],
        beta=params.get("beta_weighting"),
        discr_method=discr_method,
        tpwl_method=params.get("tpwl_method", TPWL_METHOD_DEFAULT),
        pre_discretized_dt=float(data["dt"]) if has_disc else None,
    )
    if Cf is not None:
        model = model.set_measurement_model(Cf)
    if Hf is not None:
        model = model.set_output_model(Hf)
    return model
