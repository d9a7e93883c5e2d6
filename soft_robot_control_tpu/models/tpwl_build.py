"""Offline TPWL model building (the SOFA-free data pipeline).

Capability parity with sofacontrol/tpwl/tpwl_utils.py (TPWLSnapshotData) and
tpwl_config.py: sweep a recorded trajectory, add a linearization point
whenever the weighted (q, v) distance to the current dictionary exceeds a
threshold (eval_type='distance') or whenever the current TPWL model's
one-step prediction error exceeds a threshold (eval_type='dynamics'), and
store ROM-projected continuous affine dynamics (A_c, B_c, d_c).

Where the reference extracts (K, D, M, H) from SOFA's LDL text export
(utils.py:180-206), this pipeline takes analytic Jacobians from the in-repo
FEM surrogate plant and projects them with the POD basis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import x2qv
from soft_robot_control_tpu.models.tpwl import TPWLModel
from soft_robot_control_tpu.rom.pod import POD
from soft_robot_control_tpu.sim.fem_surrogate import FEMSurrogate


@dataclass
class tpwl_config:
    """Mirrors sofacontrol/tpwl/tpwl_config.py defaults."""

    eval_type: str = "distance"  # 'distance' or 'dynamics'
    TPWL_weighting_factors: dict = field(default_factory=lambda: {"q": 10.0, "v": 1.0})
    TPWL_separate_calculation: bool = False
    TPWL_threshold: float = 1100.0
    # dynamics-eval options
    discr_method: str = "zoh"
    dist_weights: dict = field(default_factory=lambda: {"q": 1.0, "v": 0.0})
    output_based: bool = False
    dt: Optional[float] = None  # required for eval_type='dynamics'


def tpwl_distance_config(**kw) -> tpwl_config:
    return tpwl_config(eval_type="distance", **kw)


def tpwl_dynamics_config(**kw) -> tpwl_config:
    cfg = tpwl_config(eval_type="dynamics",
                      TPWL_weighting_factors={"q": 0.0, "v": 1.0},
                      TPWL_threshold=100000.0)
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def reduced_affine_dynamics(plant: FEMSurrogate, rom: POD, x_full, u):
    """Project the plant's analytic affine expansion at (x_full, u) to ROM
    coordinates. Equivalent role to add_continuous_TPWL
    (tpwl_utils.py:263-277) with extract_AB (utils.py:251-286).

    Plants that provide their own matrix-free projection (TetFEM at
    reference mesh scale, where the dense (2n)^2 Jacobian is 763 MB) are
    dispatched to it; the dense path below serves small surrogates.
    """
    if hasattr(plant, "reduced_affine_dynamics"):
        return plant.reduced_affine_dynamics(rom, jnp.asarray(x_full),
                                             jnp.asarray(u))
    A, B, d = plant.jacobians(jnp.asarray(x_full), jnp.asarray(u))
    n, r = rom.full_dim, rom.rom_dim
    # A_r = V^T A V without materializing V = kron(I2, U)
    AV = jnp.concatenate((A[:, :n] @ rom.U, A[:, n:] @ rom.U), axis=1)
    A_r = jnp.concatenate((rom.U.T @ AV[:n], rom.U.T @ AV[n:]), axis=0)
    B_r = jnp.concatenate((rom.U.T @ B[:n], rom.U.T @ B[n:]), axis=0)
    # Affine term chosen so the reduced model is exactly tangent at the point:
    # d_r = V^T f(x, u) - A_r x_r - B_r u
    f = plant.f(jnp.asarray(x_full), jnp.asarray(u))
    f_r = jnp.concatenate((rom.U.T @ f[:n], rom.U.T @ f[n:]))
    x_r = rom.project_x(jnp.asarray(x_full))
    d_r = f_r - A_r @ x_r - B_r @ jnp.asarray(u)
    return A_r, B_r, d_r


def build_tpwl_model(plant: FEMSurrogate, rom: POD, x_traj, u_traj,
                     config: Optional[tpwl_config] = None,
                     params: Optional[dict] = None,
                     Cf=None, Hf=None,
                     discr_method: str = "zoh",
                     dynamics: str = "continuous",
                     x_next=None, dt: Optional[float] = None) -> TPWLModel:
    """Sweep a recorded trajectory and build the TPWL dictionary.

    x_traj: (T, 2 n_f) full-order states; u_traj: (T, m) inputs applied.

    dynamics='continuous' stores projected continuous affine dynamics
    (the reference's add_continuous_TPWL). dynamics='discrete' stores the
    projected *discrete step map* via plant.reduced_discrete_dynamics —
    the reference's add_discrete_TPWL built from the implicit system matrix
    (tpwl_utils.py:279-289, utils.py:289-299); requires `dt` and, for
    exact-at-point affine terms, `x_next` (T, 2 n_f) recorded next states.
    For stiff full-scale FEM the discrete dictionary is strongly preferred
    (backward Euler statically condenses stiff modes; Galerkin projection of
    the continuous dynamics misses that by O(1)).

    Selection semantics follow TPWLSnapshotData (tpwl_utils.py:156-260):
    the first point is always added; afterwards, with
    eval_type='distance' a point is added when the weighted distance of its
    reduced (q, v) to every saved point exceeds TPWL_threshold
    (evaluate_point_dist), and with eval_type='dynamics' when the current
    partial TPWL model's one-step prediction error (weighted over q/v
    deltas, optionally through the output map when output_based) exceeds
    the threshold (evaluate_point_dynamics).
    """
    config = config or tpwl_config()
    wq = config.TPWL_weighting_factors["q"]
    wv = config.TPWL_weighting_factors["v"]

    if dynamics not in ("continuous", "discrete"):
        raise ValueError(f"unknown dynamics mode {dynamics!r}")
    if dynamics == "discrete" and dt is None:
        raise ValueError("dynamics='discrete' requires dt")
    x_traj = np.asarray(x_traj)
    u_traj = np.atleast_2d(np.asarray(u_traj))
    # reduced coordinates of the whole sweep, in one projected batch
    xr = np.asarray(jax.vmap(rom.project_x)(jnp.asarray(x_traj)))
    qr, vr = x2qv(xr)
    qr, vr = np.asarray(qr), np.asarray(vr)
    r = rom.rom_dim

    sel_q, sel_v, sel_u = [], [], []
    A_list, B_list, d_list = [], [], []
    Ad_list, Bd_list, dd_list = [], [], []
    sel_steps = []
    dt = dt if dt is not None else getattr(config, "dt", None)

    jac = jax.jit(lambda xf, u: reduced_affine_dynamics(plant, rom, xf, u))
    if dynamics == "discrete":
        xn_r = (np.asarray(jax.vmap(rom.project_x)(jnp.asarray(x_next)))
                if x_next is not None else None)
        jac_d = jax.jit(lambda xf, u, xnr: plant.reduced_discrete_dynamics(
            rom, xf, u, dt, x_next_r=xnr))

    def add(i):
        sel_steps.append(i)
        sel_q.append(qr[i])
        sel_v.append(vr[i])
        sel_u.append(u_traj[i])
        A, B, d = jac(x_traj[i], u_traj[i])
        A_list.append(np.asarray(A))
        B_list.append(np.asarray(B))
        d_list.append(np.asarray(d))
        if dynamics == "discrete":
            # the dictionary carries BOTH continuous and discrete dynamics,
            # like the reference's add_continuous/add_discrete pair
            xnr = (jnp.asarray(xn_r[i]) if xn_r is not None
                   else rom.project_x(plant.step(jnp.asarray(x_traj[i]),
                                                 jnp.asarray(u_traj[i]), dt)))
            Ad, Bd, dd = jac_d(x_traj[i], u_traj[i], xnr)
            Ad_list.append(np.asarray(Ad))
            Bd_list.append(np.asarray(Bd))
            dd_list.append(np.asarray(dd))

    # numpy mirror of the partial TPWL model for the dynamics criterion:
    # TPWLModel.update_state re-jits at every dictionary size, which costs
    # one XLA compile per added point (hundreds at tet scale). The matrices
    # are (2r)^2 with r ~ tens — plain numpy is exact and instant. Parity
    # with TPWLModel nn-selection + update_dynamics is pinned by
    # tests/test_tpwl_build.py::test_dynamics_criterion_matches_model.
    dwq = config.dist_weights["q"]
    dwv = config.dist_weights["v"]
    disc_cache = {}

    def predict_np(x_prev, u_prev):
        Q = np.asarray(sel_q)
        V = np.asarray(sel_v)
        d_sel = (dwq * np.linalg.norm(Q - x_prev[r:], axis=1)
                 + dwv * np.linalg.norm(V - x_prev[:r], axis=1))
        i_nn = int(np.argmin(d_sel))
        if dynamics == "discrete":
            Ad, Bd, dd_ = Ad_list[i_nn], Bd_list[i_nn], dd_list[i_nn]
        else:
            if i_nn not in disc_cache:
                from soft_robot_control_tpu.core import discretize as disc
                disc_cache[i_nn] = tuple(np.asarray(m) for m in
                                         disc.discretize_affine(
                                             jnp.asarray(A_list[i_nn]),
                                             jnp.asarray(B_list[i_nn]),
                                             jnp.asarray(d_list[i_nn]), dt,
                                             method=config.discr_method))
            Ad, Bd, dd_ = disc_cache[i_nn]
        return Ad @ x_prev + Bd @ u_prev + dd_

    if config.eval_type == "dynamics" and dt is None:
        raise ValueError("dynamics eval_type requires config.dt")

    for i in range(x_traj.shape[0]):
        if not sel_steps:
            add(i)
            continue
        if config.eval_type == "dynamics":
            if i == 0 or np.all(u_traj[i - 1] == 0):
                continue
            # predict the current reduced state from the previous one with
            # the partial TPWL model, compare prediction error
            x_pred = predict_np(xr[i - 1], u_traj[i - 1])
            d_est = x_pred - xr[i - 1]
            d_true = xr[i] - xr[i - 1]
            dq_err = wq * np.linalg.norm(d_est[r:] - d_true[r:])
            dv_err = wv * np.linalg.norm(d_est[:r] - d_true[:r])
            if config.TPWL_separate_calculation:
                hit = (dq_err >= config.TPWL_threshold
                       or dv_err >= config.TPWL_threshold)
            else:
                hit = dq_err + dv_err >= config.TPWL_threshold
            if hit:
                add(i)
            continue
        qd = wq * np.linalg.norm(np.asarray(sel_q) - qr[i], axis=1)
        vd = wv * np.linalg.norm(np.asarray(sel_v) - vr[i], axis=1)
        if config.TPWL_separate_calculation:
            if qd.min() >= config.TPWL_threshold or vd.min() >= config.TPWL_threshold:
                add(i)
        else:
            if (qd + vd).min() >= config.TPWL_threshold:
                add(i)

    params = params or {}
    dw = params.get("dist_weights") or {"q": 1.0, "v": 1.0}
    kw = {}
    if dynamics == "discrete":
        kw = dict(A_d=np.asarray(Ad_list), B_d=np.asarray(Bd_list),
                  d_d=np.asarray(dd_list), pre_discretized_dt=float(dt))
    model = TPWLModel(
        q=np.asarray(sel_q), v=np.asarray(sel_v), u=np.asarray(sel_u),
        A_c=np.asarray(A_list), B_c=np.asarray(B_list), d_c=np.asarray(d_list),
        rom=rom, dist_w_q=dw["q"], dist_w_v=dw["v"],
        beta=params.get("beta_weighting"),
        discr_method=discr_method,
        tpwl_method=params.get("tpwl_method", "nn"), **kw,
    )
    if Cf is not None:
        model = model.set_measurement_model(Cf)
    if Hf is not None:
        model = model.set_output_model(Hf)
    return model


def to_tpwl_dict(model: TPWLModel) -> dict:
    """Export a TPWLModel to the reference pickle layout
    (tpwl_utils.py:130-153 keys subset) for interchange. Discrete matrices
    travel along when the model carries them."""
    out = {
        "q": np.asarray(model.q), "v": np.asarray(model.v),
        "u": np.asarray(model.u),
        "A_c": np.asarray(model.A_c), "B_c": np.asarray(model.B_c),
        "d_c": np.asarray(model.d_c),
        "rom_info": model.rom.get_info(),
        "dt": model.pre_discretized_dt if model.pre_discretized_dt else -1,
        "info": {"nbr_lin": str(model.num_points)},
    }
    if model.A_d is not None:
        out["A_d"] = np.asarray(model.A_d)
        out["B_d"] = np.asarray(model.B_d)
        out["d_d"] = np.asarray(model.d_d)
    return out
