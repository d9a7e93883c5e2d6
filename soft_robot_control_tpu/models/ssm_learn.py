"""Native SSM model learning — data-driven spectral-submanifold fitting.

The reference delegates this step to MATLAB SSMLearn (SURVEY.md §2.5:
examples/diamond/SSM_sysID.py exports decay data, a MATLAB script fits
py_data.model.{w_coeff, v_coeff, r_coeff, B, rd_coeff, Bd} and writes
SSM_model.mat, which sofacontrol/SSM/ssm.py:30-51 loads). This module
closes the loop natively: it fits the same coefficient matrices from decay
(and optionally actuated) trajectories and returns a ready-to-use
models/ssm.py:SSMModel — no MATLAB.

Method (graph-style SSMLearn, polynomial regression formulation):
1. shift observations by the equilibrium z_ref and find the spectral
   subspace as the dominant left singular vectors V of the snapshot matrix;
2. chart  x = V' y  (initial reduced coordinates);
3. parametrization  y ≈ W phi(x)  by ridge regression on the grevlex
   monomial basis (ops/monomials.py — identical ordering to the artifacts
   the loader consumes);
4. inverse chart  x ≈ V phi(y)  by the same regression (v_coeff);
5. continuous reduced dynamics  xdot ≈ R phi_R(x)  with xdot from 4th-order
   finite differences, and discrete dynamics  x+ ≈ Rd phi_R(x)  (EDMD-style
   one-step regression);
6. input matrices B / Bd from actuated trajectories by regressing the decay
   -dynamics residual on u.

TPU-first: every fit is one batched least-squares on device (normal
equations with Jacobi-scaled ridge, MXU matmuls); trajectory differentiation
and lifting are vmapped; no symbolic code (static exponent tables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.models.ssm import SSMModel
from soft_robot_control_tpu.ops.monomials import eval_monomials, monomial_exponents


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def delay_embed(y, n_delay: int):
    """Delay-embed a trajectory (T, p) -> (T - n_delay, p*(n_delay+1)).

    Row t holds [y_t, y_{t-1}, ..., y_{t-n_delay}] — newest first, matching
    the reference's assembly of the delay-embedded observable used for the
    Diamond SSM (6 = 3 positions x 2 embeddings)."""
    y = jnp.asarray(y)
    if n_delay == 0:
        return y
    T = y.shape[0]
    cols = [y[n_delay - d:T - d] for d in range(n_delay + 1)]
    return jnp.concatenate(cols, axis=1)


def differentiate(x, dt: float):
    """4th-order central finite differences along axis 0 (2nd-order one-sided
    at the edges): the derivative estimate SSMLearn feeds its dynamics fit.
    x: (T, n) -> (T, n)."""
    x = jnp.asarray(x)
    T = x.shape[0]
    if T < 5:
        return jnp.gradient(x, dt, axis=0)
    interior = (x[:-4] - 8.0 * x[1:-3] + 8.0 * x[3:-1] - x[4:]) / (12.0 * dt)
    first = jnp.stack([
        (-3.0 * x[0] + 4.0 * x[1] - x[2]) / (2.0 * dt),
        (x[2] - x[0]) / (2.0 * dt),
    ])
    last = jnp.stack([
        (x[-1] - x[-3]) / (2.0 * dt),
        (3.0 * x[-1] - 4.0 * x[-2] + x[-3]) / (2.0 * dt),
    ])
    return jnp.concatenate([first, interior, last], axis=0)


def _ridge_fit(Phi, Y, lam: float):
    """min_W ||W Phi - Y||^2 + lam ||W S||^2 -> W (n_out, n_feat).

    Phi: (n_feat, n_samp); Y: (n_out, n_samp). The ridge is Jacobi-scaled
    (S = diag row norms of Phi) so one lam works across monomial degrees."""
    G = jnp.matmul(Phi, Phi.T, precision=jax.lax.Precision.HIGHEST)
    s = jnp.diagonal(G)
    reg = lam * jnp.where(s > 0, s, 1.0)
    Gr = G + jnp.diag(reg)
    RHS = jnp.matmul(Phi, Y.T, precision=jax.lax.Precision.HIGHEST)
    return jax.scipy.linalg.solve(Gr, RHS, assume_a="pos").T


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------
def learn_ssm(decay_trajs, dt: float, state_dim: int, SSM_order: int = 3,
              ROM_order: int = 3, z_ref=None, n_delay: int = 0,
              actuated_trajs=None, input_trajs=None, ridge: float = 1e-8,
              joint_fit: bool = False,
              discr_method: str = "fe") -> SSMModel:
    """Fit an SSMModel from decay trajectories.

    decay_trajs: list of (T_i, p) observed decays toward the equilibrium
        (raw outputs; delay embedding applied here when n_delay > 0).
    dt: sample time.
    state_dim: SSM (reduced) dimension; must equal the embedded observable
        dimension convention of models/ssm.py only in its output tables —
        here the embedded dim p*(n_delay+1) defines output_dim.
    z_ref: equilibrium in embedded coordinates. Default: mean of the final
        sample of each decay — ONLY valid if the decays have settled;
        weakly-damped data biases this estimate and with it every fit, so
        prefer passing a measured rest position (the reference measures it
        explicitly: examples/hardware/calibration.py rest_qv).
    actuated_trajs / input_trajs: optional matched lists of observed
        trajectories under known inputs u (T_i, m) for the B / Bd fit.
    ridge: Jacobi-scaled ridge weight for every regression. Pass a SEQUENCE
        of candidates to select the dynamics-fit weight by trajectory
        holdout: thin-manifold data (the common soft-robot case: the decays
        barely leave a low-dimensional tube of the reduced space) makes the
        unregularized cubic fit blow up off-data, and no single default
        works across systems. Selection minimizes the multi-step rollout
        error of the candidate fit on held-out decays, rejecting non-finite
        (unstable) fits outright; the winning weight then refits on all
        trajectories.

    Returns an SSMModel carrying both continuous (r_coeff, B_r) and discrete
    (rd_coeff, Bd_r, Ts=dt) dynamics.
    """
    embed = lambda tr: np.asarray(delay_embed(jnp.asarray(tr, jnp.float64),
                                              n_delay))
    Ys = [embed(tr) for tr in decay_trajs]
    n_obs = Ys[0].shape[1]

    if z_ref is None:
        z_ref = np.mean([y[-1] for y in Ys], axis=0)
    z_ref = np.asarray(z_ref, float).reshape(-1)
    Ys = [y - z_ref[None, :] for y in Ys]

    # 1. spectral subspace: dominant left singular vectors of all snapshots
    snaps = jnp.asarray(np.concatenate(Ys, axis=0).T)  # (n_obs, n_samp)
    V, _, _ = jnp.linalg.svd(snaps, full_matrices=False)
    V = V[:, :state_dim]                               # (n_obs, state_dim)

    # 2. reduced coordinates of every decay sample
    Xs = [jnp.asarray(y) @ V for y in Ys]              # each (T_i, state_dim)
    X_all = jnp.concatenate(Xs, axis=0)                # (n_samp, state_dim)
    Y_all = jnp.concatenate([jnp.asarray(y) for y in Ys], axis=0)

    ssm_exps = monomial_exponents(n_obs, SSM_order)
    rom_exps = monomial_exponents(state_dim, ROM_order)
    lift_ssm = jax.jit(lambda pts: eval_monomials(pts, ssm_exps))
    lift_rom = jax.jit(lambda pts: eval_monomials(pts, rom_exps))

    # 3. parametrization y ~ w_coeff phi(x); 4. chart x ~ v_coeff phi(y).
    # models/ssm.py evaluates both with the output_dim exponent table, which
    # requires n_obs == state_dim + padding otherwise; SSMLearn's Diamond
    # artifact satisfies n_obs == state_dim (6 == 6) and we enforce it here.
    if n_obs != state_dim:
        raise ValueError(
            f"embedded observable dim {n_obs} != state_dim {state_dim}: "
            "models/ssm.py's C_map/W_map share one monomial table "
            "(ssm.py:115-121), so choose n_delay such that "
            "p*(n_delay+1) == state_dim")
    lam_list = (list(ridge) if np.ndim(ridge) > 0 else [float(ridge)])
    lam_geo = float(np.exp(np.mean(np.log(lam_list))))

    Phi_x = lift_ssm(X_all).T                          # (n_feat, n_samp)
    w_coeff = _ridge_fit(Phi_x, Y_all.T, lam_geo)
    Phi_y = lift_ssm(Y_all).T
    v_coeff = _ridge_fit(Phi_y, X_all.T, lam_geo)

    # 5. reduced dynamics, with optional holdout selection of the ridge
    # weight (see the `ridge` docstring)
    def fit_dynamics(trajs, lam):
        Xa = jnp.concatenate(trajs, axis=0)
        Xd = jnp.concatenate([differentiate(x, dt) for x in trajs], axis=0)
        r = _ridge_fit(lift_rom(Xa).T, Xd.T, lam)       # xdot ~ R phi(x)
        X0 = jnp.concatenate([x[:-1] for x in trajs], axis=0)
        X1 = jnp.concatenate([x[1:] for x in trajs], axis=0)
        rd = _ridge_fit(lift_rom(X0).T, X1.T, lam)      # x+ ~ Rd phi(x)
        return r, rd

    def rollout_err(r, rd, trajs):
        """Multi-step prediction error on held-out reduced trajectories:
        discrete map iteration + RK4 of the continuous field (both as
        scans). Unstable fits go non-finite and are rejected."""
        def one(traj):
            # validate over (nearly) the full decay: instabilities often
            # only blow up beyond the first ~100 steps
            K = min(500, traj.shape[0] - 1)
            def stepd(x, _):
                x1 = rd @ eval_monomials(x, rom_exps)
                return x1, x1
            _, xs_d = jax.lax.scan(stepd, traj[0], None, length=K)
            f = lambda x: r @ eval_monomials(x, rom_exps)
            def stepc(x, _):
                k1 = f(x); k2 = f(x + 0.5 * dt * k1)
                k3 = f(x + 0.5 * dt * k2); k4 = f(x + dt * k3)
                x1 = x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
                return x1, x1
            _, xs_c = jax.lax.scan(stepc, traj[0], None, length=K)
            ref = traj[1:K + 1]
            return jnp.mean((xs_d - ref) ** 2) + jnp.mean((xs_c - ref) ** 2)
        errs = [one(tr) for tr in trajs]
        e = float(jnp.mean(jnp.stack(errs)))
        return e if np.isfinite(e) else np.inf

    lam_dyn = lam_list[0]
    if len(lam_list) == 1 or len(Xs) < 2:
        r_coeff, rd_coeff = fit_dynamics(Xs, lam_dyn)
    else:
        n_val = max(1, len(Xs) // 4)
        fit_trajs, val_trajs = Xs[:-n_val], Xs[-n_val:]
        scores = []
        for lam in lam_list:
            r_c, rd_c = fit_dynamics(fit_trajs, lam)
            scores.append(rollout_err(r_c, rd_c, val_trajs))
        if not np.isfinite(min(scores)):
            raise RuntimeError(
                "every ridge candidate produced an unstable dynamics fit; "
                "widen the candidate list or collect richer decay data")
        lam_dyn = lam_list[int(np.argmin(scores))]
        r_coeff, rd_coeff = fit_dynamics(Xs, lam_dyn)

    # 6. input matrices from actuated data.
    # joint_fit=True refits [R | B] in ONE regression over decays AND
    # actuated trajectories (features [phi(x); u]): the two-stage residual
    # fit evaluates the decay-trained cubic R phi(x) along FORCED
    # trajectories, whose (x, xdot) combinations sit outside the decay
    # envelope — the extrapolated residual is garbage and so is the B
    # regressed on it (observed: a trunk model whose 1-second 200 mN
    # response was meters). Jointly fitted dynamics stay consistent on the
    # union of both data families.
    m_in = 0
    B_r = None
    Bd_r = None
    if actuated_trajs is not None:
        assert input_trajs is not None and len(actuated_trajs) == len(
            input_trajs), "actuated_trajs and input_trajs must pair up"
        Xu, Us = [], []
        for tr, u in zip(actuated_trajs, input_trajs):
            ye = embed(tr) - z_ref[None, :]
            xu = jnp.asarray(ye) @ V
            Xu.append(xu)
            # delay embedding drops the first n_delay samples of y; align u
            Us.append(jnp.asarray(np.asarray(u, float)[n_delay:]))
        m_in = int(Us[0].shape[1])
        # continuous: (xdot - R phi(x)) ~ B u
        resid_c, resid_d, U_c, U_d = [], [], [], []
        for xu, u in zip(Xu, Us):
            xd = differentiate(xu, dt)
            resid_c.append(xd - (r_coeff @ lift_rom(xu).T).T)
            U_c.append(u[:xu.shape[0]])
            resid_d.append(xu[1:] - (rd_coeff @ lift_rom(xu[:-1]).T).T)
            U_d.append(u[:xu.shape[0] - 1])
        Rc = jnp.concatenate(resid_c, axis=0)
        Uc = jnp.concatenate(U_c, axis=0)
        Rd_ = jnp.concatenate(resid_d, axis=0)
        Ud = jnp.concatenate(U_d, axis=0)
        if joint_fit:
            n_feat = rom_exps.shape[0]
            # continuous: [xdot_decay; xdot_act] ~ [phi, u] [R; B]'
            Xa_dec = jnp.concatenate(Xs, axis=0)
            Xd_dec = jnp.concatenate([differentiate(x, dt) for x in Xs],
                                     axis=0)
            U_dec = jnp.zeros((Xa_dec.shape[0], m_in))
            Xa_act = jnp.concatenate(Xu, axis=0)
            Xd_act = jnp.concatenate([differentiate(x, dt) for x in Xu],
                                     axis=0)
            U_act = jnp.concatenate([u[:x.shape[0]]
                                     for x, u in zip(Xu, Us)], axis=0)
            Phi = jnp.concatenate([
                jnp.concatenate([lift_rom(Xa_dec), U_dec], axis=1),
                jnp.concatenate([lift_rom(Xa_act), U_act], axis=1)], axis=0)
            Y = jnp.concatenate([Xd_dec, Xd_act], axis=0)
            RB = _ridge_fit(Phi.T, Y.T, lam_dyn)
            r_coeff, B_r = RB[:, :n_feat], RB[:, n_feat:]
            # discrete: x+ ~ [phi(x), u] [Rd; Bd]'
            X0d = jnp.concatenate([x[:-1] for x in Xs], axis=0)
            X1d = jnp.concatenate([x[1:] for x in Xs], axis=0)
            X0a = jnp.concatenate([x[:-1] for x in Xu], axis=0)
            X1a = jnp.concatenate([x[1:] for x in Xu], axis=0)
            U0a = jnp.concatenate([u[:x.shape[0] - 1]
                                   for x, u in zip(Xu, Us)], axis=0)
            Phi_d = jnp.concatenate([
                jnp.concatenate([lift_rom(X0d),
                                 jnp.zeros((X0d.shape[0], m_in))], axis=1),
                jnp.concatenate([lift_rom(X0a), U0a], axis=1)], axis=0)
            Y_d = jnp.concatenate([X1d, X1a], axis=0)
            RBd = _ridge_fit(Phi_d.T, Y_d.T, lam_dyn)
            rd_coeff, Bd_r = RBd[:, :n_feat], RBd[:, n_feat:]
        else:
            B_r = _ridge_fit(Uc.T, Rc.T, lam_dyn)
            Bd_r = _ridge_fit(Ud.T, Rd_.T, lam_dyn)
    if B_r is None:
        B_r = jnp.zeros((state_dim, max(m_in, 1)))
        Bd_r = jnp.zeros((state_dim, max(m_in, 1)))

    return SSMModel(
        w_coeff=w_coeff, v_coeff=v_coeff, r_coeff=r_coeff, B_r=B_r,
        rd_coeff=rd_coeff, Bd_r=Bd_r, z_ref=z_ref, state_dim=state_dim,
        input_dim=int(B_r.shape[1]), output_dim=n_obs, SSM_order=SSM_order,
        ROM_order=ROM_order, Ts=float(dt), discrete=False,
        discr_method=discr_method)


def to_mat_dict(model: SSMModel) -> dict:
    """Serialize an SSMModel into the py_data layout SSMLearn emits
    (SSM_model.mat; consumed by models/ssm.py:from_mat via scipy.io) so
    natively-trained models interoperate with reference tooling."""
    return {"py_data": {
        "model": {
            "w_coeff": np.asarray(model.w_coeff),
            "v_coeff": np.asarray(model.v_coeff),
            "r_coeff": np.asarray(model.r_coeff),
            "B": np.asarray(model.B_r),
            "rd_coeff": np.asarray(model.rd_coeff),
            "Bd": np.asarray(model.Bd_r),
            "Ts": model.Ts,
            # extension over the reference layout: carry the equilibrium so
            # the artifact is standalone (the reference supplies it
            # separately from rest_qv.pkl)
            "z_ref": np.asarray(model.z_ref),
        },
        "params": {
            "state_dim": model.state_dim,
            "input_dim": model.input_dim,
            "output_dim": model.output_dim,
            "SSM_order": model.SSM_order,
            "ROM_order": model.ROM_order,
        },
    }}


def save_mat(model: SSMModel, path: str) -> None:
    """Write an SSM_model.mat loadable by both this repo's from_mat and the
    reference's loader."""
    from scipy.io import savemat

    savemat(path, to_mat_dict(model))
