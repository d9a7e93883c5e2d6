"""BASELINE config 4: SSM reduced-order nonlinear MPC.

Uses the reference's shipped SSM artifacts (SSM_model.mat + rest_qv.pkl).
The SSM model itself acts as the plant (ROM-as-plant per BASELINE.md), the
controller is the scp_ssm feedforward MPC with the manifold observer, and
the solver is GuSTO with max_gusto_iters=0 — exactly one LOCP per MPC query
with the *nonlinear observer* path: time-varying H_d, c_d linearizations of
the chart entering the QP objective (locp.py:231-245 semantics,
examples/hardware/diamond_SSM.py:144-225 configuration)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.mpc import scp_ssm
from soft_robot_control_tpu.control.service import GuSTOService
from soft_robot_control_tpu.core.packing import vq2qv
from soft_robot_control_tpu.models import ssm as ssm_mod
from soft_robot_control_tpu.models.interfaces import SSMGuSTO
from soft_robot_control_tpu.sim.measurement import linearModel

REF = "/root/reference/examples/hardware"


@pytest.fixture(scope="module")
def ssm_model():
    with open(os.path.join(REF, "rest_qv.pkl"), "rb") as f:
        rest = pickle.load(f)
    qv_eq = np.array(rest["rest"])
    x_eq = np.concatenate((qv_eq[1], qv_eq[0]))
    out = linearModel([1354], 1628)
    z_eq = np.asarray(out.evaluate(jnp.asarray(x_eq), qv=True))
    return ssm_mod.from_mat(os.path.join(REF, "SSMmodels/SSM_model.mat"),
                            z_eq, discrete=False, discr_method="be")


def test_ssm_gusto_observer_jacobians_enter_qp(ssm_model):
    """A single GuSTO solve on the SSM model with a figure-8 window: the
    solution must track the (shifted) target through the nonlinear chart."""
    model = ssm_model
    gm = SSMGuSTO(model)
    N, dt = 4, 0.02
    nz = model.output_dim
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0  # x,y tip position
    R = 1e-7 * np.eye(model.input_dim)

    # target: small offset in x from equilibrium (shifted coordinates)
    z_target = np.zeros((N + 1, nz))
    z_target[:, 0] = 3.0  # mm

    x0 = np.zeros(model.state_dim)
    u_init = np.zeros((N, model.input_dim))
    x_init, _ = model.rollout(jnp.asarray(x0), jnp.asarray(u_init), dt)

    from soft_robot_control_tpu.scp.gusto import GuSTO

    gusto = GuSTO(gm, N, dt, Qz, R, x0, u_init, np.asarray(x_init),
                  z=z_target, verbose=0, warm_start=True, max_gusto_iters=0)
    xopt, uopt, zopt, _ = gusto.get_solution()
    # the optimized trajectory moves toward x-target
    assert zopt[-1][0] > 0.5, zopt[:, 0]
    assert np.all(np.isfinite(uopt))


@pytest.mark.slow
def test_config4_ssm_mpc_closed_loop(ssm_model):
    """Closed-loop SSM MPC, SSM-as-plant: track a small circle in the tip
    (x, y) plane. Exercises the scp_ssm controller + manifold observer +
    GuSTOService with relinearize-once-per-query real-time settings."""
    model = ssm_model
    gm = SSMGuSTO(model)
    dt = 0.02
    dt_solver = 0.06
    N = 3
    N_replan = 2
    nz = model.output_dim

    # circle target in shifted coordinates (mm), slow period
    T_traj = 10.0
    t_target = np.arange(0, T_traj, dt)
    amp = 2.0
    z_target = np.zeros((len(t_target), nz))
    z_target[:, 0] = amp * np.cos(2 * np.pi * t_target / 6.0) - amp
    z_target[:, 1] = amp * np.sin(2 * np.pi * t_target / 6.0)

    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-7 * np.eye(model.input_dim)

    x0 = np.zeros(model.state_dim)
    service = GuSTOService(gm, N, dt_solver, Qz, R, x0, t=t_target,
                           z=z_target, verbose=0, max_gusto_iters=0,
                           convg_thresh=1e-2)

    controller = scp_ssm(model, None, dt, N_replan=N_replan, delay=0.3,
                         wait=True, solver_service=service)
    controller.set_sim_timestep(dt)

    # simulate the SSM model as plant; measurement = true chart output
    # in [v; q] packing (the observer applies vq2qv internally)
    x = jnp.zeros(model.state_dim)
    u_prev = np.zeros(model.input_dim)
    zs, ts = [], []
    n_steps = int(6.0 / dt)
    for i in range(n_steps):
        t = i * dt
        z_unshifted = np.asarray(model.x_to_zfyf(x))  # [q_tip, v_tip]
        # controller expects raw y in [v; q] packing
        y = np.concatenate((z_unshifted[3:], z_unshifted[:3]))
        u = controller.evaluate(t, y, None, u_prev)
        x = model.update_state(x, jnp.asarray(u, x.dtype), dt)
        u_prev = u
        zs.append(np.asarray(model.x_to_zfyf(x)) - np.asarray(model.z_ref))
        ts.append(t)
    zs = np.asarray(zs)
    ts = np.asarray(ts)

    # compare against the delayed target (controller activates at t=0.3)
    mask = ts > 1.5
    zx_des = np.interp(ts[mask] - 0.3, t_target, z_target[:, 0])
    zy_des = np.interp(ts[mask] - 0.3, t_target, z_target[:, 1])
    err = np.hypot(zs[mask, 0] - zx_des, zs[mask, 1] - zy_des)
    rel = np.sqrt(np.mean(err**2)) / amp
    assert rel < 0.35, f"SSM MPC tracking rel RMSE {rel:.3f}"
    assert len(service.gusto.uopt) == N


@pytest.mark.slow
def test_batched_ssm_mpc(ssm_model):
    """Config 4 x config 5: fully-jitted batched SSM MPC over a batch of
    phase-shifted circle targets (real SSM artifacts, SSM-as-plant)."""
    from soft_robot_control_tpu.control.batch_mpc import BatchSSMMPC, window_targets

    model = ssm_model
    dt = 0.02
    N, N_replan = 3, 2
    nz = model.output_dim
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-7 * np.eye(model.input_dim)

    mpc = BatchSSMMPC(model, Qz, R, N=N, dt=dt, N_replan=N_replan,
                      qp_iters=150, dtype=jnp.float64)
    n_windows = 60
    run = mpc.build(n_windows)

    B = 4
    rng = np.random.default_rng(0)
    phases = rng.uniform(0, 2 * np.pi, size=B)
    amp = 2.0
    T = n_windows * N_replan + N + 1
    t = dt * np.arange(T)
    z_targets = []
    for b in range(B):
        z = np.zeros((T, nz))
        z[:, 0] = amp * np.cos(2 * np.pi * t / 6.0 + phases[b]) - amp * np.cos(phases[b])
        z[:, 1] = amp * np.sin(2 * np.pi * t / 6.0 + phases[b]) - amp * np.sin(phases[b])
        z_targets.append(window_targets(z, n_windows, N_replan, N))
    z_targets = jnp.asarray(np.stack(z_targets))

    x0 = jnp.zeros((B, model.state_dim))
    logs = mpc.run_batch(x0, z_targets)
    z = np.asarray(logs["z"])  # unshifted outputs (B, T_sim, nz)
    assert np.all(np.isfinite(z))
    z_ref = np.asarray(model.z_ref)
    for b in range(B):
        T_sim = z.shape[1]
        ts = dt * (np.arange(T_sim) + 1)
        zx_des = amp * np.cos(2 * np.pi * ts / 6.0 + phases[b]) - amp * np.cos(phases[b])
        zy_des = amp * np.sin(2 * np.pi * ts / 6.0 + phases[b]) - amp * np.sin(phases[b])
        err = np.hypot(z[b, T_sim // 3:, 0] - z_ref[0] - zx_des[T_sim // 3:],
                       z[b, T_sim // 3:, 1] - z_ref[1] - zy_des[T_sim // 3:])
        rel = np.sqrt(np.mean(err**2)) / amp
        assert rel < 0.3, f"batch {b}: rel RMSE {rel:.3f}"


@pytest.mark.slow
def test_batched_ssm_mpc_fused_matches(ssm_model):
    """BatchSSMMPC.build_fused (grid-batched Pallas LOCP launch) must
    reproduce the vmapped path exactly at f64 (interpret kernel on CPU)."""
    from soft_robot_control_tpu.control.batch_mpc import BatchSSMMPC, window_targets

    model = ssm_model
    dt = 0.02
    N, N_replan = 3, 2
    nz = model.output_dim
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-7 * np.eye(model.input_dim)

    mpc = BatchSSMMPC(model, Qz, R, N=N, dt=dt, N_replan=N_replan,
                      qp_iters=80, dtype=jnp.float64)
    n_windows = 8
    mpc.build(n_windows)
    run_f = mpc.build_fused(n_windows)

    B = 3
    rng = np.random.default_rng(1)
    phases = rng.uniform(0, 2 * np.pi, size=B)
    amp = 2.0
    T = n_windows * N_replan + N + 1
    t = dt * np.arange(T)
    z_targets = []
    for b in range(B):
        z = np.zeros((T, nz))
        z[:, 0] = amp * np.cos(2 * np.pi * t / 6.0 + phases[b]) - amp * np.cos(phases[b])
        z[:, 1] = amp * np.sin(2 * np.pi * t / 6.0 + phases[b]) - amp * np.sin(phases[b])
        z_targets.append(window_targets(z, n_windows, N_replan, N))
    z_targets = jnp.asarray(np.stack(z_targets))
    x0 = jnp.zeros((B, model.state_dim))

    ref = mpc.run_batch(x0, z_targets)
    fused = run_f(x0, z_targets)
    for k in ["z", "u"]:
        assert fused[k].shape == ref[k].shape
        # the kernel contracts row-vector x matrix while admm_fixed_kinv
        # contracts matrix x column — different f64 rounding orders that the
        # unconverged-ADMM warm-start chain amplifies to ~1e-6 on this
        # ill-conditioned QP; 1e-4 still pins identical semantics
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(ref[k]),
                                   atol=1e-4)


@pytest.mark.slow
def test_batched_ssm_mpc_condensed_matches_sparse(ssm_model):
    """The condensed nonlinear-observer LOCP (time-varying Hd/cd through
    the forward-substitution maps) must agree with the sparse LOCP closed
    loop at high ADMM iteration counts."""
    from soft_robot_control_tpu.control.batch_mpc import BatchSSMMPC, window_targets

    model = ssm_model
    dt = 0.02
    N, N_replan = 3, 2
    nz = model.output_dim
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-7 * np.eye(model.input_dim)

    n_windows = 8
    runs = {}
    for form in ("sparse", "condensed"):
        mpc = BatchSSMMPC(model, Qz, R, N=N, dt=dt, N_replan=N_replan,
                          qp_iters=800, formulation=form, dtype=jnp.float64)
        run_f = mpc.build_fused(n_windows)
        B = 2
        rng = np.random.default_rng(1)
        phases = rng.uniform(0, 2 * np.pi, size=B)
        amp = 2.0
        T = n_windows * N_replan + N + 1
        t = dt * np.arange(T)
        zt = []
        for b in range(B):
            z = np.zeros((T, nz))
            z[:, 0] = amp * np.cos(2 * np.pi * t / 6.0 + phases[b]) - amp * np.cos(phases[b])
            z[:, 1] = amp * np.sin(2 * np.pi * t / 6.0 + phases[b]) - amp * np.sin(phases[b])
            zt.append(window_targets(z, n_windows, N_replan, N))
        runs[form] = run_f(jnp.zeros((B, model.state_dim)),
                           jnp.asarray(np.stack(zt)))
    for k in ["z", "u"]:
        np.testing.assert_allclose(np.asarray(runs["condensed"][k]),
                                   np.asarray(runs["sparse"][k]), atol=2e-4)
