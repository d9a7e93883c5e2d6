"""Native SSM learning (models/ssm_learn.py): fit chart/parametrization/
reduced dynamics/input matrix from synthetic decay + actuated data generated
by a known polynomial ground truth, and verify predictive accuracy through
the SSMModel surface (the role MATLAB SSMLearn plays for the reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.models.ssm_learn import (delay_embed,
                                                     differentiate, learn_ssm,
                                                     save_mat)


# ---------------------------------------------------------------------------
# ground truth: damped Duffing-style 2D reduced dynamics observed through an
# invertible polynomial map
# ---------------------------------------------------------------------------
A_TRUE = np.array([[0.0, 1.0], [-4.0, -0.4]])
B_TRUE = np.array([[0.0], [1.0]])


def f_true(x, u=None):
    cubic = jnp.array([0.0, -0.5 * x[0] ** 3])
    dx = jnp.asarray(A_TRUE) @ x + cubic
    if u is not None:
        dx = dx + jnp.asarray(B_TRUE) @ u
    return dx


def obs_true(x):
    return jnp.array([x[0] + 0.1 * x[0] ** 2, x[1] + 0.05 * x[0] * x[1]])


def rk4_traj(x0, dt, T, u_fn=None):
    def step(x, k):
        u = None if u_fn is None else u_fn(k)
        f = lambda xx: f_true(xx, u)
        k1 = f(x)
        k2 = f(x + 0.5 * dt * k1)
        k3 = f(x + 0.5 * dt * k2)
        k4 = f(x + dt * k3)
        x1 = x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return x1, x1

    _, xs = jax.lax.scan(step, jnp.asarray(x0), jnp.arange(T))
    xs = jnp.concatenate([jnp.asarray(x0)[None], xs], axis=0)
    return np.asarray(jax.vmap(obs_true)(xs)), np.asarray(xs)


@pytest.fixture(scope="module")
def learned():
    dt, T = 0.01, 600
    rng = np.random.default_rng(0)
    # data volume drives the dynamics-fit quality (plain LS on FD
    # derivatives): 16 decays roughly halve the held-out error vs 8
    decays = [rk4_traj(rng.uniform(-0.8, 0.8, 2), dt, T)[0] for _ in range(16)]

    # actuated trajectories with a smooth input
    def make_u(seed):
        r = np.random.default_rng(seed)
        a, ph = r.uniform(0.2, 0.6), r.uniform(0, 2 * np.pi)
        return lambda k: a * jnp.sin(0.05 * k + ph)[None]

    act, us = [], []
    for s in range(4):
        ufn = make_u(100 + s)
        y, _ = rk4_traj(np.zeros(2), dt, 400, u_fn=ufn)
        act.append(y)
        us.append(np.array([np.asarray(ufn(k)) for k in range(401)]))

    # pass the known equilibrium like the reference workflow does (rest
    # calibration, examples/hardware/calibration.py): the final-sample
    # default would be ~0.05 off on these weakly-damped 6 s decays and
    # bias the whole fit
    model = learn_ssm(decays, dt, state_dim=2, SSM_order=3, ROM_order=5,
                      z_ref=np.zeros(2),
                      actuated_trajs=act, input_trajs=us)
    return model, dt


def test_differentiate_fourth_order():
    dt = 0.01
    t = dt * np.arange(200)
    x = np.stack([np.sin(3 * t), np.cos(2 * t)], axis=1)
    dx = np.asarray(differentiate(jnp.asarray(x), dt))
    dx_true = np.stack([3 * np.cos(3 * t), -2 * np.sin(2 * t)], axis=1)
    np.testing.assert_allclose(dx[2:-2], dx_true[2:-2], atol=1e-6)
    np.testing.assert_allclose(dx[:2], dx_true[:2], atol=1e-3)


def test_delay_embed_layout():
    y = np.arange(12, dtype=float).reshape(6, 2)
    e = np.asarray(delay_embed(jnp.asarray(y), 2))
    assert e.shape == (4, 6)
    # newest first: row 0 = [y2, y1, y0]
    np.testing.assert_allclose(e[0], [4, 5, 2, 3, 0, 1])


def test_chart_parametrization_roundtrip(learned):
    model, dt = learned
    rng = np.random.default_rng(5)
    y_test, _ = rk4_traj(rng.uniform(-0.6, 0.6, 2), dt, 300)
    y_shift = jnp.asarray(y_test) - model.z_ref
    y_rec = jax.vmap(lambda z: model.C_map(model.W_map(z)))(y_shift)
    err = float(jnp.max(jnp.abs(y_rec - y_shift)))
    assert err < 5e-3, f"chart/parametrization roundtrip err {err:.2e}"


def test_decay_prediction(learned):
    """Held-out decay: the learned autonomous dynamics must reproduce the
    true observed trajectory."""
    model, dt = learned
    y_true, _ = rk4_traj(np.array([0.5, -0.3]), dt, 300)
    x0 = model.compute_RO_state(jnp.asarray(y_true[0]))
    u = jnp.zeros((300, model.input_dim))
    _, z = model.rollout(x0, u, dt)
    rms = float(np.sqrt(np.mean((np.asarray(z) - y_true) ** 2)))
    amp = float(np.max(np.abs(y_true)))
    assert rms / amp < 0.05, f"decay prediction rel RMS {rms / amp:.3f}"


def test_actuated_prediction(learned):
    """Held-out actuated run: the learned B must capture the input path."""
    model, dt = learned
    r = np.random.default_rng(42)
    a, ph = 0.5, r.uniform(0, 2 * np.pi)
    ufn = lambda k: a * jnp.sin(0.07 * k + ph)[None]
    T = 300
    y_true, _ = rk4_traj(np.zeros(2), dt, T, u_fn=ufn)
    u = jnp.asarray(np.array([np.asarray(ufn(k)) for k in range(T)]))
    x0 = model.compute_RO_state(jnp.asarray(y_true[0]))
    _, z = model.rollout(x0, u, dt)
    rms = float(np.sqrt(np.mean((np.asarray(z) - y_true) ** 2)))
    amp = float(np.max(np.abs(y_true)))
    assert amp > 0.05  # the input actually excites the system
    assert rms / amp < 0.08, f"actuated prediction rel RMS {rms / amp:.3f}"


def test_discrete_dynamics_consistency(learned):
    """rd_coeff (one-step EDMD fit) must agree with integrating r_coeff."""
    model, dt = learned
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.uniform(-0.4, 0.4, size=(50, 2)))
    u0 = jnp.zeros(model.input_dim)
    one_step_d = jax.vmap(lambda x: model.reduced_dynamics_discrete(x, u0))(xs)
    # fine-grained RK4 of the learned continuous field over one sample
    def rk4(x):
        f = lambda xx: model.reduced_dynamics(xx, u0)
        k1 = f(x); k2 = f(x + 0.5 * dt * k1)
        k3 = f(x + 0.5 * dt * k2); k4 = f(x + dt * k3)
        return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    one_step_c = jax.vmap(rk4)(xs)
    np.testing.assert_allclose(np.asarray(one_step_d), np.asarray(one_step_c),
                               atol=2e-4)


def test_mat_roundtrip(learned, tmp_path):
    """save_mat -> models/ssm.py:from_mat must reproduce the model (the
    artifact interchange path with the reference's SSMLearn tooling)."""
    from soft_robot_control_tpu.models.ssm import from_mat

    model, dt = learned
    path = str(tmp_path / "SSM_model.mat")
    save_mat(model, path)
    model2 = from_mat(path, np.asarray(model.z_ref))
    assert model2.state_dim == model.state_dim
    assert model2.SSM_order == model.SSM_order
    x = jnp.asarray([0.2, -0.1])
    u = jnp.asarray([0.3])
    np.testing.assert_allclose(np.asarray(model2.reduced_dynamics(x, u)),
                               np.asarray(model.reduced_dynamics(x, u)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(model2.C_map(x)),
                               np.asarray(model.C_map(x)), rtol=1e-12)


def test_learned_model_drives_mpc(learned):
    """End to end: a natively-learned SSM plugs into the batched SSM MPC and
    tracks a setpoint on the true plant's observation scale."""
    from soft_robot_control_tpu.control.batch_mpc import (BatchSSMMPC,
                                                          window_targets)

    model, _ = learned
    nz = model.output_dim
    Qz = 100.0 * np.eye(nz)
    R = 1e-4 * np.eye(model.input_dim)
    # the controller horizon must span the slow dynamics (period ~3 s):
    # run the continuous learned model at a coarser MPC dt
    dt_mpc = 0.05
    N, N_replan = 30, 5
    mpc = BatchSSMMPC(model, Qz, R, N=N, dt=dt_mpc, N_replan=N_replan,
                      qp_iters=300, dtype=jnp.float64)
    n_windows = 40
    run = mpc.build(n_windows)
    T = n_windows * N_replan + N + 1
    z_set = np.tile(np.array([0.12, 0.0]), (T, 1))
    zt = window_targets(z_set, n_windows, N_replan, N)[None]
    x0 = jnp.zeros((1, model.state_dim))
    logs = mpc.run_batch(x0, jnp.asarray(zt))
    z = np.asarray(logs["z"])[0]
    assert np.all(np.isfinite(z))
    tail = z[-40:, 0] - np.asarray(model.z_ref)[0]
    err = np.abs(tail - 0.12).mean()
    assert err < 0.01, f"setpoint tracking err {err:.4f}"


def test_train_ssm_native_on_chain_robot():
    """End-to-end plant-level identification: decay campaign on the FEM
    surrogate chain -> native SSM fit -> held-out decay prediction (the
    full SSM_sysID.py -> SSMLearn -> SSM_model.mat pipeline, natively)."""
    from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot, simulate
    from soft_robot_control_tpu.tasks.sysid_export import train_ssm_native

    from soft_robot_control_tpu.models.ssm_learn import delay_embed

    plant = make_chain_robot(n_nodes=10, n_cables=4, seed=0)
    n = plant.n_nodes_dof
    # observe 3 node POSITIONS with one delay tap (6-dim embedded
    # observable = SSM dim), like the Diamond artifact's 3 positions x 2
    # embeddings: raw velocities in the observable scale with the mode
    # frequency and make the SVD subspace chase fast modes
    nodes = [3, 6, 9]
    Hf = np.zeros((3, 2 * n))
    for i, nd in enumerate(nodes):
        Hf[i, n + nd] = 1.0           # position
    dt = 0.01
    rng = np.random.default_rng(0)
    u_levels = [rng.uniform(0.0, 2.5, 4) for _ in range(8)]
    # holdout-selected ridge (thin-manifold data makes the unregularized
    # fit unstable); settle_skip trims the off-manifold release transient
    skip = 30
    model = train_ssm_native(plant, Hf, u_levels, state_dim=6, SSM_order=3,
                             ROM_order=5, n_delay=1, hold_time=2.0,
                             decay_time=4.0, dt=dt, settle_skip=skip,
                             ridge=(1e-8, 1e-6, 1e-4, 1e-2, 1e-1))

    # held-out decay from a different actuation level
    u_hold = np.asarray(rng.uniform(0.5, 2.0, 4))  # inside the data envelope
    N_hold, N_dec = 200, 300
    u_seq = np.concatenate([np.tile(u_hold, (N_hold, 1)),
                            np.zeros((N_dec, 4))], axis=0)
    X = np.asarray(simulate(plant, plant.x_rest(), jnp.asarray(u_seq), dt))
    z_emb = np.asarray(delay_embed(jnp.asarray(X[N_hold:] @ Hf.T), 1))
    z_true = z_emb[skip:]  # the model lives on the manifold: predict
    #                        post-transient, matching its training domain

    x0 = model.compute_RO_state(jnp.asarray(z_true[0]))
    u = jnp.zeros((z_true.shape[0] - 1, model.input_dim))
    _, z_pred = model.rollout(x0, u, dt)
    z_eq = np.asarray(model.z_ref)
    scale = np.abs(z_true - z_eq).max()
    rms = np.sqrt(((np.asarray(z_pred) - z_true) ** 2).mean())
    assert scale > 1e-3
    rel = rms / scale
    assert rel < 0.15, f"chain SSM held-out decay rel RMS {rel:.3f}"
