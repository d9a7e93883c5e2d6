"""Fully-jitted batched closed-loop MPC + EKF (BASELINE config 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import BatchMPC, window_targets

from helpers import chain_pipeline


@pytest.fixture(scope="module")
def setup():
    plant, rom, model, Hf, Cf, X, _ = chain_pipeline()
    dt = 0.02
    return plant, rom, model, Hf, Cf, X, dt


def test_window_targets_slicing():
    z = np.arange(20, dtype=float)[:, None]
    w = window_targets(z, n_windows=3, N_replan=2, N=4)
    assert w.shape == (3, 5, 1)
    np.testing.assert_allclose(w[0, :, 0], [0, 1, 2, 3, 4])
    np.testing.assert_allclose(w[1, :, 0], [2, 3, 4, 5, 6])
    np.testing.assert_allclose(w[2, :, 0], [4, 5, 6, 7, 8])


def test_batched_closed_loop_tracks(setup):
    plant, rom, model, Hf, Cf, X, dt = setup
    N, N_replan = 5, 2
    Qz = np.array([[200.0]])
    R = 1e-3 * np.eye(4)
    dx_char = None

    mpc = BatchMPC(model, Qz, R, N=N, dt=dt, N_replan=N_replan,
                   qp_iters=60, scp_iters=1, dtype=jnp.float64,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    n_windows = 60
    run = mpc.build(n_windows)

    B = 8
    z0 = float(X[0] @ Hf[0])
    x0_red = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = n_windows * N_replan + N + 1
    t = dt * np.arange(T)
    rng = np.random.default_rng(0)
    phases = rng.uniform(0, 2 * np.pi, size=B)
    amps = rng.uniform(0.04, 0.08, size=B)
    z_targets = np.stack([
        window_targets((z0 + amps[b] * np.sin(2 * np.pi * t / 4.0 + phases[b]))[:, None],
                       n_windows, N_replan, N)
        for b in range(B)])

    x_plant0 = np.tile(x0_red, (B, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    logs = mpc.run_batch(jnp.asarray(x_plant0), jnp.asarray(x_plant0),
                         jnp.asarray(z_targets), keys)

    z = np.asarray(logs["z"])          # (B, n_windows*N_replan, 1)
    assert z.shape == (B, n_windows * N_replan, 1)
    assert np.all(np.isfinite(z))

    # tracking quality per batch element (ROM-as-plant: model-consistent, so
    # errors should be small once the loop settles)
    for b in range(B):
        T_sim = z.shape[1]
        z_des = z0 + amps[b] * np.sin(2 * np.pi * dt * (np.arange(T_sim) + 1)
                                      / 4.0 + phases[b])
        err = z[b, T_sim // 3:, 0] - z_des[T_sim // 3:]
        rel = np.sqrt(np.mean(err**2)) / amps[b]
        assert rel < 0.35, f"batch {b}: rel RMSE {rel:.3f}"


def test_batched_matches_single(setup):
    plant, rom, model, Hf, Cf, X, dt = setup
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4, dt=dt,
                   N_replan=2, qp_iters=40, dtype=jnp.float64,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    run = mpc.build(5)
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = 5 * 2 + 4 + 1
    zt = window_targets(np.full((T, 1), z0 + 0.05), 5, 2, 4)
    key = jax.random.PRNGKey(1)

    single = jax.jit(run)(jnp.asarray(x0), jnp.asarray(x0), jnp.asarray(zt), key)
    B = 3
    batched = mpc.run_batch(jnp.tile(x0, (B, 1)), jnp.tile(x0, (B, 1)),
                            jnp.tile(zt, (B, 1, 1, 1)),
                            jnp.tile(key[None], (B, 1)))
    for k in ["z", "u"]:
        np.testing.assert_allclose(np.asarray(batched[k][1]),
                                   np.asarray(single[k]), atol=1e-9)


def test_fused_matches_vmapped(setup):
    """The grid-batched-Pallas fused path (build_fused) must reproduce the
    vmapped kinv path: same update rule, same linearizations — only the
    launch structure differs (interpret-mode kernel on CPU)."""
    plant, rom, model, Hf, Cf, X, dt = setup
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4, dt=dt,
                   N_replan=2, qp_iters=40, dtype=jnp.float64, x_step="kinv",
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    n_win = 5
    run = mpc.build(n_win)
    run_f = mpc.build_fused(n_win)
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = n_win * 2 + 4 + 1
    B = 3
    rng = np.random.default_rng(2)
    offs = rng.uniform(0.03, 0.07, size=B)
    zt = np.stack([window_targets(np.full((T, 1), z0 + offs[b]), n_win, 2, 4)
                   for b in range(B)])
    x0B = jnp.tile(x0, (B, 1))
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    ref = mpc.run_batch(x0B, x0B, jnp.asarray(zt), keys)
    fused = run_f(x0B, x0B, jnp.asarray(zt), keys)
    for k in ["z", "u"]:
        assert fused[k].shape == ref[k].shape
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(ref[k]),
                                   atol=1e-9)


def test_condensed_matches_sparse(setup):
    """The condensed formulation (states eliminated by forward
    substitution, scp/locp_condensed.py) must reproduce the sparse LOCP's
    closed loop: same QP optimum, so with enough ADMM iterations both
    converge to the same plans (f64)."""
    from soft_robot_control_tpu.core.constraints import HyperRectangle

    plant, rom, model, Hf, Cf, X, dt = setup
    U = HyperRectangle(3.0 * np.ones(4), np.zeros(4))
    kw = dict(N=4, dt=dt, N_replan=2, qp_iters=600, dtype=jnp.float64,
              x_step="kinv", U=U,
              W=1e-2 * np.eye(model.state_dim),
              V=1e-4 * np.eye(model.C.shape[0]))
    runs = {}
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    n_win = 5
    T = n_win * 2 + 4 + 1
    zt = window_targets(np.full((T, 1), z0 + 0.05), n_win, 2, 4)
    for form in ("sparse", "condensed"):
        mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4),
                       formulation=form, **kw)
        run = mpc.build(n_win)
        runs[form] = jax.jit(run)(jnp.asarray(x0), jnp.asarray(x0),
                                  jnp.asarray(zt), jax.random.PRNGKey(1))
    for k in ("z", "u"):
        np.testing.assert_allclose(np.asarray(runs["condensed"][k]),
                                   np.asarray(runs["sparse"][k]), atol=2e-5)
    # the input constraint is active and respected to ADMM's finite-
    # iteration primal tolerance
    u = np.asarray(runs["condensed"]["u"])
    assert u.max() <= 3.0 + 1e-2 and u.min() >= -1e-2
    assert u.max() > 2.99  # the bound actually binds in this problem


def test_condensed_fused_matches_vmapped(setup):
    """Condensed formulation through the grid-batched Pallas launch."""
    plant, rom, model, Hf, Cf, X, dt = setup
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4, dt=dt,
                   N_replan=2, qp_iters=40, dtype=jnp.float64, x_step="kinv",
                   formulation="condensed",
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    n_win = 5
    run = mpc.build(n_win)
    run_f = mpc.build_fused(n_win)
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = n_win * 2 + 4 + 1
    B = 3
    rng = np.random.default_rng(4)
    offs = rng.uniform(0.03, 0.07, size=B)
    zt = np.stack([window_targets(np.full((T, 1), z0 + o), n_win, 2, 4)
                   for o in offs])
    x0B = jnp.tile(x0, (B, 1))
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    ref = mpc.run_batch(x0B, x0B, jnp.asarray(zt), keys)
    fused = run_f(x0B, x0B, jnp.asarray(zt), keys)
    for k in ["z", "u"]:
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(ref[k]),
                                   atol=1e-9)


def test_kinv_xstep_matches_chol(setup):
    """The precomputed-K^-1 ADMM variant must agree with the cho_solve
    variant (f64)."""
    plant, rom, model, Hf, Cf, X, dt = setup
    import jax

    kw = dict(N=4, dt=dt, N_replan=2, qp_iters=60, dtype=jnp.float64,
              W=1e-2 * np.eye(model.state_dim),
              V=1e-4 * np.eye(model.C.shape[0]))
    runs = {}
    for xs in ("chol", "kinv"):
        mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4),
                       x_step=xs, **kw)
        run = mpc.build(5)
        z0 = float(X[0] @ Hf[0])
        x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
        T = 5 * 2 + 4 + 1
        zt = window_targets(np.full((T, 1), z0 + 0.05), 5, 2, 4)
        runs[xs] = jax.jit(run)(jnp.asarray(x0), jnp.asarray(x0),
                                jnp.asarray(zt), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(runs["kinv"]["z"]),
                               np.asarray(runs["chol"]["z"]), atol=1e-6)
