"""Multi-chip sharding tests on the 8-device host-platform mesh: sharded
rollouts must equal single-device rollouts bit-for-bit (same algorithm,
distributed argmin + owner psum-gather), and the batched MPC must run
sharded over 'dp'."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import BatchMPC, window_targets
from soft_robot_control_tpu.models.tpwl import rollout_batch
from soft_robot_control_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                  sharded_batch_mpc_fused,
                                                  sharded_rollout_batch)

from helpers import chain_pipeline


@pytest.fixture(scope="module")
def setup():
    plant, rom, model, Hf, Cf, X, _ = chain_pipeline()
    return rom, model.pre_discretize(0.02), Hf, X


def test_sharded_rollout_matches_local(setup):
    rom, model, Hf, X = setup
    assert len(jax.devices()) >= 8
    mesh = make_mesh(dp=4, mp=2)
    rng = np.random.default_rng(0)
    B, N = 8, 25
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    x0s = x0 + 0.05 * rng.normal(size=(B, model.state_dim))
    us = np.abs(rng.normal(size=(B, N, model.input_dim)))

    X_local = np.asarray(rollout_batch(model, jnp.asarray(x0s), jnp.asarray(us), 0.02))
    X_shard = np.asarray(sharded_rollout_batch(model, jnp.asarray(x0s),
                                               jnp.asarray(us), 0.02, mesh))
    np.testing.assert_allclose(X_shard, X_local, atol=1e-12)


def test_sharded_rollout_point_padding(setup):
    """mp that does not divide the point count exercises the padding path."""
    rom, model, Hf, X = setup
    mesh = make_mesh(dp=2, mp=4)
    rng = np.random.default_rng(1)
    B, N = 4, 10
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    x0s = x0 + 0.05 * rng.normal(size=(B, model.state_dim))
    us = np.abs(rng.normal(size=(B, N, model.input_dim)))
    X_local = np.asarray(rollout_batch(model, jnp.asarray(x0s), jnp.asarray(us), 0.02))
    X_shard = np.asarray(sharded_rollout_batch(model, jnp.asarray(x0s),
                                               jnp.asarray(us), 0.02, mesh))
    np.testing.assert_allclose(X_shard, X_local, atol=1e-12)


def test_batch_mpc_sharded_dp(setup):
    """The full jitted closed loop shards over 'dp' by input placement."""
    rom, model, Hf, X = setup
    mesh = make_mesh(dp=8, mp=1)
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4, dt=0.02,
                   N_replan=2, qp_iters=30, dtype=jnp.float64,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    run = mpc.build(4)
    B = 8
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = 4 * 2 + 4 + 1
    zt = np.tile(window_targets(np.full((T, 1), z0 + 0.03), 4, 2, 4),
                 (B, 1, 1, 1))
    args = (jnp.tile(x0, (B, 1)), jnp.tile(x0, (B, 1)), jnp.asarray(zt),
            jax.random.split(jax.random.PRNGKey(0), B))
    args = shard_batch(args, mesh, "dp")
    logs = jax.jit(jax.vmap(run))(*args)
    z = np.asarray(logs["z"])
    assert z.shape == (B, 8, 1)
    assert np.all(np.isfinite(z))


def test_batch_mpc_fused_sharded_matches_local(setup):
    """The fused (grid-batched Pallas) closed loop under shard_map over
    'dp' must reproduce the unsharded fused run exactly — pure DP, no
    collectives, per-device grid of B/dp."""
    rom, model, Hf, X = setup
    mesh = make_mesh(dp=4, mp=1)
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4,
                   dt=0.02, N_replan=2, qp_iters=30, dtype=jnp.float64,
                   x_step="kinv",
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    n_win = 4
    run_local = mpc.build_fused(n_win)
    run_shard = sharded_batch_mpc_fused(mpc, n_win, mesh)
    B = 8
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = n_win * 2 + 4 + 1
    rng = np.random.default_rng(3)
    offs = rng.uniform(0.02, 0.05, size=B)
    zt = np.stack([window_targets(np.full((T, 1), z0 + o), n_win, 2, 4)
                   for o in offs])
    args = (jnp.tile(x0, (B, 1)), jnp.tile(x0, (B, 1)), jnp.asarray(zt),
            jax.random.split(jax.random.PRNGKey(0), B))
    ref = run_local(*args)
    out = run_shard(*shard_batch(args, mesh, "dp"))
    for k in ["z", "u"]:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-12)


def test_batch_mpc_fused_mp_sharded_matches_local(setup):
    """The fused closed loop with the DICTIONARY sharded over 'mp'
    (distributed argmin + owner psum on every point fetch:
    relinearization, plant step, EKF predict, feedback gain) must
    reproduce the unsharded fused run. dp=2 x mp=4 also exercises point
    padding (P typically not divisible by 4)."""
    from soft_robot_control_tpu.parallel.mesh import sharded_batch_mpc_fused_mp

    rom, model, Hf, X = setup
    mesh = make_mesh(dp=2, mp=4)
    mpc = BatchMPC(model, np.array([[100.0]]), 1e-3 * np.eye(4), N=4,
                   dt=0.02, N_replan=2, qp_iters=30, dtype=jnp.float64,
                   x_step="kinv",
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    n_win = 3
    run_local = mpc.build_fused(n_win)
    run_mp = sharded_batch_mpc_fused_mp(mpc, n_win, mesh)
    B = 4
    z0 = float(X[0] @ Hf[0])
    x0 = np.asarray(rom.project_x(jnp.asarray(X[0])))
    T = n_win * 2 + 4 + 1
    rng = np.random.default_rng(5)
    offs = rng.uniform(0.02, 0.05, size=B)
    zt = np.stack([window_targets(np.full((T, 1), z0 + o), n_win, 2, 4)
                   for o in offs])
    args = (jnp.tile(x0, (B, 1)), jnp.tile(x0, (B, 1)), jnp.asarray(zt),
            jax.random.split(jax.random.PRNGKey(0), B))
    ref = run_local(*args)
    out = run_mp(*args)
    for k in ["z", "u"]:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-10)


@pytest.mark.slow
def test_campaign_dictionary_mp_sharded():
    """The committed P=1087 Diamond campaign dictionary sharded over 'mp'
    (the HBM-capacity case the axis exists for) matches the local rollout
    path (VERDICT r2 weak #8)."""
    import os
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "diamond_tet",
        "tpwl_model_snapshots.pkl")
    if not os.path.exists(art):
        pytest.skip("campaign artifact not built")
    from soft_robot_control_tpu.models.tpwl import from_tpwl_dict

    big = from_tpwl_dict(art, params={"dist_weights": {"q": 10.0, "v": 1.0}})
    assert big.num_points > 500
    dtb = float(big.pre_discretized_dt)
    mesh = make_mesh(dp=2, mp=4)
    rng = np.random.default_rng(0)
    B, N = 2, 5
    x0s = jnp.asarray(0.05 * rng.normal(size=(B, big.state_dim)))
    us = jnp.asarray(np.abs(rng.normal(size=(B, N, big.input_dim))))
    X_local = np.asarray(rollout_batch(big, x0s, us, dtb, select="exact"))
    X_shard = np.asarray(sharded_rollout_batch(big, x0s, us, dtb, mesh))
    np.testing.assert_allclose(X_shard, X_local, atol=1e-10)
