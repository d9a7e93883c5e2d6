"""TPWL model tests: point selection, jacobians, rollout vs a numpy oracle
that mirrors the reference semantics (sofacontrol/tpwl/tpwl.py), and the
offline pipeline (surrogate plant -> POD -> TPWL -> fidelity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.linalg

from soft_robot_control_tpu.core.packing import qv2x
from soft_robot_control_tpu.models import tpwl as tpwl_mod
from soft_robot_control_tpu.models.tpwl import TPWLModel, from_tpwl_dict, rollout_batch
from soft_robot_control_tpu.models.tpwl_build import (build_tpwl_model, tpwl_config,
                                                      to_tpwl_dict)
from soft_robot_control_tpu.rom.pod import POD, compute_POD
from soft_robot_control_tpu.sim.fem_surrogate import make_chain_robot, simulate
from soft_robot_control_tpu.control.sequences import DiamondRobotSequences


def _random_tpwl(P=6, r=4, m=2, seed=0, beta=None, tpwl_method="nn"):
    rng = np.random.default_rng(seed)
    n = 2 * r
    A = rng.normal(size=(P, n, n)) * 0.5 - 1.5 * np.eye(n)
    B = rng.normal(size=(P, n, m))
    d = rng.normal(size=(P, n)) * 0.1
    q = rng.normal(size=(P, r))
    v = rng.normal(size=(P, r))
    u = rng.normal(size=(P, m))
    nf = 10
    U, _ = np.linalg.qr(rng.normal(size=(nf, r)))
    rom = POD({"U": U, "q_ref": rng.normal(size=nf), "v_ref": np.zeros(nf)})
    return TPWLModel(q=q, v=v, u=u, A_c=A, B_c=B, d_c=d, rom=rom,
                     dist_w_q=10.0, dist_w_v=1.0, beta=beta,
                     discr_method="zoh", tpwl_method=tpwl_method)


def _oracle_nearest(model, x):
    n = x.shape[0] // 2
    q, v = x[n:], x[:n]
    qd = 10.0 * np.linalg.norm(np.asarray(model.q) - q, axis=1)
    vd = 1.0 * np.linalg.norm(np.asarray(model.v) - v, axis=1)
    return int(np.argmin(qd + vd))


def test_nearest_point_matches_oracle():
    model = _random_tpwl()
    rng = np.random.default_rng(7)
    for _ in range(20):
        x = rng.normal(size=model.state_dim)
        assert int(model.calc_nearest_point(jnp.array(x))) == _oracle_nearest(model, x)


def test_weighting_factors_match_oracle():
    model = _random_tpwl(beta=2.0, tpwl_method="weighting")
    rng = np.random.default_rng(8)
    x = rng.normal(size=model.state_dim)
    w = np.asarray(model.calc_weighting_factors(jnp.array(x)))
    # oracle (tpwl.py:170-191)
    n = model.state_dim // 2
    q, v = x[n:], x[:n]
    dist = (10.0 * np.linalg.norm(np.asarray(model.q) - q, axis=1)
            + 1.0 * np.linalg.norm(np.asarray(model.v) - v, axis=1))
    m = dist.min()
    w_o = np.exp(-2.0 * dist / m)
    w_o = w_o / w_o.sum()
    np.testing.assert_allclose(w, w_o, atol=1e-12)
    # exact-hit case -> one-hot
    x_hit = qv2x(np.asarray(model.q)[3], np.asarray(model.v)[3])
    w = np.asarray(model.calc_weighting_factors(jnp.array(x_hit)))
    exp = np.zeros(model.num_points)
    exp[3] = 1.0
    np.testing.assert_allclose(w, exp, atol=1e-12)


def test_rollout_matches_numpy_oracle():
    model = _random_tpwl().pre_discretize(0.02)
    rng = np.random.default_rng(9)
    x0 = rng.normal(size=model.state_dim)
    u = rng.normal(size=(50, model.input_dim))

    x_jax = np.asarray(tpwl_mod.rollout(model, jnp.array(x0), jnp.array(u), 0.02))

    # numpy oracle with reference zoh + nn semantics
    Ad = np.asarray(model.A_d)
    Bd = np.asarray(model.B_d)
    dd = np.asarray(model.d_d)
    x = np.zeros((51, model.state_dim))
    x[0] = x0
    for i in range(50):
        j = _oracle_nearest(model, x[i])
        x[i + 1] = Ad[j] @ x[i] + Bd[j] @ u[i] + dd[j]
    np.testing.assert_allclose(x_jax, x, atol=1e-8)


def test_rollout_batch_vmaps():
    model = _random_tpwl().pre_discretize(0.02)
    rng = np.random.default_rng(10)
    B, N = 16, 20
    x0 = rng.normal(size=(B, model.state_dim))
    u = rng.normal(size=(B, N, model.input_dim))
    X = rollout_batch(model, jnp.array(x0), jnp.array(u), 0.02)
    assert X.shape == (B, N + 1, model.state_dim)
    # each row equals the single rollout
    x_single = tpwl_mod.rollout(model, jnp.array(x0[3]), jnp.array(u[3]), 0.02)
    np.testing.assert_allclose(np.asarray(X[3]), np.asarray(x_single), atol=1e-10)


def test_get_jacobians_discretize_on_the_fly_vs_cache():
    model = _random_tpwl()
    pre = model.pre_discretize(0.02)
    rng = np.random.default_rng(11)
    x = rng.normal(size=model.state_dim)
    A1, B1, d1 = model.get_jacobians(jnp.array(x), dt=0.02)
    A2, B2, d2 = pre.get_jacobians(jnp.array(x), dt=0.02)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-10)


def test_dict_roundtrip():
    model = _random_tpwl()
    d = to_tpwl_dict(model)
    model2 = from_tpwl_dict(d, params={"dist_weights": {"q": 10.0, "v": 1.0}})
    np.testing.assert_allclose(np.asarray(model2.A_c), np.asarray(model.A_c))
    rng = np.random.default_rng(12)
    x = rng.normal(size=model.state_dim)
    assert int(model2.calc_nearest_point(jnp.array(x))) == int(
        model.calc_nearest_point(jnp.array(x)))


# ---------------------------------------------------------------------------
# End-to-end offline pipeline on the FEM surrogate


@pytest.fixture(scope="module")
def pipeline():
    plant = make_chain_robot(n_nodes=10, n_cables=4, seed=0)
    seqs = DiamondRobotSequences(dt=0.02, t0=0.5)
    seqs.umax = 3.0 * np.ones(4)
    seqs.umin = np.zeros(4)
    u_seq, _, t_seq = seqs.lhs_sequence(nbr_samples=12, t_step=0.3, seed=1)
    u = np.asarray(u_seq).T  # (T, m)
    x0 = plant.x_rest()
    X = np.asarray(simulate(plant, x0, jnp.asarray(u), 0.02))

    # POD from velocity snapshots
    v_snaps = X[1:, :plant.n_nodes_dof] - 0.0
    q_snaps = X[1:, plant.n_nodes_dof:]
    snaps = np.concatenate([v_snaps, q_snaps - q_snaps[0]], axis=0)
    _, U, r, _ = compute_POD(snaps.T, 1e-8)
    rom = POD({"U": U, "q_ref": X[0, plant.n_nodes_dof:],
               "v_ref": np.zeros(plant.n_nodes_dof)})
    return plant, rom, X, u


def test_offline_pipeline_builds_accurate_tpwl(pipeline):
    """collect -> POD -> TPWL -> rollout fidelity vs the true plant.

    The surrogate's semi-implicit Euler step equals the backward-Euler
    discretization of its affine linearization, so with discr_method='be'
    a dense TPWL dictionary must reproduce the plant essentially exactly;
    a sparse dictionary must still be a good model. This mirrors the
    reference's TPWL_rollout model-validation check
    (examples/hardware/diamond.py:20-73).
    """
    plant, rom, X, u = pipeline
    n = plant.n_nodes_dof
    # output: position of last node
    Hf = np.zeros((1, 2 * n))
    Hf[0, 2 * n - 1] = 1.0
    z_true = X @ Hf.T

    def rel_mse(threshold):
        cfg = tpwl_config(TPWL_threshold=threshold,
                          TPWL_weighting_factors={"q": 10.0, "v": 1.0})
        model = build_tpwl_model(plant, rom, X[:-1], u, config=cfg, Hf=Hf,
                                 params={"dist_weights": {"q": 10.0, "v": 1.0}},
                                 discr_method="be")
        assert model.num_points >= 2
        model = model.pre_discretize(0.02)
        x0_r = rom.project_x(jnp.asarray(X[0]))
        _, z = model.rollout(x0_r, jnp.asarray(u), 0.02)
        z = np.asarray(z)
        mse = np.mean((z[:-1, 0] - z_true[:-1, 0]) ** 2)
        scale = np.mean((z_true[:, 0] - z_true[0, 0]) ** 2) + 1e-12
        return mse / scale, model.num_points

    dense_err, dense_P = rel_mse(0.2)
    assert dense_err < 1e-6, f"dense TPWL inaccurate: rel mse {dense_err:.3g}"
    sparse_err, sparse_P = rel_mse(3.0)
    assert sparse_P < dense_P
    assert sparse_err < 0.2, f"sparse TPWL inaccurate: rel mse {sparse_err:.3g}"


def test_weighting_mode_rollout():
    """Exponential-weighting TPWL rollout under scan matches a numpy oracle
    (tpwl.py:244-250 + 170-191 semantics)."""
    model = _random_tpwl(beta=3.0, tpwl_method="weighting")
    rng = np.random.default_rng(21)
    x0 = rng.normal(size=model.state_dim) * 0.5
    u = rng.normal(size=(20, model.input_dim))
    dt = 0.05

    x_jax = np.asarray(tpwl_mod.rollout(model, jnp.array(x0), jnp.array(u), dt))

    # numpy oracle
    A_c = np.asarray(model.A_c)
    B_c = np.asarray(model.B_c)
    d_c = np.asarray(model.d_c)
    q_pts, v_pts = np.asarray(model.q), np.asarray(model.v)
    x = np.zeros((21, model.state_dim))
    x[0] = x0
    n = model.state_dim // 2
    for i in range(20):
        q, v = x[i, n:], x[i, :n]
        dist = (10.0 * np.linalg.norm(q_pts - q, axis=1)
                + 1.0 * np.linalg.norm(v_pts - v, axis=1))
        w = np.exp(-3.0 * dist / dist.min())
        w /= w.sum()
        A = np.einsum("i,ijk->jk", w, A_c)
        B = np.einsum("i,ijk->jk", w, B_c)
        d = np.einsum("i,ij->j", w, d_c)
        # use the module's own discretizer per step (already tested against
        # scipy) to isolate the weighting logic under test
        from soft_robot_control_tpu.core import discretize as disc_mod
        Ad, Bd, dd = [np.asarray(v_) for v_ in disc_mod.zoh_affine(
            jnp.array(A), jnp.array(B), jnp.array(d), dt)]
        x[i + 1] = Ad @ x[i] + Bd @ u[i] + dd
    np.testing.assert_allclose(x_jax, x, atol=1e-8)


def test_rollout_batch_matmul_matches_exact():
    """The batch-fused matmul rollout path reproduces the exact per-sample
    path (identical selections away from fp near-ties)."""
    import jax
    from soft_robot_control_tpu.tasks.demo import make_demo_tpwl
    from soft_robot_control_tpu.models.tpwl import rollout_batch

    model = make_demo_tpwl(r=8, P=40, m=3, nz=2, nf=16,
                           dtype=np.float64).pre_discretize(0.02)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(0.1 * rng.normal(size=(64, model.state_dim)))
    u = jnp.asarray(np.abs(rng.normal(size=(64, 30, 3))))
    Xa = np.asarray(rollout_batch(model, x0, u, 0.02, select="exact"))
    Xb = np.asarray(rollout_batch(model, x0, u, 0.02, select="matmul"))
    np.testing.assert_allclose(Xb, Xa, rtol=1e-8, atol=1e-9)


def test_rollout_batch_pallas_matches_matmul():
    """The fused Pallas selection+gather rollout (interpret mode on CPU)
    reproduces the matmul-distance path."""
    from soft_robot_control_tpu.tasks.demo import make_demo_tpwl

    model = make_demo_tpwl(r=8, P=40, m=3, nz=2, nf=16,
                           dtype=np.float32).pre_discretize(0.02)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(0.1 * rng.normal(size=(16, model.state_dim)),
                     jnp.float32)
    u = jnp.asarray(np.abs(rng.normal(size=(16, 20, 3))), jnp.float32)
    Xa = np.asarray(rollout_batch(model, x0, u, 0.02, select="matmul"))
    Xb = np.asarray(rollout_batch(model, x0, u, 0.02, select="pallas",
                                  interpret=True))
    np.testing.assert_allclose(Xb, Xa, rtol=2e-5, atol=2e-5)


def test_rollout_batch_weighting_matches_per_sample():
    """The batched exponential-weighting rollout matches vmapped per-sample
    get_jacobians(weighting) stepping (reference tpwl.py:170-191,219-234
    semantics) and auto-selects for weighting-mode models."""
    model = _random_tpwl(P=8, r=4, m=2, seed=5, beta=3.0,
                         tpwl_method="weighting")
    model = model._replace(discr_method="be")
    dt = 0.02
    rng = np.random.default_rng(2)
    B, T = 8, 15
    x0 = jnp.asarray(0.2 * rng.normal(size=(B, model.state_dim)))
    u = jnp.asarray(rng.normal(size=(B, T, 2)))

    def step_one(x, u_t):
        A, Bm, d = model.get_jacobians(x, dt=dt)
        xn = A @ x + Bm @ u_t + d
        return xn, xn

    def roll_one(x0_, u_):
        _, xs = jax.lax.scan(step_one, x0_, u_)
        return jnp.concatenate([x0_[None], xs], axis=0)

    Xref = np.asarray(jax.vmap(roll_one)(x0, u))
    Xb = np.asarray(rollout_batch(model, x0, u, dt, select="weighting"))
    np.testing.assert_allclose(Xb, Xref, rtol=1e-8, atol=1e-9)
    Xauto = np.asarray(rollout_batch(model, x0, u, dt))
    np.testing.assert_allclose(Xauto, Xref, rtol=1e-8, atol=1e-9)


def test_dynamics_criterion_matches_model_oracle(pipeline):
    """The dynamics-error selection criterion (eval_type='dynamics',
    tpwl_utils.py:199-260) uses a numpy mirror of the partial TPWL model
    for speed; its add-decisions must match an oracle that rebuilds the
    real TPWLModel after every add and predicts with update_state."""
    plant, rom, X, u = pipeline
    T = 120
    Xs, us = X[:T], u[:T]
    dt = 0.02
    cfg = tpwl_config(TPWL_threshold=0.05, eval_type="dynamics",
                      TPWL_weighting_factors={"q": 10.0, "v": 1.0},
                      discr_method="be", dt=dt)
    model = build_tpwl_model(plant, rom, Xs[:-1], us[:len(Xs) - 1],
                             config=cfg,
                             params={"dist_weights": {"q": 1.0, "v": 0.0}},
                             discr_method="be")
    assert 2 <= model.num_points < T

    # oracle: same loop with the real TPWLModel doing the prediction
    from soft_robot_control_tpu.models.tpwl_build import reduced_affine_dynamics
    from soft_robot_control_tpu.core.packing import x2qv

    xr = np.asarray(jax.vmap(rom.project_x)(jnp.asarray(Xs[:-1])))
    qr, vr = (np.asarray(a) for a in x2qv(xr))
    r = rom.rom_dim
    sel = []

    def partial():
        idx = np.asarray(sel)
        A = np.stack([np.asarray(reduced_affine_dynamics(
            plant, rom, Xs[i], us[i])[0]) for i in idx])
        B = np.stack([np.asarray(reduced_affine_dynamics(
            plant, rom, Xs[i], us[i])[1]) for i in idx])
        d = np.stack([np.asarray(reduced_affine_dynamics(
            plant, rom, Xs[i], us[i])[2]) for i in idx])
        return TPWLModel(q=qr[idx], v=vr[idx], u=us[idx], A_c=A, B_c=B,
                         d_c=d, rom=rom, dist_w_q=cfg.dist_weights["q"],
                         dist_w_v=cfg.dist_weights["v"],
                         discr_method="be", tpwl_method="nn")

    sim_sys = None
    for i in range(len(Xs) - 1):
        if not sel:
            sel.append(i)
            sim_sys = partial()
            continue
        if i == 0 or np.all(us[i - 1] == 0):
            continue
        x_pred = np.asarray(sim_sys.update_state(
            jnp.asarray(xr[i - 1]), jnp.asarray(us[i - 1]), dt))
        d_est = x_pred - xr[i - 1]
        d_true = xr[i] - xr[i - 1]
        dq_err = 10.0 * np.linalg.norm(d_est[r:] - d_true[r:])
        dv_err = 1.0 * np.linalg.norm(d_est[:r] - d_true[:r])
        if dq_err + dv_err >= cfg.TPWL_threshold:
            sel.append(i)
            sim_sys = partial()

    assert model.num_points == len(sel)
    np.testing.assert_allclose(np.asarray(model.q), qr[np.asarray(sel)],
                               rtol=1e-10, atol=1e-12)
