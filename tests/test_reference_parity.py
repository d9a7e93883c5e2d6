"""Head-to-head parity against the MOUNTED reference code.

These tests import the actual reference modules from /root/reference
(sofacontrol.tpwl.tpwl, sofacontrol.tpwl.observer, sofacontrol.lqr.ilqr,
sofacontrol.lqr.traj_tracking_lqr) — not re-implemented oracles — drive both
stacks with the same TPWL dictionary and inputs, and demand 1e-6 agreement
on rollouts, EKF means/covariances, tracking-LQR gains, and iLQR policies.

The reference's only unavailable import on this box is `osqp`
(sofacontrol/utils.py:5, used solely by Polyhedron.project which these code
paths never call), so a bare module stub is installed before import.
"""

import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def refmod():
    """Import the reference modules with an osqp stub; skip if unavailable."""
    if "osqp" not in sys.modules:
        sys.modules["osqp"] = types.ModuleType("osqp")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    ref = types.SimpleNamespace()
    try:
        import sofacontrol.tpwl.tpwl as ref_tpwl
        import sofacontrol.tpwl.observer as ref_observer
        import sofacontrol.lqr.ilqr as ref_ilqr
        import sofacontrol.lqr.traj_tracking_lqr as ref_ttlqr
        import sofacontrol.utils as ref_utils
    except ImportError as e:  # reference not mounted
        pytest.skip(f"reference code not importable: {e}")
    ref.tpwl, ref.observer, ref.ilqr = ref_tpwl, ref_observer, ref_ilqr
    ref.ttlqr, ref.utils = ref_ttlqr, ref_utils
    return ref


def make_dict(r=5, P=9, m=3, nf=14, seed=0):
    """A stable reference-format TPWL dictionary (float64)."""
    rng = np.random.default_rng(seed)
    n = 2 * r
    A_c, B_c, d_c = [], [], []
    q_pts, v_pts, u_pts = [], [], []
    base_w = rng.uniform(2.0, 8.0, size=r)
    Bv = rng.normal(size=(r, m))
    for p in range(P):
        w = base_w * (1.0 + 0.15 * np.sin(2 * np.pi * p / P + np.arange(r)))
        A = np.zeros((n, n))
        A[:r, :r] = -np.diag(2 * 0.4 * w)
        A[:r, r:] = -np.diag(w ** 2)
        A[r:, :r] = np.eye(r)
        A_c.append(A)
        B_c.append(np.vstack([Bv * (1 + 0.1 * np.cos(2 * np.pi * p / P)),
                              np.zeros((r, m))]))
        d_c.append(0.02 * rng.normal(size=n))
        q_pts.append(0.3 * rng.normal(size=r))
        v_pts.append(0.1 * rng.normal(size=r))
        u_pts.append(rng.uniform(0, 1, size=m))
    U, _ = np.linalg.qr(rng.normal(size=(nf, r)))
    return {
        "q": np.asarray(q_pts), "v": np.asarray(v_pts), "u": np.asarray(u_pts),
        "A_c": np.asarray(A_c), "B_c": np.asarray(B_c), "d_c": np.asarray(d_c),
        "rom_info": {"type": "POD", "U": U,
                     "q_ref": rng.normal(size=nf), "v_ref": np.zeros(nf)},
    }


def build_pair(refmod, data, discr_method, tpwl_method="nn", beta=None,
               nz=2, ny=3, seed=1):
    """Build (reference TPWLATV, our TPWLModel) from the same dict."""
    from soft_robot_control_tpu.models.tpwl import from_tpwl_dict

    rng = np.random.default_rng(seed)
    nf = data["rom_info"]["U"].shape[0]
    Hf = 0.4 * rng.normal(size=(nz, 2 * nf))
    Cf = 0.4 * rng.normal(size=(ny, 2 * nf))
    params = {"dist_weights": {"q": 10.0, "v": 1.0},
              "tpwl_method": tpwl_method, "beta_weighting": beta}
    ref_model = refmod.tpwl.TPWLATV(
        {k: (v.copy() if isinstance(v, np.ndarray) else dict(v))
         for k, v in data.items()},
        params=params, Cf=Cf, Hf=Hf, discr_method=discr_method)
    my_model = from_tpwl_dict(data, params=params, Cf=Cf, Hf=Hf,
                              discr_method=discr_method)
    return ref_model, my_model


def input_seq(m, N, seed=2):
    rng = np.random.default_rng(seed)
    t = np.arange(N)[:, None]
    return 0.6 * np.abs(rng.normal(size=(1, m))) * (
        1 + np.sin(0.3 * t + rng.uniform(0, 6, size=(1, m))))


@pytest.mark.parametrize("discr", ["fe", "be", "bil", "zoh"])
def test_rollout_parity_nn(refmod, discr):
    """TPWLATV.rollout (tpwl.py:193-216) vs our scan rollout, all discr
    methods, nearest-neighbor point selection."""
    data = make_dict()
    ref_model, my_model = build_pair(refmod, data, discr)
    m = data["u"].shape[1]
    u = input_seq(m, 40)
    x0 = 0.05 * np.ones(2 * data["q"].shape[1])
    dt = 0.02
    x_ref, z_ref = ref_model.rollout(x0.copy(), u.copy(), dt)
    x_my, z_my = my_model.rollout(x0, u, dt)
    np.testing.assert_allclose(np.asarray(x_my), x_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(z_my), z_ref, rtol=1e-9, atol=1e-9)


def test_rollout_parity_weighting(refmod):
    """Exponential-weighting mixture path (tpwl.py:170-191, 246-252)."""
    data = make_dict(seed=3)
    ref_model, my_model = build_pair(refmod, data, "zoh",
                                     tpwl_method="weighting", beta=2.0)
    m = data["u"].shape[1]
    u = input_seq(m, 25, seed=4)
    x0 = np.zeros(2 * data["q"].shape[1])
    x_ref, z_ref = ref_model.rollout(x0.copy(), u.copy(), 0.05)
    x_my, z_my = my_model.rollout(x0, u, 0.05)
    np.testing.assert_allclose(np.asarray(x_my), x_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(z_my), z_ref, rtol=1e-8, atol=1e-9)


def test_prediscretized_jacobian_parity(refmod):
    """pre_discretize caches (tpwl.py:299-322) must agree pointwise and be
    selected when dt matches."""
    data = make_dict(seed=5)
    ref_model, my_model = build_pair(refmod, data, "zoh")
    dt = 0.01
    ref_model.pre_discretize(dt)
    my_pd = my_model.pre_discretize(dt)
    np.testing.assert_allclose(np.asarray(my_pd.A_d),
                               np.asarray(ref_model.A_d), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(my_pd.B_d),
                               np.asarray(ref_model.B_d), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(my_pd.d_d),
                               np.asarray(ref_model.d_d), rtol=1e-9, atol=1e-12)
    x = 0.1 * np.ones(2 * data["q"].shape[1])
    A1, B1, d1 = ref_model.get_jacobians(x, dt=dt)
    A2, B2, d2 = my_pd.get_jacobians(x, dt=dt)
    np.testing.assert_allclose(np.asarray(A2), A1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B2), B1, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d2), d1, rtol=1e-9, atol=1e-12)


def test_ekf_parity(refmod):
    """DiscreteEKFObserver (observer.py:33-126): 30 predict+update steps,
    means, covariances, and z estimates to 1e-6."""
    from soft_robot_control_tpu.estimators.ekf import DiscreteEKFObserver

    data = make_dict(seed=6)
    ref_model, my_model = build_pair(refmod, data, "be", seed=7)
    dt = 0.02
    n = ref_model.state_dim
    W = 0.5 * np.eye(n)
    V = 0.1 * np.eye(ref_model.meas_dim)
    Sigma0 = np.eye(n)
    ref_obs = refmod.observer.DiscreteEKFObserver(ref_model, Sigma0=Sigma0,
                                                  W=W.copy(), V=V.copy())
    my_obs = DiscreteEKFObserver(my_model, Sigma0=Sigma0, W=W, V=V)

    rng = np.random.default_rng(8)
    m = data["u"].shape[1]
    Cf_yref = ref_model.y_ref
    for _ in range(30):
        u = np.abs(rng.normal(size=m))
        y = Cf_yref + 0.05 * rng.normal(size=ref_model.meas_dim)
        ref_obs.update(u.copy(), y.copy(), dt)
        my_obs.update(u, y, dt)
        np.testing.assert_allclose(np.asarray(my_obs.x), ref_obs.x,
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(my_obs.Sigma), ref_obs.Sigma,
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(my_obs.z), ref_obs.z,
                                   rtol=1e-8, atol=1e-9)


def test_traj_tracking_lqr_parity(refmod):
    """TrajTrackingLQR.perform_dlqr_recursion (traj_tracking_lqr.py:18-48):
    gains and nominal trajectories to 1e-6."""
    from soft_robot_control_tpu.core.types import QuadraticCost
    from soft_robot_control_tpu.lqr.tvlqr import TrajTrackingLQR

    data = make_dict(seed=9)
    ref_model, my_model = build_pair(refmod, data, "zoh", seed=10)
    dt = 0.05
    n, m = ref_model.state_dim, ref_model.input_dim
    rng = np.random.default_rng(11)
    T = 20
    t_grid = 0.1 * np.arange(T)
    x_traj = 0.1 * rng.normal(size=(T, n)).cumsum(axis=0)
    u_traj = np.abs(rng.normal(size=(T, m)))
    target = types.SimpleNamespace(t=t_grid, x=x_traj, u=u_traj)

    Q = np.diag(rng.uniform(1, 5, size=n))
    R = 0.1 * np.eye(m)
    ref_cost = refmod.utils.QuadraticCost(Q=Q.copy(), R=R.copy())
    ref_lqr = refmod.ttlqr.TrajTrackingLQR(dt, ref_model, ref_cost)
    xb_ref, ub_ref, K_ref = ref_lqr.compute_policy(target)

    my_lqr = TrajTrackingLQR(dt, my_model, QuadraticCost(Q=Q, R=R))
    xb_my, ub_my, K_my = my_lqr.compute_policy(target)

    np.testing.assert_allclose(np.asarray(xb_my), xb_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ub_my), ub_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(K_my), K_ref, rtol=1e-7, atol=1e-8)


def test_ilqr_parity(refmod):
    """iLQR.ilqr_computation (lqr/ilqr.py:27-107): full policies (x, u, K)
    to 1e-6 on a well-conditioned tracking problem."""
    from soft_robot_control_tpu.core.types import QuadraticCost
    from soft_robot_control_tpu.lqr.ilqr import iLQR

    data = make_dict(seed=12)
    ref_model, my_model = build_pair(refmod, data, "be", nz=2, seed=13)
    dt = 0.05
    T = 25
    nz = ref_model.output_dim
    m = ref_model.input_dim
    tt = dt * np.arange(T + 1)
    z_target = ref_model.z_ref + 0.2 * np.stack(
        [np.sin(2 * np.pi * tt / 1.0 + k) for k in range(nz)], axis=1)

    Q = 50.0 * np.eye(nz)
    Qf = 100.0 * np.eye(nz)
    R = 0.5 * np.eye(m)

    ref_cost = refmod.utils.QuadraticCost(Q=Q.copy(), R=R.copy(), Qf=Qf.copy())
    ref_pol = refmod.ilqr.iLQR(dt, ref_model, ref_cost, planning_horizon=T)
    ref_pol.set_target(z_target.copy())
    x0 = 0.02 * np.ones(ref_model.state_dim)
    x_ref, u_ref, K_ref = ref_pol.ilqr_computation(x0.copy())

    my_pol = iLQR(dt, my_model, QuadraticCost(Q=Q, R=R, Qf=Qf),
                  planning_horizon=T)
    my_pol.set_target(z_target)
    x_my, u_my, K_my = my_pol.ilqr_computation(x0)

    np.testing.assert_allclose(np.asarray(x_my), x_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(u_my), u_ref, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(K_my), K_ref, rtol=1e-6, atol=1e-8)


def test_zoh_affine_parity(refmod):
    """Our ZOH discretization vs the reference's expm-of-stacked-block
    (utils.py:302-335) on every dictionary point."""
    from soft_robot_control_tpu.core import discretize as disc

    data = make_dict(seed=14)
    dt = 0.013
    for i in range(data["A_c"].shape[0]):
        A1, B1, d1 = refmod.utils.zoh_affine(data["A_c"][i], data["B_c"][i],
                                             data["d_c"][i], dt)
        A2, B2, d2 = disc.discretize_affine(data["A_c"][i], data["B_c"][i],
                                            data["d_c"][i], dt, method="zoh")
        np.testing.assert_allclose(np.asarray(A2), A1, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(B2), B1, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(d2), d1, rtol=1e-9, atol=1e-12)
