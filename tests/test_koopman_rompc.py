"""Koopman + ROMPC baseline families.

- Koopman grlex lifting table vs the sympy ordering the reference uses
- KoopmanModel loads the reference's shipped koopman_model.mat and its
  lifted dynamics are self-consistent
- native EDMD recovers an exactly-Koopman synthetic system
- LinearMPCService solves an LTI tracking problem (oracle: KKT optimality
  through the shared QP solver was already verified; here: tracking works)
- ROMPC closed loop on the chain surrogate
- KoopmanMPC closed loop on a synthetic measurement stream
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.core.types import QuadraticCost, Target
from soft_robot_control_tpu.control.koopman import KoopmanMPC
from soft_robot_control_tpu.control.linear_mpc import LinearMPCService, run_linear_mpc
from soft_robot_control_tpu.control.rompc import ROMPC
from soft_robot_control_tpu.models.koopman import (KoopmanModel, KoopmanData,
                                                   koopman_exponents, train_edmd)
from soft_robot_control_tpu.models.linear import LinearROM
from soft_robot_control_tpu.ops.monomials import eval_monomials
from soft_robot_control_tpu.sim.closed_loop import run_closed_loop

from helpers import chain_pipeline

KOOPMAN_MAT = "/root/reference/examples/diamond/koopman_model.mat"


@pytest.mark.parametrize("dim,order", [(3, 2), (4, 2), (2, 3)])
def test_koopman_grlex_ordering_matches_sympy(dim, order):
    import sympy as sp
    from sympy.polys.monomials import itermonomials
    from sympy.polys.orderings import monomial_key

    zeta = sp.Matrix(sp.symbols("zeta1:{}".format(dim + 1)))
    polys = sorted(itermonomials(list(zeta), order),
                   key=monomial_key("grlex", list(reversed(zeta))))
    polys.append(polys[0])
    polys = polys[1:]
    ref = []
    for p in polys:
        d = p.as_powers_dict()
        ref.append(tuple(int(d.get(s, 0)) for s in zeta))
    ours = [tuple(int(v) for v in row) for row in koopman_exponents(dim, order)]
    assert ours == ref


@pytest.fixture(scope="module")
def koopman_model():
    from scipy.io import loadmat

    d = loadmat(KOOPMAN_MAT)["py_data"][0, 0]
    return KoopmanModel(d["model"], d["params"])


def test_koopman_model_loads_reference_artifact(koopman_model):
    km = koopman_model
    assert km.n == 3 and km.m == 4 and km.N == 66 and km.state_dim == 10
    assert km.delays == 1 and km.obs_degree == 2
    # lifted vector dimension matches the trained system
    zeta = np.zeros(10)
    phi = np.asarray(km.lift_data(*zeta))
    assert phi.shape == (66,)
    # last observable is the constant 1 (grlex + constant-at-end)
    assert phi[-1] == 1.0
    # C recovers zeta (first n rows select)
    rng = np.random.default_rng(0)
    zeta = rng.normal(size=10) * 0.1
    phi = np.asarray(km.lift_data(*zeta))
    y = km.C @ phi
    # C maps lifted state to the n=3 output = first 3 zeta components
    np.testing.assert_allclose(y, zeta[:3], atol=1e-10)


def test_koopman_delay_buffer(koopman_model):
    km = koopman_model
    data = KoopmanData(km.scale, km.delays)
    rng = np.random.default_rng(1)
    ys = rng.normal(size=(4, 3))
    us = rng.normal(size=(4, 4))
    for y, u in zip(ys, us):
        data.add_measurement(y, u)
    zeta = data.get_zeta()
    assert zeta.shape == (10,)
    sc = data.scaling
    np.testing.assert_allclose(zeta[:3], np.ravel(sc.scale_down(y=ys[-1])), atol=1e-12)
    np.testing.assert_allclose(zeta[3:6], np.ravel(sc.scale_down(y=ys[-2])), atol=1e-12)
    np.testing.assert_allclose(zeta[6:], np.ravel(sc.scale_down(u=us[-2])), atol=1e-12)


def test_edmd_recovers_exact_koopman_system():
    """A system that IS linear in the lifted space must be recovered
    exactly by least squares."""
    rng = np.random.default_rng(2)
    nz, m, deg = 2, 1, 2
    exps = koopman_exponents(nz, deg)
    n_lift = len(exps)
    A_true = rng.normal(size=(n_lift, n_lift)) * 0.2
    B_true = rng.normal(size=(n_lift, m)) * 0.2
    # generate lifted-consistent data: zeta+ = first nz rows of A phi + B u
    T = 300
    zeta = np.zeros((T, nz))
    u = rng.normal(size=(T, m))
    zeta[0] = rng.normal(size=nz) * 0.1
    for t in range(T - 1):
        phi = np.asarray(eval_monomials(jnp.asarray(zeta[t]), exps))
        zeta[t + 1] = (A_true @ phi + B_true @ u[t])[:nz]
    A, B, C = train_edmd(zeta, u, degree=deg)
    # one-step prediction error in the observable space must be tiny
    # (only the first nz rows of A are identifiable from this data)
    errs = []
    for t in range(T - 1):
        phi = np.asarray(eval_monomials(jnp.asarray(zeta[t]), exps))
        pred = (A @ phi + B @ u[t])[:nz]
        errs.append(np.linalg.norm(pred - zeta[t + 1]))
    assert np.max(errs) < 1e-8, np.max(errs)


@pytest.fixture(scope="module")
def pipeline():
    return chain_pipeline()


def test_linear_mpc_service_tracks_lti(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    lin = LinearROM({"A_c": np.asarray(model.A_c[0]),
                     "B_c": np.asarray(model.B_c[0]),
                     "d_c": np.asarray(model.d_c[0]),
                     "rom_info": rom.get_info()}, dt, Cf=Cf, Hf=Hf)
    z0 = float(np.asarray(lin.z_ref)[0])
    target = Target(t=np.arange(0, 10, dt),
                    z=(z0 + 0.05 * np.ones((500, 1))))
    cost = QuadraticCost(Q=np.array([[100.0]]), R=1e-3 * np.eye(4))
    x, u, z, t = run_linear_mpc(lin, 20, dt, cost, np.zeros(lin.state_dim),
                                Target(t=target.t,
                                       z=np.asarray(target.z) - z0))
    # the plan's terminal output approaches the (shifted) setpoint
    assert abs(z[-1, 0] - 0.05) < 0.02, z[-5:, 0]


@pytest.mark.slow
def test_rompc_closed_loop(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    lin = LinearROM({"A_c": np.asarray(model.A_c[0]),
                     "B_c": np.asarray(model.B_c[0]),
                     "d_c": np.asarray(model.d_c[0]),
                     "rom_info": rom.get_info()}, dt, Cf=Cf, Hf=Hf)
    nx, ny = lin.state_dim, Cf.shape[0]
    z0 = float(X[0] @ Hf[0])
    T_target = np.arange(0, 10, dt)
    z_target_shift = 0.03 * np.ones((len(T_target), 1))
    target = Target(t=T_target, z=z_target_shift)

    # terminal cost + horizon spanning the slow dynamics — a short horizon
    # with free terminal velocity rings (this exercises the Qzf path)
    svc = LinearMPCService(lin, 20, dt,
                           QuadraticCost(Q=np.array([[200.0]]),
                                         R=1e-2 * np.eye(4),
                                         Qf=np.array([[2000.0]])),
                           target)
    H = np.asarray(lin.H)
    ctrl = ROMPC(lin, QuadraticCost(Q=H.T @ np.array([[200.0]]) @ H,
                                    R=1e-2 * np.eye(4)),
                 QuadraticCost(Q=np.eye(nx), R=np.eye(ny)),
                 dt, N_replan=4, delay=0.2, wait=True, solver_service=svc)

    class TipOut:
        def evaluate(self, x):
            return jnp.asarray(Hf) @ x

    class TipMeas:
        def evaluate(self, x, key=None):
            return jnp.asarray(Cf) @ x

    sim = run_closed_loop(plant, ctrl, sim_duration=6.0, dt=dt,
                          measurement_model=TipMeas(), output_model=TipOut())
    z_sim = sim["z"][:, 0]
    # settles near the setpoint (model error of single linearization allowed)
    final = np.mean(z_sim[-60:]) - z0
    assert abs(final - 0.03) < 0.005, final
    assert np.std(z_sim[-60:]) < 0.005


def test_koopman_offline_data_roundtrip(koopman_model, tmp_path):
    """KoopmanOfflineData bulk zeta computation (koopman_utils.py:50-84)
    agrees with the online delay buffer."""
    from soft_robot_control_tpu.models.koopman import KoopmanOfflineData
    from soft_robot_control_tpu.utils.io import save_data

    km = koopman_model
    rng = np.random.default_rng(4)
    T = 20
    data = {"t": 0.05 * np.arange(T), "z": rng.normal(size=(T, 3)),
            "u": rng.normal(size=(T, 4))}
    path = str(tmp_path / "run_sim.pkl")
    save_data(path, data)

    off = KoopmanOfflineData(km.scale, km.delays)
    off.load_offline_data(path)
    off.add_zeta_offline()
    assert off.zeta.shape == (T - km.delays, km.state_dim)

    # online buffer gives the same zeta at the final step
    online = KoopmanData(km.scale, km.delays)
    for y, u in zip(data["z"], data["u"]):
        online.add_measurement(y, u)
    np.testing.assert_allclose(off.zeta[-1], online.get_zeta(), atol=1e-12)


def test_linear_mpc_on_reference_koopman_artifact(koopman_model):
    """Plumbing at real scale: the 66-dim lifted LTI model from the shipped
    koopman_model.mat drives a full linear-MPC solve (the run_koopman
    configuration, diamond_koopman.py:90-145), and the plan's lifted state
    respects the trained dynamics."""
    km = koopman_model
    dt = km.Ts
    N = 10
    # setpoint in scaled output coordinates: small offset from current
    target = Target(t=np.arange(0, 5, dt),
                    z=np.full((int(5 / dt), km.n), 0.1))
    svc = LinearMPCService(km, N, dt,
                           QuadraticCost(Q=10.0 * np.eye(km.n),
                                         R=1e-2 * np.eye(km.m)),
                           target, max_iter=2000)
    # initial lifted state: the lift of a zero measurement history
    zeta0 = np.zeros(km.state_dim)
    x0 = np.asarray(km.W) @ np.asarray(km.lift_data(*zeta0))
    svc.send_request(0.0, x0, wait=True)
    t, u, x, _ = svc.get_solution()
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(x))
    # plan satisfies the trained lifted dynamics
    for k in range(N):
        np.testing.assert_allclose(
            x[k + 1], km.A_d @ x[k] + km.B_d @ u[k], atol=1e-5)
    # output moves toward the setpoint over the horizon
    y0 = km.C @ x[0]
    yN = km.C @ x[-1]
    assert np.linalg.norm(yN - 0.1) < np.linalg.norm(y0 - 0.1)


def test_linear_rom_prefers_discrete_family(pipeline):
    """tpwl_to_linear_rom carries the dictionary's discrete family and
    LinearROM uses it verbatim at matching dt: at tet scale the ZOH of the
    stiff continuous Galerkin point is unstable (spectral radius > 1) while
    the projected implicit step map is stable."""
    plant, rom, model, Hf, Cf, X, _ = pipeline
    from soft_robot_control_tpu.models.linear import tpwl_to_linear_rom

    dt = 0.02
    Ad0 = np.asarray(model.A_c[0]) * 0.0 + 0.5 * np.eye(model.A_c.shape[1])
    data = {"A_c": np.asarray(model.A_c), "B_c": np.asarray(model.B_c),
            "d_c": np.asarray(model.d_c), "rom_info": rom.get_info(),
            "A_d": Ad0[None], "B_d": np.asarray(model.B_c)[:1] * dt,
            "d_d": np.asarray(model.d_c)[:1] * dt, "dt": dt}
    out = tpwl_to_linear_rom(data)
    assert "A_d" in out and out["dt"] == dt
    lin = LinearROM(out, dt, Cf=Cf, Hf=Hf)
    np.testing.assert_allclose(np.asarray(lin.A_d), Ad0, atol=0)
    # dt mismatch falls back to ZOH of the continuous point
    lin2 = LinearROM(out, dt / 2, Cf=Cf, Hf=Hf)
    assert not np.allclose(np.asarray(lin2.A_d), Ad0)
