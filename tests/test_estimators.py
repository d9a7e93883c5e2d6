"""Estimator tests: EKF convergence on self-consistent TPWL data (with and
without measurement noise), PSD covariance, Luenberger observer convergence,
SSM manifold observer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.estimators.ekf import DiscreteEKFObserver, EKFState
from soft_robot_control_tpu.estimators.luenberger import (DiscreteLuenbergerObserver,
                                                          luenberger_gain)
from soft_robot_control_tpu.models.linear import LinearROM

from helpers import chain_pipeline


@pytest.fixture(scope="module")
def pipeline():
    return chain_pipeline()


def test_ekf_converges_on_model_consistent_data(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    nx, ny = model.state_dim, Cf.shape[0]
    rng = np.random.default_rng(0)

    x = np.asarray(rom.project_x(jnp.asarray(X[0])))
    obs = DiscreteEKFObserver(model, W=1e-2 * np.eye(nx), V=1e-8 * np.eye(ny))
    obs.state = EKFState(jnp.asarray(x + 0.3 * rng.normal(size=nx)),
                         obs.state.Sigma)
    err0 = np.linalg.norm(np.asarray(obs.x) - x)
    C = np.asarray(model.C)
    yref = np.asarray(model.y_ref)
    for i in range(100):
        u = np.abs(rng.normal(size=4))
        A, B, d = [np.asarray(v) for v in model.get_jacobians(jnp.asarray(x), dt=dt)]
        x = A @ x + B @ u + d
        obs.update(u, C @ x + yref, dt)
    err = np.linalg.norm(np.asarray(obs.x) - x)
    assert err < 0.02 * err0, f"EKF error {err} from {err0}"
    # covariance stays symmetric PSD
    S = np.asarray(obs.state.Sigma)
    np.testing.assert_allclose(S, S.T, atol=1e-8)
    assert np.linalg.eigvalsh(S).min() > -1e-10


def test_ekf_with_noise_tracks(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    model = model.pre_discretize(dt)
    nx, ny = model.state_dim, Cf.shape[0]
    rng = np.random.default_rng(1)
    x = np.asarray(rom.project_x(jnp.asarray(X[0])))
    obs = DiscreteEKFObserver(model, W=1e-4 * np.eye(nx), V=1e-4 * np.eye(ny))
    C, yref = np.asarray(model.C), np.asarray(model.y_ref)
    errs = []
    for i in range(200):
        u = np.abs(rng.normal(size=4))
        A, B, d = [np.asarray(v) for v in model.get_jacobians(jnp.asarray(x), dt=dt)]
        x = A @ x + B @ u + d
        y = C @ x + yref + 1e-2 * rng.normal(size=ny)
        obs.update(u, y, dt)
        errs.append(np.linalg.norm(np.asarray(obs.x) - x))
    assert np.mean(errs[-50:]) < 0.2, np.mean(errs[-50:])


def test_luenberger_observer_converges(pipeline):
    plant, rom, model, Hf, Cf, X, _ = pipeline
    dt = 0.02
    # linear ROM from the first TPWL point (the ROMPC construction,
    # rompc_utils.py:131-147)
    lin = LinearROM({"A_c": np.asarray(model.A_c[0]),
                     "B_c": np.asarray(model.B_c[0]),
                     "d_c": np.asarray(model.d_c[0]),
                     "rom_info": rom.get_info()}, dt, Cf=Cf, Hf=Hf)
    nx = lin.state_dim
    ny = Cf.shape[0]
    obs = DiscreteLuenbergerObserver(lin, Q=np.eye(nx), R=np.eye(ny))
    rng = np.random.default_rng(2)
    x = rng.normal(size=nx) * 0.1
    obs.x = jnp.zeros(nx)
    A, B, d = np.asarray(lin.A_d), np.asarray(lin.B_d), np.asarray(lin.d_d)
    C, yref = np.asarray(lin.C), np.asarray(lin.y_ref)
    # predictor form: feed y_k = C x_k, then both observer and truth step,
    # so the error obeys e+ = (A - L C) e
    for i in range(300):
        u = np.abs(rng.normal(size=4))
        obs.update(u, C @ x + yref)
        x = A @ x + B @ u + d
    assert np.linalg.norm(np.asarray(obs.x) - x) < 1e-3
