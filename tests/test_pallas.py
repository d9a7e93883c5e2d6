"""Pallas kernel tests (interpret mode on CPU): the in-VMEM fixed-iteration
ADMM must match the XLA ADMM, and the fused nearest-point gather must match
the TPWLModel gather."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import admm_fixed
from soft_robot_control_tpu.ops.pallas_admm import admm_fixed_pallas
from soft_robot_control_tpu.ops.pallas_tpwl import tpwl_gather_pallas

from helpers import chain_pipeline


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_admm_matches_xla(seed):
    rng = np.random.default_rng(seed)
    n, m = 30, 40
    Ph = rng.normal(size=(n, n))
    P = Ph @ Ph.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    xf = rng.normal(size=n) * 0.2
    l = A @ xf - rng.uniform(0.1, 1, m)
    u = A @ xf + rng.uniform(0.1, 1, m)
    l[:5] = u[:5]
    l[5:8] = -np.inf
    rho = 0.1 * np.ones(m)
    rho[:5] *= 1000
    args = [jnp.asarray(v) for v in (P, q, A, l, u)]
    w0, y0 = jnp.zeros(n), jnp.zeros(m)
    rho = jnp.asarray(rho)
    w1, y1 = admm_fixed(*args, w0, y0, rho, 200)
    w2, y2 = admm_fixed_pallas(*args, w0, y0, rho, 200, interpret=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_admm_batched_matches_vmapped(seed):
    """The grid-batched kernel must match vmap(admm_fixed_kinv) per QP."""
    from soft_robot_control_tpu.control.batch_mpc import (admm_fixed_kinv,
                                                          make_kinv)
    from soft_robot_control_tpu.ops.pallas_admm import admm_batched_pallas

    rng = np.random.default_rng(10 + seed)
    B, n, m = 4, 24, 32
    Ph = rng.normal(size=(B, n, n))
    P = jnp.asarray(Ph @ Ph.transpose(0, 2, 1) + 0.1 * np.eye(n))
    q = jnp.asarray(rng.normal(size=(B, n)))
    A = jnp.asarray(rng.normal(size=(B, m, n)))
    xf = rng.normal(size=(B, n)) * 0.2
    mid = np.einsum("bmn,bn->bm", np.asarray(A), xf)
    l = jnp.asarray(mid - rng.uniform(0.1, 1, (B, m)))
    u = jnp.asarray(mid + rng.uniform(0.1, 1, (B, m)))
    l = l.at[:, :5].set(u[:, :5])  # equality rows
    rho = 0.1 * np.ones(m)
    rho[:5] *= 1000
    rho = jnp.asarray(rho)
    w0 = jnp.zeros((B, n))
    y0 = jnp.zeros((B, m))

    Kinv = jax.vmap(lambda P_, A_: make_kinv(P_, A_, rho))(P, A)
    w1, y1 = jax.vmap(
        lambda K_, q_, A_, l_, u_, w_, y_: admm_fixed_kinv(
            K_, q_, A_, l_, u_, w_, y_, rho, 200))(Kinv, q, A, l, u, w0, y0)
    w2, y2 = admm_batched_pallas(Kinv, A, q, l, u, rho, w0, y0, 200,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-10)


def test_pallas_tpwl_gather_matches_model():
    plant, rom, model, Hf, Cf, X, _ = chain_pipeline()
    model = model.pre_discretize(0.02)
    rng = np.random.default_rng(3)
    B = 16
    xb = jnp.asarray(rng.normal(size=(B, model.state_dim)) * 0.3)
    A_p, B_p, d_p = tpwl_gather_pallas(
        xb, model.q, model.v, model.A_d, model.B_d, model.d_d,
        float(model.dist_w_q), float(model.dist_w_v), interpret=True)

    ref = jax.vmap(lambda x: model.get_jacobians(x, dt=0.02))(xb)
    np.testing.assert_allclose(np.asarray(A_p), np.asarray(ref[0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(B_p), np.asarray(ref[1]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(ref[2]), atol=1e-10)


@pytest.mark.parametrize("B,n,m", [(32, 12, 16), (64, 20, 40)])
def test_pallas_admm_chunked_matches_grid(B, n, m):
    """The chunk-batched small-QP kernel must match the per-QP grid path
    (auto-dispatch picks chunking for these sizes; force both here)."""
    from soft_robot_control_tpu.control.batch_mpc import make_kinv
    from soft_robot_control_tpu.ops.pallas_admm import (
        _admm_batched_pallas_grid, _pick_chunk, admm_batched_pallas)

    assert _pick_chunk(B, n, m, 8) >= 8  # chunked path engages at f64
    rng = np.random.default_rng(B + n)
    Ph = rng.normal(size=(B, n, n))
    P = jnp.asarray(Ph @ Ph.transpose(0, 2, 1) + 0.1 * np.eye(n))
    q = jnp.asarray(rng.normal(size=(B, n)))
    A = jnp.asarray(rng.normal(size=(B, m, n)))
    mid = np.einsum("bmn,bn->bm", np.asarray(A), rng.normal(size=(B, n)) * 0.2)
    l = jnp.asarray(mid - rng.uniform(0.1, 1, (B, m)))
    u = jnp.asarray(mid + rng.uniform(0.1, 1, (B, m)))
    rho = jnp.asarray(0.1 * np.ones(m))
    w0 = jnp.zeros((B, n))
    y0 = jnp.zeros((B, m))
    Kinv = jax.vmap(lambda P_, A_: make_kinv(P_, A_, rho))(P, A)
    w1, y1 = admm_batched_pallas(Kinv, A, q, l, u, rho, w0, y0, 150,
                                 interpret=True)
    w2, y2 = _admm_batched_pallas_grid(Kinv, A, q, l, u, rho, w0, y0, 150,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-10)
