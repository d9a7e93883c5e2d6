"""Blocked batched linear algebra (control/batch_mpc.py): the recursive
2x2-block Cholesky and triangular inverse must match the lax/scipy
references on realistic Jacobi-scaled SPD inputs, including odd and
non-lane-aligned sizes, and make_kinv must produce a true inverse."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import (chol_blocked,
                                                      make_kinv,
                                                      tri_inv_blocked)


def _spd(rng, B, n):
    Ph = rng.normal(size=(B, n, n))
    K = Ph @ Ph.transpose(0, 2, 1) + 0.01 * np.eye(n)
    d = 1.0 / np.sqrt(np.einsum("bii->bi", K))
    return jnp.asarray(K * d[:, :, None] * d[:, None, :])


@pytest.mark.parametrize("n", [13, 50, 64, 100, 137, 272])
def test_chol_blocked_matches_lax(n):
    rng = np.random.default_rng(n)
    Ks = _spd(rng, 3, n)
    L = chol_blocked(Ks)
    res = float(jnp.max(jnp.abs(jnp.einsum("bij,bkj->bik", L, L) - Ks)))
    assert res < 1e-12
    ref = jnp.linalg.cholesky(Ks)
    rel = float(jnp.max(jnp.abs(L - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-12


@pytest.mark.parametrize("n", [13, 64, 100, 137, 272])
def test_tri_inv_blocked_matches_trisolve(n):
    rng = np.random.default_rng(100 + n)
    L = jnp.linalg.cholesky(_spd(rng, 3, n))
    out = tri_inv_blocked(L)
    I = jnp.eye(n)
    res = float(jnp.max(jnp.abs(jnp.einsum("bij,bjk->bik", out, L) - I)))
    assert res < 1e-11
    ref = jax.vmap(lambda L_: jax.scipy.linalg.solve_triangular(
        L_, I, lower=True))(L)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-12


@pytest.mark.parametrize("n,m", [(137, 91), (13, 7), (272, 252)])
def test_make_kinv_true_inverse(n, m):
    """End to end through make_kinv with the OSQP equality-rho boost."""
    rng = np.random.default_rng(7)
    Ph = rng.normal(size=(n, n))
    P = jnp.asarray(Ph @ Ph.T + 0.1 * np.eye(n))
    A = jnp.asarray(rng.normal(size=(m, n)))
    rho = jnp.asarray(np.full(m, 0.1)).at[:3].mul(1000.0)
    Ki = make_kinv(P, A, rho)
    K = P + 1e-6 * jnp.eye(n) + (A.T * rho[None, :]) @ A
    res = float(jnp.max(jnp.abs(Ki @ K - jnp.eye(n))))
    assert res < 1e-10


def test_blocked_ops_vmap():
    """The blocked ops compose with vmap (the fused-path usage)."""
    rng = np.random.default_rng(2)
    Ks = _spd(rng, 4, 100)
    L_v = jax.vmap(chol_blocked)(Ks)
    L_b = chol_blocked(Ks)
    np.testing.assert_allclose(np.asarray(L_v), np.asarray(L_b), atol=1e-13)
    Li_v = jax.vmap(tri_inv_blocked)(L_b)
    Li_b = tri_inv_blocked(L_b)
    np.testing.assert_allclose(np.asarray(Li_v), np.asarray(Li_b),
                               atol=1e-13)
