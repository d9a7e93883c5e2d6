"""Riccati / LQR parity tests against scipy oracles."""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from soft_robot_control_tpu.lqr.riccati import solve_riccati, dare, care
from soft_robot_control_tpu.lqr.tvlqr import tv_lqr_backward


def _random_system(n=6, m=2, seed=0, discrete=True):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    if discrete:
        A = 0.9 * A / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))
    else:
        A = A - (np.max(np.linalg.eigvals(A).real) + 0.5) * np.eye(n)
    B = rng.normal(size=(n, m))
    Q = np.eye(n) * rng.uniform(0.5, 2.0)
    R = np.eye(m) * rng.uniform(0.1, 1.0)
    return A, B, Q, R


def test_dare_doubling_matches_scipy():
    for seed in range(4):
        A, B, Q, R = _random_system(seed=seed)
        K, P = dare(jnp.array(A), jnp.array(B), jnp.array(Q), jnp.array(R))
        P_sp = scipy.linalg.solve_discrete_are(A, B, Q, R)
        K_sp = -np.linalg.inv(B.T @ P_sp @ B + R) @ (B.T @ P_sp @ A)
        np.testing.assert_allclose(np.asarray(P), P_sp, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(K), K_sp, rtol=1e-8, atol=1e-8)


def test_fixed_point_riccati_matches_scipy_to_its_tolerance():
    A, B, Q, R = _random_system(seed=5)
    L, P = solve_riccati(jnp.array(A), jnp.array(B), jnp.array(Q), jnp.array(R))
    P_sp = scipy.linalg.solve_discrete_are(A, B, Q, R)
    K_sp = -np.linalg.inv(B.T @ P_sp @ B + R) @ (B.T @ P_sp @ A)
    # fixed point stops at ||dL|| <= 1e-4 (reference semantics)
    np.testing.assert_allclose(np.asarray(L), K_sp, atol=1e-3)


def test_care_sign_function_matches_scipy():
    for seed in range(4):
        A, B, Q, R = _random_system(seed=10 + seed, discrete=False)
        K, P = care(jnp.array(A), jnp.array(B), jnp.array(Q), jnp.array(R))
        P_sp = scipy.linalg.solve_continuous_are(A, B, Q, R)
        np.testing.assert_allclose(np.asarray(P), P_sp, rtol=1e-7, atol=1e-7)
        K_sp = -np.linalg.solve(R, B.T @ P_sp)
        np.testing.assert_allclose(np.asarray(K), K_sp, rtol=1e-6, atol=1e-6)


def test_tv_lqr_backward_matches_numpy_recursion():
    rng = np.random.default_rng(20)
    T, n, m = 15, 5, 2
    A = rng.normal(size=(T, n, n)) * 0.3 + 0.7 * np.eye(n)
    B = rng.normal(size=(T, n, m))
    Q = np.eye(n)
    R = 0.1 * np.eye(m)

    K, P = tv_lqr_backward(jnp.array(A), jnp.array(B), jnp.array(Q), jnp.array(R))

    # numpy oracle (traj_tracking_lqr.py:30-41 semantics)
    P_o = Q
    K_list = []
    for i in reversed(range(T)):
        Ki = -np.linalg.solve(R + B[i].T @ P_o @ B[i], B[i].T @ P_o @ A[i])
        P_o = Q + Ki.T @ R @ Ki + (A[i] + B[i] @ Ki).T @ P_o @ (A[i] + B[i] @ Ki)
        K_list.append(Ki)
    K_o = np.asarray(K_list)[::-1]
    np.testing.assert_allclose(np.asarray(K), K_o, atol=1e-9)
