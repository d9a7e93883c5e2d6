"""Riccati equation solvers, fully on-device.

- `solve_riccati`: the reference's DARE fixed-point iteration
  (sofacontrol/lqr/lqr.py:6-21) lowered to `lax.while_loop` with identical
  convergence semantics (||L - L_old|| > 1e-4).
- `dare`: structure-preserving doubling algorithm (SDA) — quadratically
  convergent, jit/vmap-friendly replacement for scipy.solve_discrete_are
  (lqr/lqr.py:24-31).
- `care`: continuous ARE via the matrix sign function (Roberts' method),
  replacing the external slycot/control dependency (lqr/lqr.py:57-64).

All return gain K such that u = +K x (i.e. K = -(R + B'PB)^-1 B'PA), the
reference's sign convention.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def solve_riccati(A, B, Q, R, tol: float = 1e-4):
    """DARE fixed-point iteration with the reference's exact update and
    stopping rule (lqr/lqr.py:6-21). Returns (L, P), u = +L x."""
    n = A.shape[0]

    def gain(P):
        return -jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)

    P0 = jnp.zeros((n, n), dtype=A.dtype)
    # reference's first L is computed without the minus sign; replicate by
    # noting P0 = 0 => L = 0 either way.
    L0 = gain(P0)

    def cond(carry):
        P, L, Lold = carry
        return jnp.linalg.norm(L - Lold) > tol

    def body(carry):
        P, L, Lold = carry
        BtPB = B.T @ P @ B
        P_new = A.T @ P @ A - A.T @ P @ B @ jnp.linalg.inv(R + BtPB) @ (B.T @ P @ A) + Q
        return P_new, gain(P_new), L

    Linf = jnp.full_like(L0, jnp.inf)
    P, L, _ = jax.lax.while_loop(cond, body, (P0, L0, Linf))
    return L, P


@partial(jax.jit, static_argnames=("iters",))
def dare(A, B, Q, R, iters: int = 40):
    """DARE via the structure-preserving doubling algorithm.

    Quadratic convergence; `iters`=40 is far past machine precision for any
    stabilizable system. Returns (K, P), u = +K x (lqr/lqr.py:24-31 sign).
    """
    n = A.shape[0]
    G = B @ jnp.linalg.solve(R, B.T)
    I = jnp.eye(n, dtype=A.dtype)

    def body(i, carry):
        Ak, Gk, Hk = carry
        W = I + Gk @ Hk
        WinvA = jnp.linalg.solve(W, Ak)
        A1 = Ak @ WinvA
        G1 = Gk + Ak @ jnp.linalg.solve(W, Gk @ Ak.T)
        H1 = Hk + Ak.T @ Hk @ WinvA
        return A1, G1, H1

    _, _, P = jax.lax.fori_loop(0, iters, body, (A, G, Q))
    K = -jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
    return K, P


@partial(jax.jit, static_argnames=("iters",))
def care(A, B, Q, R, iters: int = 60):
    """CARE via the matrix sign function of the Hamiltonian (Roberts).

    H = [[A, -B R^-1 B'], [-Q, -A']]; Newton iteration with determinant
    scaling Z <- (c Z + (c Z)^-1)/2. P is recovered from sign(H) + I by
    least squares. Returns (K, P) with u = +K x, so K = -R^-1 B' P —
    matching the negated control.lqr gain used by CLQR (lqr/lqr.py:57-64,
    tpwl/controllers.py:436 applies u = u_bar + K (x - x_bar)).
    """
    n = A.shape[0]
    Rinv_Bt = jnp.linalg.solve(R, B.T)
    H = jnp.block([[A, -B @ Rinv_Bt], [-Q, -A.T]])

    def body(i, Z):
        Zinv = jnp.linalg.inv(Z)
        # determinant scaling for fast convergence
        _, logdet = jnp.linalg.slogdet(Z)
        c = jnp.exp(-logdet / (2 * n))
        return 0.5 * (c * Z + Zinv / c)

    S = jax.lax.fori_loop(0, iters, body, H)
    # stable invariant subspace: (S + I) [X1; X2] = 0 => solve LS for P with
    # X1 = I: [[S11 + I], [S21]] + [[S12], [S22 + I]] P = 0
    I = jnp.eye(n, dtype=A.dtype)
    M = jnp.concatenate((S[:n, n:], S[n:, n:] + I), axis=0)
    rhs = -jnp.concatenate((S[:n, :n] + I, S[n:, :n]), axis=0)
    P = jnp.linalg.lstsq(M, rhs)[0]
    P = 0.5 * (P + P.T)
    K = -Rinv_Bt @ P
    return K, P


def dlqr_gain(model, A_c, B_c, Q, R, dt):
    """Infinite-horizon discrete LQR for a continuous linearization:
    discretize with the model's method then solve the DARE
    (lqr/lqr.py:34-54)."""
    n = A_c.shape[0]
    A_d, B_d, _ = model.discretize_dynamics(A_c, B_c, jnp.zeros(n, dtype=A_c.dtype), dt)
    K, _ = solve_riccati(A_d, B_d, Q, R)
    return K


def clqr_gain(A_c, B_c, Q, R):
    """Infinite-horizon continuous LQR gain (lqr/lqr.py:57-64)."""
    K, _ = care(A_c, B_c, Q, R)
    return K
