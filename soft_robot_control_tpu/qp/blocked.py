"""Blocked dense linear algebra for TPU: Cholesky, triangular inverse, and
explicit ADMM x-step inverses built from MXU matmuls.

XLA's native `cholesky` / `solve_triangular` sequentialize row-by-row on
TPU (measured: ~59 ms for a 1024x272 batched Cholesky, ~43 ms for the
matching triangular solve, vs ~0.03 ms of actual MXU work); recursive 2x2
blocking keeps the sequential substitution confined to small diagonal
leaves and turns everything else into HIGHEST-precision matmuls. These
back the batched MPC kernels (control/batch_mpc.py) and the `x_solver=
'kinv'` mode of the dense ADMM (qp/admm.py) — replacing the per-iteration
triangular solves that dominate single-QP latency on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def tri_inv_blocked(L, leaf: int = 64):
    """Lower-triangular inverse by recursive 2x2 blocking:

        [[A, 0], [B, C]]^-1 = [[A^-1, 0], [-C^-1 B A^-1, C^-1]]

    Leaves fall back to solve_triangular; everything above is HIGHEST-
    precision matmuls. On TPU the batched triangular solve with n RHS is
    the dominant cost of make_kinv (sequential substitution, ~43 ms for
    1024x272 vs ~0.03 ms for the batched Cholesky itself); blocking turns
    15/16 of that work into MXU matmuls (~8x faster end to end). Works on
    (..., n, n) with any leading batch dims."""
    n = L.shape[-1]
    if n <= leaf:
        I = jnp.eye(n, dtype=L.dtype)
        solve = lambda L_: jax.scipy.linalg.solve_triangular(L_, I,
                                                             lower=True)
        for _ in range(L.ndim - 2):
            solve = jax.vmap(solve)
        return solve(L)
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    k = min(n - 8, max(8, ((n + 1) // 2 + 7) // 8 * 8))  # lane-aligned split
    Ai = tri_inv_blocked(L[..., :k, :k], leaf)
    Ci = tri_inv_blocked(L[..., k:, k:], leaf)
    low = -mm(Ci, mm(L[..., k:, :k], Ai))
    top = jnp.concatenate(
        [Ai, jnp.zeros(L.shape[:-2] + (k, n - k), L.dtype)], axis=-1)
    bot = jnp.concatenate([low, Ci], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def chol_blocked(K, leaf: int = 64):
    """Cholesky by recursive 2x2 blocking:

        K = [[K11, K21'], [K21, K22]],  L11 = chol(K11),
        L21 = K21 L11^-T (via tri_inv_blocked),  L22 = chol(K22 - L21 L21')

    XLA's batched cholesky on TPU sequentializes over rows (~59 ms for
    1024x272 f32 — the single most expensive op in K^-1 preparation);
    blocking keeps the sequential part to the small diagonal leaves and
    does the rest as HIGHEST-precision MXU matmuls. Exact in exact
    arithmetic; the panel solve through the explicit L11^-1 is safe here
    because make_kinv Jacobi-scales K first and Newton-refines after.
    Works on (..., n, n)."""
    n = K.shape[-1]
    if n <= leaf:
        return jnp.linalg.cholesky(K)
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    k = min(n - 8, max(8, ((n + 1) // 2 + 7) // 8 * 8))
    L11 = chol_blocked(K[..., :k, :k], leaf)
    L21 = mm(K[..., k:, :k], jnp.swapaxes(tri_inv_blocked(L11, leaf), -1, -2))
    S22 = K[..., k:, k:] - mm(L21, jnp.swapaxes(L21, -1, -2))
    L22 = chol_blocked(S22, leaf)
    top = jnp.concatenate(
        [L11, jnp.zeros(K.shape[:-2] + (k, n - k), K.dtype)], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def make_kinv(P, A, rho_vec, sigma=1e-6):
    """Explicit K^-1 for the x-step, prepared the stable way: Jacobi-scale
    K, blocked Cholesky (chol_blocked), blocked triangular inverse
    (tri_inv_blocked), one full-precision Newton step, then K^-1 = M1' M1.
    Vmaps into batched matmuls (MXU), unlike per-iteration triangular
    solves which are sequential and dominate batched ADMM."""
    n = P.shape[0]
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    K = P + sigma * jnp.eye(n, dtype=P.dtype) + mm(A.T * rho_vec[None, :], A)
    d = jax.lax.rsqrt(jnp.diagonal(K))
    Ks = K * d[:, None] * d[None, :]
    Ls = chol_blocked(Ks)
    I = jnp.eye(n, dtype=P.dtype)
    Linv = tri_inv_blocked(Ls)
    Linv = mm(Linv, 2.0 * I - mm(Ls, Linv))
    M1 = Linv * d[None, :]
    return mm(M1.T, M1)

