"""Structure-exploiting KKT solve for the LOCP: block-tridiagonal Cholesky.

The ADMM x-step solves K w = rhs with K = P + sigma I + A' diag(rho) A.
For the LOCP (no trust region) with variables ordered per-stage
[x_0, u_0, x_1, u_1, ..., u_{N-1}, x_N], K is block-tridiagonal with stage
blocks of size (n_x + n_u): the QP cost is stage-separable and the dynamics
rows couple only adjacent stages. A dense Cholesky costs O((N n)^3); the
block-tridiagonal factorization costs O(N n^3) — the classic Riccati-style
sweep, here as a `lax.scan`, which is what makes long-horizon (N ~ 200)
open-loop trajectory optimization practical on device.

This module provides:
- `stage_permutation(N, nx, nu)`: the index permutation from the LOCPSpec
  layout ([x_0..x_N | u_0..u_{N-1}]) to interleaved stage order;
- `btd_factor` / `btd_solve`: blocked Cholesky (L D L' with dense diagonal
  blocks) of a block-tridiagonal SPD matrix given as stacked diagonal and
  off-diagonal blocks, and the corresponding forward/backward sweeps;
- `admm_fixed_btd`: the fixed-iteration ADMM using the structured solve
  (trust region off), a drop-in for long horizons.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def stage_permutation(N: int, nx: int, nu: int) -> np.ndarray:
    """perm[i] = index in the LOCPSpec flat layout of interleaved entry i.

    Interleaved order: [x_0 (nx), u_0 (nu), x_1, u_1, ..., u_{N-1}, x_N],
    padded with nu dummy entries? No — the final stage block is x_N alone,
    handled as a smaller last block by padding u_N with identity rows is
    avoided: we use uniform blocks of size (nx+nu) for stages 0..N-1 and a
    final block of size nx. For scan-uniformity the caller pads the final
    block to (nx+nu) with identity."""
    off_u = (N + 1) * nx
    idx = []
    for k in range(N):
        idx.extend(range(k * nx, (k + 1) * nx))
        idx.extend(range(off_u + k * nu, off_u + (k + 1) * nu))
    idx.extend(range(N * nx, (N + 1) * nx))
    return np.asarray(idx, dtype=np.int64)


def extract_btd_blocks(Kp: jnp.ndarray, N: int, nb: int, nx: int):
    """Given the permuted K (interleaved stage order), return
    (diag (N+1, nb, nb), lower (N, nb, nb)) stacked blocks, where the final
    stage block (size nx) is embedded in an identity-padded (nb, nb) block
    and the final off-diagonal is zero-padded on the padded rows."""
    n_total = N * nb + nx
    pad = nb - nx
    dtype = Kp.dtype
    diag = []
    lower = []
    for k in range(N):
        diag.append(Kp[k * nb:(k + 1) * nb, k * nb:(k + 1) * nb])
        if k < N - 1:
            lower.append(Kp[(k + 1) * nb:(k + 2) * nb, k * nb:(k + 1) * nb])
    # final block: x_N only, pad to nb with identity
    last = jnp.eye(nb, dtype=dtype)
    last = last.at[:nx, :nx].set(Kp[N * nb:, N * nb:])
    diag.append(last)
    off_last = jnp.zeros((nb, nb), dtype=dtype)
    off_last = off_last.at[:nx, :].set(Kp[N * nb:, (N - 1) * nb:N * nb])
    lower.append(off_last)
    return jnp.stack(diag), jnp.stack(lower)


@jax.jit
def btd_factor(diag: jnp.ndarray, lower: jnp.ndarray):
    """Block-tridiagonal Cholesky: returns (L_diag (M,nb,nb) lower-tri
    Cholesky factors of the Schur-complemented diagonal blocks,
    L_off (M-1,nb,nb) with L_off[k] = lower[k] @ inv(L_diag[k])')."""
    def step(carry, inp):
        Lprev_inv_off = carry  # L_off[k-1] (already computed) or zeros
        D_k, Low_k = inp
        S = D_k - Lprev_inv_off @ Lprev_inv_off.T
        L_k = jnp.linalg.cholesky(S)
        # next off-block: lower[k] @ inv(L_k)^T  => solve L_k X^T = lower^T
        X = jax.scipy.linalg.solve_triangular(L_k, Low_k.T, lower=True).T
        return X, (L_k, X)

    M, nb, _ = diag.shape
    zeros = jnp.zeros((nb, nb), dtype=diag.dtype)
    lower_ext = jnp.concatenate([lower, zeros[None]], axis=0)  # (M, nb, nb)
    _, (L_diag, L_off_ext) = jax.lax.scan(step, zeros, (diag, lower_ext))
    return L_diag, L_off_ext[:-1]


@jax.jit
def btd_solve(L_diag: jnp.ndarray, L_off: jnp.ndarray, rhs: jnp.ndarray):
    """Solve (L D L')-factored block-tridiagonal system; rhs (M, nb)."""
    M, nb, _ = L_diag.shape
    zeros_v = jnp.zeros(nb, dtype=rhs.dtype)
    L_off_ext = jnp.concatenate([jnp.zeros((1, nb, nb), L_off.dtype), L_off],
                                axis=0)

    # forward: L y = rhs
    def fwd(carry, inp):
        y_prev = carry
        L_k, Loff_km1, r_k = inp
        y_k = jax.scipy.linalg.solve_triangular(
            L_k, r_k - Loff_km1 @ y_prev, lower=True)
        return y_k, y_k

    _, ys = jax.lax.scan(fwd, zeros_v, (L_diag, L_off_ext, rhs))

    # backward: L' w = y
    def bwd(carry, inp):
        w_next = carry
        L_k, Loff_k, y_k = inp
        w_k = jax.scipy.linalg.solve_triangular(
            L_k.T, y_k - Loff_k.T @ w_next, lower=False)
        return w_k, w_k

    L_off_b = jnp.concatenate([L_off, jnp.zeros((1, nb, nb), L_off.dtype)],
                              axis=0)
    _, ws = jax.lax.scan(bwd, zeros_v, (L_diag[::-1], L_off_b[::-1],
                                        ys[::-1]))
    return ws[::-1]


class StructuredKKT:
    """Pre-permuted structured solver for a LOCPSpec problem (tr off).

    method='cr' (default) solves with block cyclic reduction — log2(N)
    levels of batched block ops (qp/cyclic_reduction.py), the TPU-fast
    path. method='scan' keeps the sequential block-tridiagonal Cholesky."""

    def __init__(self, N: int, nx: int, nu: int, dtype=jnp.float64,
                 method: str = "cr"):
        if method not in ("cr", "scan"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.N, self.nx, self.nu = int(N), int(nx), int(nu)
        self.nb = nx + nu
        self.perm = jnp.asarray(stage_permutation(N, nx, nu))
        self.n_total = (N + 1) * nx + N * nu
        self.dtype = dtype

    def factor(self, K: jnp.ndarray):
        Kp = K[self.perm][:, self.perm]
        diag, lower = extract_btd_blocks(Kp, self.N, self.nb, self.nx)
        if self.method == "cr":
            from soft_robot_control_tpu.qp.cyclic_reduction import cr_factor
            return cr_factor(diag, lower)
        return btd_factor(diag, lower)

    def solve(self, factors, rhs: jnp.ndarray):
        rp = rhs[self.perm]
        pad = self.nb - self.nx
        rp_pad = jnp.concatenate([rp, jnp.zeros(pad, rhs.dtype)])
        blocks = rp_pad.reshape(self.N + 1, self.nb)
        if self.method == "cr":
            from soft_robot_control_tpu.qp.cyclic_reduction import cr_solve
            w_blocks = cr_solve(factors, blocks)
        else:
            w_blocks = btd_solve(*factors, blocks)
        w_pad = w_blocks.reshape(-1)[:self.n_total]
        # invert the permutation
        out = jnp.zeros_like(w_pad)
        return out.at[self.perm].set(w_pad)


def admm_fixed_btd(P, q, A, l, u, w0, y0, rho_vec, iters: int,
                   skkt: StructuredKKT, sigma=1e-6, alpha=1.6):
    """Fixed-iteration ADMM with the block-tridiagonal x-step (trust region
    off; same update rule as control.batch_mpc.admm_fixed)."""
    n = P.shape[0]
    K = P + sigma * jnp.eye(n, dtype=P.dtype) + (A.T * rho_vec[None, :]) @ A
    factors = skkt.factor(K)
    z0 = jnp.clip(A @ w0, l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + A.T @ (rho_vec * z - y)
        w_t = skkt.solve(factors, rhs)
        z_t = A @ w_t
        w_new = alpha * w_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho_vec, l, u)
        y_new = y + rho_vec * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w0, z0, y0))
    return w, y
