"""Block cyclic reduction for block-tridiagonal SPD KKT systems.

The scan-based block-tridiagonal Cholesky (qp/structured.py) is correct but
latency-bound on TPU: N ~ 200 *sequential* stages of small (nb x nb)
cholesky/triangular ops, each far below MXU granularity. Cyclic reduction
replaces the O(N)-deep recurrence with log2(N) levels that each eliminate
every odd-indexed block **in parallel** — per level one batched SPD block
inverse + a handful of batched (M/2, nb, nb) matmuls, exactly the shape of
work the MXU wants. Depth 8 instead of 200 at N=200.

This is the role the reference delegates to OSQP's sparse LDL on the CPU
(sofacontrol/scp/locp.py:60-63 via cvxpy) for its N=200 open-loop
trajectory optimization (scp/standalone.py:11, examples/hardware/
diamond.py:400-496) — redesigned for the TPU's execution model instead of
ported.

Convention (matching qp/structured.py): the system has M diagonal blocks
D[i] (nb, nb) and M-1 subdiagonal blocks L[i] = K[block i+1, block i], i.e.
equation i reads  L[i-1] w[i-1] + D[i] w[i] + L[i]^T w[i+1] = r[i].

Elimination of the odd blocks (i = 2j+1) gives a half-size system over the
even blocks with

  D'[j] = D[2j] - L[2j-1] Dinv[2j-1] L[2j-1]^T - L[2j]^T Dinv[2j+1] L[2j]
  L'[j] = -L[2j+1] Dinv[2j+1] L[2j]
  r'[j] = r[2j] - L[2j-1] Dinv[2j-1] r[2j-1] - L[2j]^T Dinv[2j+1] r[2j+1]

(terms at the boundaries vanish through zero-padded L). Schur complements
of an SPD matrix stay SPD, so the reduction is unconditionally well posed.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from soft_robot_control_tpu.control.batch_mpc import (chol_blocked,
                                                      tri_inv_blocked)


def spd_inv_blocked(K: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD inverse over (..., nb, nb): blocked Cholesky + blocked
    triangular inverse (MXU-friendly, unlike XLA's row-sequential batched
    variants on TPU) + one full-precision Newton refinement step."""
    L = chol_blocked(K)
    Li = tri_inv_blocked(L)
    Kinv = jnp.einsum("...ji,...jk->...ik", Li, Li)
    # Newton: X <- X (2I - K X), cleans the blocked-inverse rounding
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    KX = jnp.einsum("...ij,...jk->...ik", K, Kinv)
    return jnp.einsum("...ij,...jk->...ik", Kinv, 2.0 * eye - KX)


class CRLevel(NamedTuple):
    Dinv_odd: jnp.ndarray   # (mo, nb, nb) inverses of odd diagonal blocks
    L_even: jnp.ndarray     # (me, nb, nb) L[2j]   (zero-padded past the end)
    L_odd_m: jnp.ndarray    # (me, nb, nb) L[2j-1] (zero at j=0)
    L_odd_p: jnp.ndarray    # (mo, nb, nb) L[2j+1] (zero-padded past the end)


class CRFactors(NamedTuple):
    levels: List[CRLevel]
    root_inv: jnp.ndarray   # (nb, nb)


def _pad_blocks(X, m, nb, dtype, identity=False):
    """Pad/truncate leading axis to m blocks (identity or zero fill)."""
    cur = X.shape[0] if X is not None else 0
    if X is None:
        base = jnp.zeros((0, nb, nb), dtype)
    else:
        base = X
    if cur >= m:
        return base[:m]
    fill = (jnp.broadcast_to(jnp.eye(nb, dtype=dtype), (m - cur, nb, nb))
            if identity else jnp.zeros((m - cur, nb, nb), dtype))
    return jnp.concatenate([base, fill], axis=0)


def cr_factor(diag: jnp.ndarray, lower: jnp.ndarray) -> CRFactors:
    """Cyclic-reduction 'factorization': per-level odd-block inverses and
    coupling blocks. diag (M, nb, nb); lower (M-1, nb, nb)."""
    D, L = diag, lower
    nb = D.shape[-1]
    dtype = D.dtype
    levels: List[CRLevel] = []
    while D.shape[0] > 1:
        M = D.shape[0]
        me = (M + 1) // 2          # even blocks kept
        mo = M // 2                # odd blocks eliminated
        Dinv_odd = spd_inv_blocked(D[1::2])                     # (mo,...)
        L_even = _pad_blocks(L[0::2] if L.shape[0] else None, me, nb, dtype)
        # L[2j-1]: j=0 -> zero; j>=1 -> L[1::2][j-1]
        L_odd_m = _pad_blocks(
            jnp.concatenate([jnp.zeros((1, nb, nb), dtype), L[1::2]],
                            axis=0) if L.shape[0] else None,
            me, nb, dtype)
        L_odd_p = _pad_blocks(L[1::2] if L.shape[0] else None, mo, nb, dtype)
        lv = CRLevel(Dinv_odd, L_even, L_odd_m, L_odd_p)
        levels.append(lv)

        # Dinv aligned per even block j: left neighbor inverse Dinv[2j-1]
        DI_l = _pad_blocks(
            jnp.concatenate([jnp.zeros((1, nb, nb), dtype), Dinv_odd],
                            axis=0), me, nb, dtype)
        DI_r = _pad_blocks(Dinv_odd, me, nb, dtype)             # Dinv[2j+1]
        T_l = jnp.einsum("mij,mjk->mik", L_odd_m, DI_l)         # L[2j-1] DI
        T_r = jnp.einsum("mji,mjk->mik", L_even, DI_r)          # L[2j]^T DI
        D_new = (D[0::2]
                 - jnp.einsum("mij,mkj->mik", T_l, L_odd_m)
                 - jnp.einsum("mij,mkj->mik", T_r,
                              jnp.swapaxes(L_even, 1, 2)))
        # L'[j] = -L[2j+1] Dinv[2j+1] L[2j],  j = 0..me-2
        if me > 1:
            LOp = _pad_blocks(L_odd_p, me - 1, nb, dtype)
            LEv = L_even[:me - 1]
            DIr = _pad_blocks(Dinv_odd, me - 1, nb, dtype)
            L_new = -jnp.einsum("mij,mjk,mkl->mil", LOp, DIr, LEv)
        else:
            L_new = jnp.zeros((0, nb, nb), dtype)
        D, L = D_new, L_new
    root_inv = spd_inv_blocked(D[0])
    return CRFactors(levels, root_inv)


def cr_solve(factors: CRFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the block-tridiagonal system given cr_factor output.
    rhs (M, nb) -> solution (M, nb)."""
    nb = rhs.shape[-1]
    dtype = rhs.dtype
    # down-sweep: fold odd rhs into even rhs per level
    rs = [rhs]
    for lv in factors.levels:
        r = rs[-1]
        M = r.shape[0]
        me = (M + 1) // 2
        r_odd = r[1::2]
        dr_odd = jnp.einsum("mij,mj->mi", lv.Dinv_odd, r_odd)   # (mo, nb)
        pad = lambda X, m: (jnp.concatenate(
            [X, jnp.zeros((m - X.shape[0], nb), dtype)], axis=0)
            if X.shape[0] < m else X[:m])
        dr_l = pad(jnp.concatenate([jnp.zeros((1, nb), dtype), dr_odd],
                                   axis=0), me)                  # j-1 aligned
        dr_r = pad(dr_odd, me)                                   # j aligned
        r_new = (r[0::2]
                 - jnp.einsum("mij,mj->mi", lv.L_odd_m, dr_l)
                 - jnp.einsum("mji,mj->mi", lv.L_even, dr_r))
        rs.append(r_new)
    # root
    w = jnp.einsum("ij,j->i", factors.root_inv, rs[-1][0])[None]
    # up-sweep: recover odd blocks per level (reverse order)
    for lv, r in zip(reversed(factors.levels), reversed(rs[:-1])):
        M = r.shape[0]
        me = (M + 1) // 2
        mo = M // 2
        w_even = w[:me]
        # w[2j+1] = Dinv[2j+1] (r[2j+1] - L[2j] w[2j] - L[2j+1]^T w[2j+2])
        w_l = w_even[:mo]
        w_r = (jnp.concatenate([w_even[1:],
                                jnp.zeros((1, nb), dtype)], axis=0))[:mo]
        rhs_odd = (r[1::2]
                   - jnp.einsum("mij,mj->mi", lv.L_even[:mo], w_l)
                   - jnp.einsum("mji,mj->mi", lv.L_odd_p, w_r))
        w_odd = jnp.einsum("mij,mj->mi", lv.Dinv_odd, rhs_odd)
        w_full = jnp.zeros((M, nb), dtype)
        w_full = w_full.at[0::2].set(w_even)
        w_full = w_full.at[1::2].set(w_odd)
        w = w_full
    return w
