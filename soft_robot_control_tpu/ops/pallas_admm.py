"""Pallas TPU kernel: fixed-iteration ADMM entirely in VMEM.

The XLA lowering of the ADMM loop issues ~8 small ops per iteration, each
with fixed launch overhead — for ROM-scale QPs (a few hundred variables)
the solve is latency-bound, not FLOP-bound. This kernel keeps K^-1, A and
all iterates resident in VMEM and runs every iteration inside a single
kernel launch: one `pallas_call` instead of 8 x iters dispatches.

Layout: vectors are (1, n) rows so the data lives along TPU lanes; matvecs
are row-vector x matrix contractions on the MXU. The x-step uses an
explicit K^-1 (computed once per solve from the Cholesky factor) because
triangular solves do not lower inside Mosaic; K is sigma/rho-regularized so
the explicit inverse is benign at f32 for these sizes.

Falls back to interpret mode off-TPU (used by the CPU tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _admm_kernel(iters: int, sigma: float, alpha: float,
                 M1_ref, A_ref, q_ref, l_ref, u_ref, rho_ref, w0_ref,
                 y0_ref, w_out, y_out):
    # K^-1 is applied as M1' M1 (M1 = inv(L_s) D from the Jacobi-scaled
    # Cholesky): two matmuls, numerically far better in f32 than an
    # explicit inverse of the ill-conditioned K.
    M1 = M1_ref[:]
    A = A_ref[:]
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    w = w0_ref[:]
    y = y0_ref[:]
    z = jnp.clip(jnp.dot(w, A.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST), l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + jnp.dot(rho * z - y, A,
                                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        tmp = jnp.dot(rhs, M1.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        x_t = jnp.dot(tmp, M1, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        z_t = jnp.dot(x_t, A.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        w_new = alpha * x_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w, z, y))
    w_out[:] = w
    y_out[:] = y


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "interpret"))
def admm_pallas(M1, A, q, l, u, rho_vec, w0, y0, iters: int,
                sigma: float = 1e-6, alpha: float = 1.6,
                interpret: bool = False):
    """Run `iters` ADMM iterations in one Pallas kernel.

    M1: (n, n) factor with K^-1 = M1' M1 (see admm_fixed_pallas).
    A: (m, n); q, w0: (n,); l, u, rho_vec, y0: (m,).
    Returns (w, y).
    """
    n, m = M1.shape[0], A.shape[0]
    dt = M1.dtype
    row = lambda v: v.reshape(1, -1).astype(dt)
    kernel = partial(_admm_kernel, iters, float(sigma), float(alpha))
    w, y = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n), dt),
                   jax.ShapeDtypeStruct((1, m), dt)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(8)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(M1.astype(dt), A.astype(dt), row(q), row(l), row(u), row(rho_vec),
      row(w0), row(y0))
    return w.reshape(-1), y.reshape(-1)


def _admm_kinv_kernel(iters: int, sigma: float, alpha: float,
                      Kinv_ref, A_ref, q_ref, l_ref, u_ref, rho_ref,
                      w0_ref, y0_ref, w_out, y_out):
    """One QP of the grid-batched ADMM: identical update rule to
    _admm_kernel but with a precomputed symmetric K^-1 (one matmul per
    x-step instead of two with M1)."""
    dt = Kinv_ref.dtype
    hi = jax.lax.Precision.HIGHEST
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=dt, precision=hi)
    Kinv = Kinv_ref[0]
    A = A_ref[0]
    # vector operands ride as (1, 1, n) blocks (Mosaic requires the last two
    # block dims to divide (8, 128) or equal the array dims; a (1, n) block
    # over (B, n) satisfies neither) — peel the block axis to (1, n) rows
    q = q_ref[0]
    l = l_ref[0]
    u = u_ref[0]
    rho = rho_ref[0]
    w = w0_ref[0]
    y = y0_ref[0]
    z = jnp.clip(dot(w, A.T), l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + dot(rho * z - y, A)
        x_t = dot(rhs, Kinv)  # K^-1 symmetric: row-vector form needs no .T
        z_t = dot(x_t, A.T)
        w_new = alpha * x_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w, z, y))
    w_out[0] = w
    y_out[0] = y


def _admm_chunk_kernel(iters: int, sigma: float, alpha: float,
                       Kinv_ref, A_ref, AT_ref, q_ref, l_ref, u_ref, rho_ref,
                       w0_ref, y0_ref, w_out, y_out):
    """One grid cell solves a CHUNK of QPs with batched contractions.

    For small KKTs (the condensed LOCP: n ~ N*nu ~ 20) a per-QP grid wastes
    the vector unit — 1024 sequential cells of (1, n) row ops. Batching a
    chunk per cell turns every step into (C, n)-wide ops (5.5x measured at
    n=20, m=40, B=1024). Mosaic's batched dot_general needs the contracting
    dim last on both sides, hence the separate A and A^T inputs."""
    dt = Kinv_ref.dtype
    hi = jax.lax.Precision.HIGHEST
    bmm = lambda M, v: jax.lax.dot_general(
        M, v, (((2,), (1,)), ((0,), (0,))), precision=hi,
        preferred_element_type=dt)
    Kinv = Kinv_ref[:]   # (C, n, n)
    A = A_ref[:]         # (C, m, n)
    AT = AT_ref[:]       # (C, n, m)
    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    w = w0_ref[:]
    y = y0_ref[:]
    z = jnp.clip(bmm(A, w), l, u)

    def body(i, carry):
        w, z, y = carry
        rhs = sigma * w - q + bmm(AT, rho * z - y)
        x_t = bmm(Kinv, rhs)
        z_t = bmm(A, x_t)
        w_new = alpha * x_t + (1 - alpha) * w
        z_rel = alpha * z_t + (1 - alpha) * z
        z_new = jnp.clip(z_rel + y / rho, l, u)
        y_new = y + rho * (z_rel - z_new)
        return w_new, z_new, y_new

    w, z, y = jax.lax.fori_loop(0, iters, body, (w, z, y))
    w_out[:] = w
    y_out[:] = y


def _pick_chunk(B: int, n: int, m: int, itemsize: int = 4,
                budget: int = 4 * 2**20) -> int:
    """Largest power-of-two chunk whose per-cell VMEM footprint fits the
    budget; 0 means use the per-QP grid. The budget is deliberately ~1/4
    of physical VMEM: Mosaic pads the second-minor dim to sublane tiles
    and double-buffers pipelined blocks, so the true footprint is a small
    multiple of this estimate (chunk=128 at n=20/m=40 compiles standalone
    but OOMs inside the full MPC program)."""
    pad = lambda d: -(-d // 128) * 128
    pad8 = lambda d: -(-d // 8) * 8
    per = itemsize * (pad8(n) * pad(n) + pad8(m) * pad(n)   # Kinv, A
                      + pad8(n) * pad(m)                    # AT
                      + 8 * pad(max(n, m)))                 # vector rows
    c = min(budget // max(per, 1), B)
    chunk = 1
    while chunk * 2 <= c and B % (chunk * 2) == 0:
        chunk *= 2
    if chunk < 8:
        return 0
    return chunk


@partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "interpret"))
def admm_batched_pallas(Kinv, A, q, l, u, rho_vec, w0, y0, iters: int,
                        sigma: float = 1e-6, alpha: float = 1.6,
                        interpret: bool = False):
    """B independent fixed-iteration ADMM solves in ONE kernel launch.

    grid=(B,): each program instance loads its QP's K^-1 and A into VMEM
    once and runs all `iters` iterations there. The vmapped XLA lowering
    (control/batch_mpc.py:admm_fixed_kinv under vmap) re-reads the (B,n,n)
    K^-1 and (B,m,n) A from HBM on every iteration — for ROM-scale QPs that
    HBM traffic, not FLOPs, is the bound; this kernel removes the iters-x
    refetch. Grid batching also avoids vmap-of-pallas, which compiles
    pathologically today.

    Small KKTs (condensed LOCP) are automatically dispatched to the
    chunk-batched kernel (_admm_chunk_kernel) when a power-of-two chunk
    fits VMEM — one grid cell then solves e.g. 64 QPs with batched ops.

    Kinv: (B, n, n) symmetric; A: (B, m, n); q, w0: (B, n);
    l, u, y0: (B, m); rho_vec: (m,) shared. Returns (w, y) of (B, n)/(B, m).
    """
    B, n = q.shape
    m = A.shape[1]
    chunk = _pick_chunk(B, n, m, jnp.dtype(Kinv.dtype).itemsize)
    if chunk:
        dt = Kinv.dtype
        kern = partial(_admm_chunk_kernel, iters, float(sigma), float(alpha))
        G = B // chunk
        mat = lambda d2, d3: pl.BlockSpec((chunk, d2, d3),
                                          lambda i: (i, 0, 0))
        vec = lambda d: pl.BlockSpec((chunk, d), lambda i: (i, 0))
        w, y = pl.pallas_call(
            kern, grid=(G,),
            out_shape=(jax.ShapeDtypeStruct((B, n), dt),
                       jax.ShapeDtypeStruct((B, m), dt)),
            in_specs=[mat(n, n), mat(m, n), mat(n, m), vec(n), vec(m),
                      vec(m), pl.BlockSpec((1, m), lambda i: (0, 0)),
                      vec(n), vec(m)],
            out_specs=(vec(n), vec(m)),
            interpret=interpret,
        )(Kinv, A.astype(dt), jnp.swapaxes(A, 1, 2).astype(dt),
          q.astype(dt), l.astype(dt), u.astype(dt),
          rho_vec.reshape(1, -1).astype(dt), w0.astype(dt), y0.astype(dt))
        return w, y
    return _admm_batched_pallas_grid(Kinv, A, q, l, u, rho_vec, w0, y0,
                                     iters, sigma, alpha, interpret)


def _admm_batched_pallas_grid(Kinv, A, q, l, u, rho_vec, w0, y0, iters: int,
                              sigma: float = 1e-6, alpha: float = 1.6,
                              interpret: bool = False):
    """Per-QP grid variant (one program instance per problem)."""
    B, n = q.shape
    m = A.shape[1]
    dt = Kinv.dtype
    kernel = partial(_admm_kinv_kernel, iters, float(sigma), float(alpha))
    # vectors travel as (B, 1, k) so each block is (1, 1, k) with its last
    # two dims equal to the trailing array dims (Mosaic block-shape rule)
    r3 = lambda v: v.astype(dt).reshape(v.shape[0], 1, v.shape[1])
    vec = lambda: pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0))
    con = lambda: pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0))
    w, y = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=(jax.ShapeDtypeStruct((B, 1, n), dt),
                   jax.ShapeDtypeStruct((B, 1, m), dt)),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
            vec(), con(), con(),
            pl.BlockSpec((1, 1, m), lambda i: (0, 0, 0)),  # shared rho row
            vec(), con(),
        ],
        out_specs=(vec(), con()),
        interpret=interpret,
    )(Kinv, A.astype(dt), r3(q), r3(l), r3(u),
      rho_vec.astype(dt).reshape(1, 1, -1), r3(w0), r3(y0))
    return w.reshape(B, n), y.reshape(B, m)


def admm_fixed_pallas(P, q, A, l, u, w0, y0, rho_vec, iters: int,
                      sigma: float = 1e-6, alpha: float = 1.6,
                      interpret: bool = False):
    """Drop-in replacement for control.batch_mpc.admm_fixed using the
    Pallas kernel.

    The x-step operator is prepared as K^-1 = M1' M1 with
    M1 = inv(chol(D K D)) D, where D = diag(K)^-1/2 (Jacobi scaling):
    inverting the *scaled triangular factor* keeps f32 error ~kappa(L_s)*eps
    instead of the catastrophic explicit inverse of the raw K (whose
    equality-row rho boost drives kappa(K) past f32 range).

    Infinite bounds are clamped to large finite values (inf arithmetic in
    the in-kernel relaxation would produce NaNs)."""
    n = P.shape[0]
    hi = jax.lax.Precision.HIGHEST
    mm = lambda a, b: jnp.matmul(a, b, precision=hi)
    K = P + sigma * jnp.eye(n, dtype=P.dtype) + mm(A.T * rho_vec[None, :], A)
    d = jax.lax.rsqrt(jnp.diagonal(K))
    Ks = K * d[:, None] * d[None, :]
    Ls = jnp.linalg.cholesky(Ks)
    I = jnp.eye(n, dtype=P.dtype)
    Linv = jax.scipy.linalg.solve_triangular(Ls, I, lower=True)
    # one Newton step X <- X(2I - Ls X) at full f32 precision cleans up any
    # residual of the triangular inversion (TPU matmuls otherwise run at
    # reduced bf16-pass precision — the HIGHEST flags here are load-bearing)
    Linv = mm(Linv, 2.0 * I - mm(Ls, Linv))
    M1 = Linv * d[None, :]
    big = jnp.asarray(1e30, P.dtype)
    l_f = jnp.maximum(l, -big)
    u_f = jnp.minimum(u, big)
    return admm_pallas(M1, A, q, l_f, u_f, rho_vec, w0, y0, iters,
                       sigma=sigma, alpha=alpha, interpret=interpret)
