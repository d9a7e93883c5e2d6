"""Pallas TPU kernel: fused TPWL nearest-point selection + dynamics gather.

The TPWL hot op is: given x, compute weighted distances to all P dictionary
points, argmin, and fetch that point's (A_d, B_d, d_d). The XLA lowering
materializes the distance vector and performs three dynamic gathers from
HBM; this kernel fuses the distance reduction and the gather in VMEM — the
dictionary (P, n, n) stays resident and only the selected matrices leave.

For a batch of states the kernel computes a one-hot selection matrix
(B, P) and contracts it with the stacked dictionary on the MXU — turning
the gather into a matmul, which is how gathers go fast on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _select_kernel(wq: float, wv: float,
                   x_ref, q_ref, v_ref, Af_ref, Bf_ref, d_ref,
                   A_out, B_out, d_out):
    """x_ref: (B, 2r); q_ref/v_ref: (P, r); Af_ref: (P, n*n) flattened
    A_d rows; Bf_ref: (P, n*m); d_ref: (P, n). Outputs gathered per batch
    row via one-hot matmul."""
    x = x_ref[:]
    P, r = q_ref.shape
    v = x[:, :r]
    q = x[:, r:]
    # squared-distance trick: ||a-b|| = sqrt(|a|^2 - 2ab + |b|^2)
    qq = jnp.sum(q_ref[:] * q_ref[:], axis=1)[None, :]
    vv = jnp.sum(v_ref[:] * v_ref[:], axis=1)[None, :]
    dq2 = jnp.maximum(qq - 2.0 * jnp.dot(q, q_ref[:].T,
                                         preferred_element_type=x.dtype)
                      + jnp.sum(q * q, axis=1)[:, None], 0.0)
    dv2 = jnp.maximum(vv - 2.0 * jnp.dot(v, v_ref[:].T,
                                         preferred_element_type=x.dtype)
                      + jnp.sum(v * v, axis=1)[:, None], 0.0)
    dist = wq * jnp.sqrt(dq2) + wv * jnp.sqrt(dv2)          # (B, P)
    best = jnp.min(dist, axis=1, keepdims=True)
    # one-hot with argmin tie-breaking toward the lowest index
    idx = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    first = jnp.min(jnp.where(dist <= best, idx, P), axis=1, keepdims=True)
    onehot = (idx == first).astype(x.dtype)
    A_out[:] = jnp.dot(onehot, Af_ref[:], preferred_element_type=x.dtype)
    B_out[:] = jnp.dot(onehot, Bf_ref[:], preferred_element_type=x.dtype)
    d_out[:] = jnp.dot(onehot, d_ref[:], preferred_element_type=x.dtype)


@partial(jax.jit, static_argnames=("dist_w_q", "dist_w_v", "interpret"))
def tpwl_gather_pallas(x_batch, q_pts, v_pts, A_d, B_d, d_d,
                       dist_w_q: float, dist_w_v: float,
                       interpret: bool = False):
    """Batched nearest-point jacobian fetch.

    x_batch: (B, 2r); dictionary stacked as in TPWLModel. Returns
    (A (B, n, n), B (B, n, m), d (B, n)).
    """
    Bsz = x_batch.shape[0]
    P, n, _ = A_d.shape
    m = B_d.shape[2]
    dt = x_batch.dtype
    Af = A_d.reshape(P, n * n)
    Bf = B_d.reshape(P, n * m)
    kernel = partial(_select_kernel, float(dist_w_q), float(dist_w_v))
    A, Bm, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Bsz, n * n), dt),
                   jax.ShapeDtypeStruct((Bsz, n * m), dt),
                   jax.ShapeDtypeStruct((Bsz, n), dt)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        interpret=interpret,
    )(x_batch, q_pts.astype(dt), v_pts.astype(dt), Af.astype(dt),
      Bf.astype(dt), d_d.astype(dt))
    return A.reshape(Bsz, n, n), Bm.reshape(Bsz, n, m), d
