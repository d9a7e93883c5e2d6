"""Multi-chip sharding: device meshes for batched rollouts and MPC.

The reference has no distributed compute (its only IPC is the ROS solver
service, SURVEY.md §2.6). The TPU-native scaling axes here are:

- 'dp' (data parallel): independent closed loops / rollouts across targets
  and initial conditions — pure batch sharding, no communication;
- 'mp' (model parallel): the TPWL linearization-point dictionary is sharded
  across chips; nearest-point selection becomes a *distributed argmin +
  owner-gather* implemented with psum/pmin collectives inside shard_map.
  This matters when the dictionary is large (hundreds of (2r)^2 matrices
  dominate HBM) — each chip holds P/mp points and only the selected
  (A, B, d) triple crosses ICI.

Everything compiles on a host-platform mesh (xla_force_host_platform_
device_count) for testing, and identically on real TPU meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int, mp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"need {dp * mp} devices, have {len(devices)}")
    arr = np.asarray(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def _pad_points(model, mp: int):
    """Pad the TPWL dictionary so the point axis divides mp. Padded points
    replicate the last real point but with +inf distance sentinels via a
    validity mask."""
    Pn = model.num_points
    pad = (-Pn) % mp
    if pad == 0:
        return model, jnp.ones(Pn, dtype=bool)
    def padlast(a):
        return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
    m = model._replace(q=padlast(model.q), v=padlast(model.v),
                       u=padlast(model.u), A_c=padlast(model.A_c),
                       B_c=padlast(model.B_c), d_c=padlast(model.d_c),
                       A_d=None if model.A_d is None else padlast(model.A_d),
                       B_d=None if model.B_d is None else padlast(model.B_d),
                       d_d=None if model.d_d is None else padlast(model.d_d))
    valid = jnp.concatenate([jnp.ones(Pn, bool), jnp.zeros(pad, bool)])
    return m, valid


def shard_tpwl_gather(q_shard, v_shard, valid_shard, Ad_shard, Bd_shard,
                      dd_shard, x, dist_w_q, dist_w_v, axis_name="mp"):
    """Distributed nearest-point jacobian fetch, called inside shard_map.

    Each chip computes distances to its local dictionary shard, the global
    minimum is found with a pmin, and the owning chip contributes its
    (A, B, d) triple through a psum (zeros elsewhere) — one scalar pmin and
    one matrix psum over ICI per fetch.
    """
    n = x.shape[0] // 2
    q, v = x[n:], x[:n]
    dist = (dist_w_q * jnp.linalg.norm(q_shard - q, axis=1)
            + dist_w_v * jnp.linalg.norm(v_shard - v, axis=1))
    dist = jnp.where(valid_shard, dist, jnp.inf)
    local_idx = jnp.argmin(dist)
    local_min = dist[local_idx]
    global_min = jax.lax.pmin(local_min, axis_name)
    # exactly one owner contributes (ties broken by lowest shard index)
    is_owner_val = (local_min == global_min)
    my_rank = jax.lax.axis_index(axis_name)
    owner_rank = jax.lax.pmin(jnp.where(is_owner_val, my_rank, jnp.iinfo(jnp.int32).max),
                              axis_name)
    is_owner = (my_rank == owner_rank)
    w = jnp.where(is_owner, 1.0, 0.0).astype(Ad_shard.dtype)
    A = jax.lax.psum(w * Ad_shard[local_idx], axis_name)
    B = jax.lax.psum(w * Bd_shard[local_idx], axis_name)
    d = jax.lax.psum(w * dd_shard[local_idx], axis_name)
    return A, B, d


def sharded_rollout_batch(model, x0, u, dt, mesh: Mesh):
    """Batched TPWL rollouts with batch on 'dp' and the point dictionary on
    'mp'. x0: (B, n_x); u: (B, N, n_u). B must divide dp."""
    model = model if model.pre_discretized_dt == float(dt) else model.pre_discretize(dt)
    mp = mesh.shape["mp"]
    model_p, valid = _pad_points(model, mp)
    wq, wv = model_p.dist_w_q, model_p.dist_w_v

    def local_fn(q_s, v_s, valid_s, Ad_s, Bd_s, dd_s, x0_s, u_s):
        def one(x0_i, u_i):
            def step(x, u_t):
                A, B, d = shard_tpwl_gather(q_s, v_s, valid_s, Ad_s, Bd_s,
                                            dd_s, x, wq, wv)
                x1 = A @ x + B @ u_t + d
                return x1, x1

            _, xs = jax.lax.scan(step, x0_i, u_i)
            return jnp.concatenate((x0_i[None], xs), axis=0)

        return jax.vmap(one)(x0_s, u_s)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("mp"), P("mp"), P("mp"), P("mp"), P("mp"), P("mp"),
                  P("dp"), P("dp")),
        out_specs=P("dp"))
    return fn(model_p.q, model_p.v, valid, model_p.A_d, model_p.B_d,
              model_p.d_d, x0, u)


def sharded_batch_mpc_fused(mpc, n_windows: int, mesh: Mesh,
                            noise_std: float = 0.0, interpret=None):
    """Batch-fused closed-loop MPC sharded over 'dp': each device runs the
    fused window scan (one grid-batched Pallas ADMM launch per window,
    control/batch_mpc.py:BatchMPC.build_fused) on its B/dp shard. Purely
    data-parallel — no collectives cross ICI; the Pallas grid shrinks to the
    local shard so per-device VMEM pressure is unchanged.

    Returns run(x_plant0 (B,n_x), ekf_x0, z_target (B,n_win,N+1,n_z),
    keys (B,2)) with B divisible by mesh dp. Model/gains are replicated.
    """
    run_local = mpc.build_fused(n_windows, noise_std=noise_std,
                                interpret=interpret)

    def local_fn(x0_s, e0_s, zt_s, keys_s):
        return run_local(x0_s, e0_s, zt_s, keys_s)

    spec = P("dp")
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker rejects inside shard_map
    fn = jax.shard_map(local_fn, mesh=mesh,
                       in_specs=(spec, spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return jax.jit(fn)


def sharded_batch_mpc_fused_mp(mpc, n_windows: int, mesh: Mesh,
                               noise_std: float = 0.0, interpret=None):
    """Batch-fused closed-loop MPC with the batch on 'dp' AND the TPWL
    dictionary (+ per-point DARE gains) sharded over 'mp'.

    Each (dp, mp) device holds its batch shard and P/mp dictionary points;
    every nearest-point fetch (trajectory relinearization, plant step, EKF
    predict, feedback-gain lookup) runs as a distributed argmin + owner
    psum over 'mp' (BatchMPC._select). The QP solves are replicated across
    'mp' — the axis exists for HBM capacity (hundreds of (2r)^2 matrices at
    campaign scale), not FLOPs, and replicating the latency-bound ADMM
    avoids a second collective per iteration.

    Returns run(x0 (B,n_x), ekf_x0, z_target (B,n_win,N+1,n_z), keys (B,2))
    with B divisible by dp. Identical results to mpc.build_fused locally
    (up to argmin tie-breaks among exactly-equidistant points).
    """
    import copy

    mp = mesh.shape["mp"]
    model_p, valid = _pad_points(mpc.model, mp)
    K_pts = mpc.K_pts
    pad = model_p.num_points - mpc.model.num_points
    if pad:
        K_pts = jnp.concatenate([K_pts, jnp.repeat(K_pts[-1:], pad, axis=0)],
                                axis=0)

    def local_fn(q_s, v_s, u_s, Ac_s, Bc_s, dc_s, Ad_s, Bd_s, dd_s, valid_s,
                 K_s, x0_s, e0_s, zt_s, keys_s):
        mpc_l = copy.copy(mpc)
        mpc_l.model = mpc.model._replace(
            q=q_s, v=v_s, u=u_s, A_c=Ac_s, B_c=Bc_s, d_c=dc_s,
            A_d=Ad_s, B_d=Bd_s, d_d=dd_s)
        mpc_l.K_pts = K_s
        mpc_l._mp_axis = "mp"
        mpc_l._mp_valid = valid_s
        run_local = mpc_l.build_fused(n_windows, noise_std=noise_std,
                                      interpret=interpret)
        return run_local(x0_s, e0_s, zt_s, keys_s)

    pm = P("mp")
    pd = P("dp")
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(pm, pm, pm, pm, pm, pm, pm, pm, pm, pm, pm,
                  pd, pd, pd, pd),
        out_specs=pd, check_vma=False)

    def run(x0, e0, zt, keys):
        return fn(model_p.q, model_p.v, model_p.u, model_p.A_c, model_p.B_c,
                  model_p.d_c, model_p.A_d, model_p.B_d, model_p.d_d, valid,
                  K_pts, x0, e0, zt, keys)

    return jax.jit(run)


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard the leading axis of every leaf over `axis`."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)
