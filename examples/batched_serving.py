"""Batched MPC serving on TPU — the large-scale deployment path.

Runs B independent closed-loop MPC+EKF controllers (condensed LOCP, one
grid-batched Pallas ADMM launch per replanning window) on one chip, or
sharded over a device mesh with `--mesh`. This is the throughput-oriented
counterpart of examples/realtime_mpc_tpu.py's latency demo: ~40k windows/s
at 1024-way on a TPU v5e.

Usage:
  python examples/batched_serving.py                 # 1024-way, one chip
  python examples/batched_serving.py --batch 256
  python examples/batched_serving.py --platform cpu --batch 16 --mesh 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard over this many devices (0 = single device)")
    ap.add_argument("--formulation", default="condensed",
                    choices=["condensed", "sparse"])
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()
    if args.batch < 1 or args.windows < 1:
        ap.error("--batch and --windows must be >= 1")

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", False)
        if args.mesh:
            jax.config.update("jax_num_cpu_devices", max(args.mesh, 1))
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from soft_robot_control_tpu.control.batch_mpc import BatchMPC
    from soft_robot_control_tpu.tasks.demo import demo_targets, make_demo_tpwl

    dtype = jnp.float32
    model = make_demo_tpwl(r=21, P=64, m=4, nz=6, nf=64, dtype=np.float32)
    dt, N, N_replan = 0.02, 5, 2
    mpc = BatchMPC(model, 100.0 * np.eye(6), 1e-3 * np.eye(4), N=N, dt=dt,
                   N_replan=N_replan, qp_iters=50, scp_iters=1, dtype=dtype,
                   x_step="kinv", formulation=args.formulation,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))

    B, n_win = args.batch, args.windows
    zt = jnp.asarray(demo_targets(model, n_win, N_replan, N, dt, batch=B),
                     dtype)
    x0 = jnp.zeros((B, model.state_dim), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    if args.mesh:
        from soft_robot_control_tpu.parallel.mesh import (make_mesh,
                                                          shard_batch,
                                                          sharded_batch_mpc_fused)

        mesh = make_mesh(dp=args.mesh, mp=1)
        run = sharded_batch_mpc_fused(mpc, n_win, mesh)
        x0, _, zt, keys = shard_batch((x0, x0, zt, keys), mesh, "dp")
        print(f"mesh: dp={args.mesh}")
    else:
        run = mpc.build_fused(n_win)

    print(f"compiling ({args.formulation}, B={B}, {n_win} windows)...")
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(x0, x0, zt, keys))
    print(f"  first call (incl. compile): {time.perf_counter() - t0:.1f} s")

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x0, x0, zt, keys)
    jax.block_until_ready(out)
    wps = B * n_win * iters / (time.perf_counter() - t0)
    z = np.asarray(out["z"])
    assert np.all(np.isfinite(z))
    print(f"throughput: {wps:,.0f} MPC windows/s "
          f"({B}-way, device {jax.devices()[0]})")


if __name__ == "__main__":
    main()
