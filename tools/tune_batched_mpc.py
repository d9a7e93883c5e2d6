"""Grid-tune the 1024-way batched MPC fast path (VERDICT r4 #9).

Sweeps (qp_iters, rho_stages, scaling_iters) for the condensed batch-fused
route (control/batch_mpc.py: all B QPs per window solve in one grid-batched
Pallas launch) on the committed campaign model, measuring BOTH throughput
(windows/s at B=1024, n_win=4 — bench.py section 3's exact protocol) and
closed-loop quality (rel tracking error vs dynamically feasible targets,
gate <= 0.05). Prints a table; pick the fastest config that holds the gate
and promote it into bench.py.

    python tools/tune_batched_mpc.py                 # session TPU
    python tools/tune_batched_mpc.py --configs 100,4,6 50,2,3
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--configs", nargs="*", default=[
    "100,4,6", "100,2,6", "100,2,3", "70,2,3", "50,2,3", "50,1,3",
    "50,2,6", "40,2,3", "30,1,3"],
    help="comma triples qp_iters,rho_stages,scaling_iters")
ap.add_argument("--B", type=int, default=1024)
ap.add_argument("--n-win", type=int, default=4)
args = ap.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import load_bench_model, timeit  # noqa: E402
from soft_robot_control_tpu.control.batch_mpc import (BatchMPC,  # noqa: E402
                                                      window_targets)
from soft_robot_control_tpu.core.constraints import HyperRectangle  # noqa: E402
from soft_robot_control_tpu.models.tpwl import rollout_batch  # noqa: E402

dtype = jnp.float32
model, dt, src = load_bench_model(dtype)
nz = int(np.asarray(model.H).shape[0])
m_in = int(model.input_dim)
N, N_replan = 5, 2
U = HyperRectangle(1500.0 * np.ones(m_in), np.zeros(m_in))
B, n_win = args.B, args.n_win
print(f"model {src}; B={B} n_win={n_win} device={jax.devices()[0]}",
      flush=True)

model_d = jax.tree_util.tree_map(
    lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
    model).pre_discretize(dt)

# dynamically feasible quality targets (bench.py's protocol)
T_q = n_win * N_replan + N + 1
rng_q = np.random.default_rng(11)
tq = dt * np.arange(T_q + 1)
u_ref = 0.5 * 1500.0 * (1.0 + np.sin(
    2 * np.pi * tq[None, :, None] / 4.0
    + rng_q.uniform(0, 2 * np.pi, size=(B, 1, m_in))))
Xq = rollout_batch(model_d, jnp.zeros((B, model.state_dim), dtype),
                   jnp.asarray(u_ref, dtype), dt)
zq = np.asarray(Xq) @ np.asarray(model_d.H).T + np.asarray(model_d.z_ref)
ztQ = jnp.asarray(np.stack([window_targets(zq[b, :T_q], n_win, N_replan, N)
                            for b in range(B)]), dtype)
x0B = jnp.zeros((B, model.state_dim), dtype)
keysB = jax.random.split(jax.random.PRNGKey(1), B)

print(f"{'qp_it':>5} {'stages':>6} {'ruiz':>4} {'windows/s':>10} "
      f"{'rel_err':>8} gate", flush=True)
for cfg in args.configs:
    qp_it, stages, ruiz = (int(v) for v in cfg.split(","))
    t0 = time.time()
    mpc = BatchMPC(model, 100.0 * np.eye(nz), 1e-5 * np.eye(m_in), N=N,
                   dt=dt, N_replan=N_replan, qp_iters=qp_it, scp_iters=1,
                   dtype=dtype, x_step="kinv", formulation="condensed",
                   U=U, rho_stages=stages, scaling_iters=ruiz,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(np.asarray(model.C).shape[0]))
    run = mpc.build_fused(n_win)
    try:
        t_w = timeit(lambda: run(x0B, x0B, ztQ, keysB), warmup=2, iters=5)
    except Exception as e:
        print(f"{qp_it:>5} {stages:>6} {ruiz:>4} FAIL {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        continue
    wps = B * n_win / t_w
    logs = jax.block_until_ready(run(x0B, x0B, ztQ, keysB))
    z = np.asarray(logs["z"])
    zt_exec = np.asarray(ztQ)[:, :, 1:N_replan + 1, :].reshape(
        B, n_win * N_replan, -1)
    num = np.linalg.norm(z - zt_exec)
    den = max(np.linalg.norm(zt_exec - zt_exec.mean(axis=(0, 1))), 1e-12)
    rel = float(num / den)
    print(f"{qp_it:>5} {stages:>6} {ruiz:>4} {wps:>10.1f} {rel:>8.4f} "
          f"{'PASS' if rel <= 0.05 else 'fail'}  ({time.time()-t0:.0f}s)",
          flush=True)
