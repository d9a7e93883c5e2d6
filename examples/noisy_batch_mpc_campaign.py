"""Noisy-measurement 1024-way batched MPC+EKF campaign (BASELINE config 5).

The reference's measurement model is explicitly noisy — MeasurementModel
adds zero-mean Gaussian noise with covariances S_q/S_v to the measured
node positions/velocities (/root/reference/sofacontrol/measurement_models.py:
47-86) and the EKF (tpwl/observer.py) filters it. The committed batched
campaigns and bench.py run the 1024-way MPC+EKF loop noise-free; this
campaign closes that gap: the same quality-gated condensed configuration
bench.py times, driven at several measurement-noise levels, with the EKF on,
against dynamically feasible targets.

Persists examples/diamond_tet/noisy_batch_mpc.json
{noise_std -> rel tracking err} and fails if the gates in
tests/test_campaign_artifacts.py regress.

    python examples/noisy_batch_mpc_campaign.py           # TPU, ~2 min
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from bench import load_bench_model
    from soft_robot_control_tpu.control.batch_mpc import (BatchMPC,
                                                          window_targets)
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.tpwl import rollout_batch

    t0 = time.time()
    dtype = jnp.float32
    model, dt, model_src = load_bench_model(dtype)
    nz = int(np.asarray(model.H).shape[0])
    m_in = int(model.input_dim)
    N, N_replan = 5, 2
    B, n_win = 1024, 4
    U = HyperRectangle(1500.0 * np.ones(m_in), np.zeros(m_in))
    print(f"[{time.time()-t0:6.1f}s] model: {model_src}; "
          f"devices={jax.devices()}", flush=True)

    # quality-gated condensed configuration (bench.py section 3)
    mpc = BatchMPC(model, 100.0 * np.eye(nz), 1e-5 * np.eye(m_in), N=N,
                   dt=dt, N_replan=N_replan, qp_iters=100, scp_iters=1,
                   dtype=dtype, x_step="kinv", formulation="condensed",
                   U=U, rho_stages=4, scaling_iters=6,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))

    # dynamically feasible targets: the model's own z-response to
    # admissible smooth cable inputs (same construction the bench's quality
    # gate uses — random targets would only measure infeasibility)
    model_d = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
        model).pre_discretize(dt)
    T_q = n_win * N_replan + N + 1
    rng = np.random.default_rng(11)
    tq = dt * np.arange(T_q + 1)
    u_ref = 0.5 * 1500.0 * (1.0 + np.sin(
        2 * np.pi * tq[None, :, None] / 4.0
        + rng.uniform(0, 2 * np.pi, size=(B, 1, m_in))))
    Xq = rollout_batch(model_d, jnp.zeros((B, model.state_dim), dtype),
                       jnp.asarray(u_ref, dtype), dt)
    zq = (np.asarray(Xq) @ np.asarray(model_d.H).T
          + np.asarray(model_d.z_ref))
    ztQ = jnp.asarray(np.stack([window_targets(zq[b, :T_q], n_win, N_replan,
                                               N) for b in range(B)]), dtype)
    x0B = jnp.zeros((B, model.state_dim), dtype)
    keysB = jax.random.split(jax.random.PRNGKey(1), B)
    zt_exec = np.asarray(ztQ)[:, :, 1:N_replan + 1, :].reshape(
        B, n_win * N_replan, -1)
    den = max(np.linalg.norm(zt_exec - zt_exec.mean(axis=(0, 1))), 1e-12)

    # measurement-noise sweep: y = C x + noise_std * N(0, I). y carries the
    # measured node positions (mm) and velocities (mm/s); 0.1 mm is the
    # scale of a good mocap system, 1.0 mm a coarse one.
    results = {"model_source": model_src, "batch": B, "n_windows": n_win,
               "noise": {}}
    for noise_std in (0.0, 0.1, 0.5, 1.0):
        run = mpc.build_fused(n_win, noise_std=noise_std)
        logs = jax.block_until_ready(run(x0B, x0B, ztQ, keysB))
        z = np.asarray(logs["z"])
        rel = float(np.linalg.norm(z - zt_exec) / den)
        results["noise"][str(noise_std)] = rel
        print(f"[{time.time()-t0:6.1f}s] noise_std={noise_std:>4}: "
              f"rel tracking err {rel:.4f}", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "diamond_tet", "noisy_batch_mpc.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[{time.time()-t0:6.1f}s] saved {out}", flush=True)

    from soft_robot_control_tpu.utils.gatekeeper import enforce_gates
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = enforce_gates([os.path.join(repo, "tests",
                                     "test_campaign_artifacts.py")],
                       [out], os.path.dirname(out))
    if rc != 0:
        sys.exit(rc)


if __name__ == "__main__":
    main()
