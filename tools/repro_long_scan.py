"""Bisect the T>=2000 tet-scale single-program scan fault (VERDICT r3 #6).

Round-2/3 observed the TPU runtime kill long single-jit simulations of the
tet-FEM plants ("kernel fault") somewhere at T>=~2000 steps; campaigns fence
it with 50-step chunked host loops (sim/fem_surrogate.py:simulate_chunked).
This script isolates the variable: scan trip count vs stacked-output size vs
program shape, on the Diamond or Trunk tet plant.

    python tools/repro_long_scan.py --robot trunk --mode scan --T 2000
    python tools/repro_long_scan.py --sweep     # full matrix, prints a table
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(robot, mode, T):
    import jax
    import jax.numpy as jnp
    import numpy as np

    plant = robot.plant
    dt = robot.dt
    x0 = jnp.asarray(plant.x_rest())
    m = plant.input_dim
    rng = np.random.default_rng(0)
    u = jnp.asarray(0.1 * robot.u_max *
                    np.abs(rng.normal(size=(T, m))).astype(np.float32))

    if mode == "scan":            # full stacked-output scan (simulate())
        @jax.jit
        def f(x0, u):
            def step(x, u_t):
                x1 = plant.step(x, u_t, dt)
                return x1, x1
            _, X = jax.lax.scan(step, x0, u)
            return X

        out = f(x0, u)
    elif mode == "scan_nostack":  # same trip count, carry-only (no outputs)
        @jax.jit
        def f(x0, u):
            def step(x, u_t):
                return plant.step(x, u_t, dt), None
            xT, _ = jax.lax.scan(step, x0, u)
            return xT

        out = f(x0, u)
    elif mode == "fori":          # fori_loop with dynamic-slice input reads
        @jax.jit
        def f(x0, u):
            def body(i, x):
                return plant.step(x, jax.lax.dynamic_index_in_dim(
                    u, i, keepdims=False), dt)
            return jax.lax.fori_loop(0, u.shape[0], body, x0)

        out = f(x0, u)
    elif mode == "chunked_jit":   # one jit, fori over 50-step inner scans
        C = 50

        @jax.jit
        def f(x0, u):
            uc = u.reshape(-1, C, u.shape[1])

            def outer(i, x):
                def step(x_, u_t):
                    return plant.step(x_, u_t, dt), None
                x1, _ = jax.lax.scan(step, x, uc[i])
                return x1
            return jax.lax.fori_loop(0, uc.shape[0], outer, x0)

        out = f(x0, u)
    else:
        raise ValueError(mode)
    out = jax.block_until_ready(out)
    import numpy as np
    arr = np.asarray(out)
    return bool(np.isfinite(arr).all())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="trunk", choices=["trunk", "diamond"])
    ap.add_argument("--mode", default="scan",
                    choices=["scan", "scan_nostack", "fori", "chunked_jit"])
    ap.add_argument("--T", type=int, default=2000)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--isolate", action="store_true",
                    help="run each sweep case in its own subprocess — a "
                    "kernel fault poisons the client session (every later "
                    "case in the same process reports UNAVAILABLE), so "
                    "only isolated cases give a truthful matrix")
    args = ap.parse_args()

    if args.sweep and args.isolate:
        import subprocess
        for m in ("scan", "scan_nostack", "fori", "chunked_jit"):
            for T in (500, 2000, 3000):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--robot", args.robot, "--mode", m, "--T", str(T)],
                    capture_output=True, text=True, timeout=1800)
                tail = [ln for ln in (r.stdout + r.stderr).splitlines()
                        if ln.strip().startswith(m)]
                print(tail[-1] if tail
                      else f"  {m:>13} T={T:<5} NO-RESULT rc={r.returncode}",
                      flush=True)
        return

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from soft_robot_control_tpu.robots.robots import (DiamondTetRobot,
                                                      TrunkTetRobot)

    robot = (TrunkTetRobot(dtype=np.float32) if args.robot == "trunk"
             else DiamondTetRobot(dtype=np.float32))
    print(f"{args.robot}: state dim {robot.plant.state_dim}, "
          f"devices={jax.devices()}", flush=True)

    cases = ([(m, T) for m in ("scan", "scan_nostack", "fori", "chunked_jit")
              for T in (500, 2000, 3000)] if args.sweep
             else [(args.mode, args.T)])
    for mode, T in cases:
        t0 = time.time()
        try:
            finite = run_case(robot, mode, T)
            print(f"  {mode:>13} T={T:<5} OK finite={finite} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"  {mode:>13} T={T:<5} FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
