"""ROM-in-the-loop repro for the trunk GuSTO MPC reject cascade.

The r4 trunk campaign MPC leg (examples/trunk_tet_campaign.py, device-TR
GuSTO) rejects 286/500 in-loop solves with planned excursions 48-108 mm on a
+-10 mm figure-8 (excursion measured by scp/gusto.py:_plan_excursion), and
the FEM plant collapses. This tool replays the EXACT controller/solver stack
(GuSTOService + control.mpc.scp + device-TR GuSTOJit, campaign
hyperparameters) but steps the TPWL ROM itself as the plant, so model-plant
mismatch is zero and the belief is exact. If plans are still rejected here,
the solver path is broken independent of the FEM plant / EKF; comparing
--platform cpu vs tpu separates numerics from algorithm.

    python tools/repro_trunk_inloop.py --steps 300            # session TPU
    python tools/repro_trunk_inloop.py --steps 300 --platform cpu
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu forces CPU")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "trunk_tet"))
    ap.add_argument("--mode", default="device_tr",
                    choices=["device_tr", "oneshot", "host"],
                    help="solver path: device-TR while_loop (campaign), "
                    "fused one-shot, or the host GuSTO loop")
    ap.add_argument("--N", type=int, default=50)
    ap.add_argument("--R", type=float, default=1e-2)
    ap.add_argument("--plan-bound", type=float, default=40.0)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from soft_robot_control_tpu.control.mpc import scp
    from soft_robot_control_tpu.control.service import GuSTOService
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.core.types import QuadraticCost
    from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
    from soft_robot_control_tpu.robots.robots import TrunkTetRobot
    from soft_robot_control_tpu.tasks import recipes

    np_dtype = np.float64 if args.f64 else np.float32
    jdtype = jnp.float64 if args.f64 else jnp.float32
    t0 = time.time()
    robot = TrunkTetRobot(dtype=np_dtype)
    dt = robot.dt
    model = recipes.load_tpwl(robot, args.out).pre_discretize(dt)
    gmodel = TPWLGuSTO(model)
    print(f"[{time.time()-t0:6.1f}s] model P={model.num_points} "
          f"r={model.state_dim} on {jax.devices()}", flush=True)

    Hf = robot.get_output_model()
    z_eq = Hf @ np.asarray(robot.plant.x_rest())
    T_target = 15.0
    tt = np.linspace(0, T_target, 1000)
    th = 2 * np.pi * tt / 10.0
    z_target = np.tile(z_eq, (1000, 1))
    z_target[:, 0] += -10.0 * np.sin(th)
    z_target[:, 1] += 10.0 * np.sin(2 * th)

    Qz = np.diag([100.0, 100.0, 0.0])
    R = args.R * np.eye(8)
    U = HyperRectangle(250.0 * np.ones(8), np.zeros(8))

    x0 = np.asarray(model.rom.project_x(model.rom.x_ref))
    z_solver = np.asarray(model.zfyf_to_zy(zf=jnp.asarray(z_target)))
    kw = dict(locp_backend="condensed", dtype=jdtype)
    if args.mode == "device_tr":
        kw.update(device_tr=True, plan_bound=args.plan_bound)
    elif args.mode == "oneshot":
        kw.update(max_gusto_iters=0, plan_bound=args.plan_bound)
    service = GuSTOService(gmodel, args.N, dt, Qz, R, x0, t=tt, z=z_solver,
                           U=U, max_gusto_iters=kw.pop("max_gusto_iters", 5),
                           convg_thresh=1e-2, **kw)
    print(f"[{time.time()-t0:6.1f}s] service built (construction solve "
          f"done)", flush=True)

    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ Qz @ H, R=R)
    ctrl = scp(model, cost, dt, N_replan=2, observer=None, delay=0.0,
               wait=True, solver_service=service, mpc=True, feedback=False)

    # ROM-in-the-loop: the model IS the plant, belief exact
    step = jax.jit(lambda x, u: gmodel.get_discrete_dynamics(x, u, dt))
    x = np.asarray(x0, float)
    errs, us = [], []
    solve_ms = []
    for k in range(args.steps):
        t = round(k * dt, 6)
        if ctrl.recompute_policy(t):
            n_before = len(service.gusto.plan_rejects_log) if hasattr(
                service.gusto, "plan_rejects_log") else service.gusto.plan_rejects
            ctrl.compute_policy(t, x)
            solve_ms.append(1e3 * (service.t_solve or 0.0))
        u = np.asarray(ctrl.compute_input(t, x), float)
        A, B, d = step(jnp.asarray(x, jdtype), jnp.asarray(u, jdtype))
        x = np.asarray(A @ jnp.asarray(x, jdtype) + B @ jnp.asarray(u, jdtype)
                       + d, float)
        z = np.asarray(model.x_to_zfyf(jnp.asarray(x), zf=True), float)
        zt = np.array([np.interp(t, tt, z_target[:, j]) for j in range(3)])
        errs.append(z[:2] - zt[:2])
        us.append(u)
        if k % 50 == 0:
            print(f"t={t:5.2f} |err_xy|={np.linalg.norm(errs[-1]):7.3f} mm "
                  f"u[max]={u.max():7.1f} rejects={service.gusto.plan_rejects}",
                  flush=True)
    errs = np.asarray(errs)
    rmse = float(np.sqrt(np.mean(np.sum(errs ** 2, axis=1))))
    print(f"\nROM-in-loop RMSE(xy) {rmse:.3f} mm over {args.steps} steps; "
          f"plan_rejects={service.gusto.plan_rejects}; "
          f"solve_ms mean {np.mean(solve_ms):.1f}", flush=True)


if __name__ == "__main__":
    main()
