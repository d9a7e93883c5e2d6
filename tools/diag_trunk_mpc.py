"""Instrumented trunk MPC leg: FEM plant + EKF + device-TR GuSTO.

The ROM-in-the-loop repro (tools/repro_trunk_inloop.py) shows the solver
stack tracks at 0.92 mm with zero rejects on TPU f32 when the belief is
exact; the full campaign leg (examples/trunk_tet_campaign.py --skip-collect
--skip-ilqr) rejects ~250/250 plans with 58-125 mm planned excursions and
RMS 60 mm. This tool runs the EXACT campaign wiring (tet plant, EKF from the
tip measurement, feedforward scp MPC) but logs, per tick, the true tip, the
EKF belief tip, and per solve the belief-vs-true reduced-state gap — to
localize whether the belief diverges before or after the plans do.

    python tools/diag_trunk_mpc.py --steps 400                 # session TPU
    python tools/diag_trunk_mpc.py --steps 400 --full-state    # oracle belief
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--full-state", action="store_true",
                    help="replace the EKF with the true POD-projected state")
    ap.add_argument("--ekf-W-scale", type=float, default=1.0)
    ap.add_argument("--ekf-V", type=float, default=0.1,
                    help="measurement noise covariance scale; the reference "
                    "trunk run_scp uses V=0 (trunk.py:255 — fully trusted "
                    "noise-free measurements)")
    ap.add_argument("--meas-nodes", type=str, default="",
                    help="comma-separated node ids for the EKF measurement "
                    "(default: the robot's [51,22,37])")
    ap.add_argument("--R", type=float, default=1e-2)
    ap.add_argument("--feedback", action="store_true",
                    help="LQR feedback around the plan (per-TPWL-point DARE "
                    "gains, tpwl/controllers.py:326-333 semantics)")
    ap.add_argument("--feedback-R", type=float, default=None,
                    help="tamer DARE R for the feedback gains (the iLQR leg "
                    "tracks at 2.0 mm with feedback_R=1.0)")
    ap.add_argument("--plan-bound", type=float, default=40.0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "trunk_tet"))
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
    from soft_robot_control_tpu.estimators.ekf import DiscreteEKFObserver
    from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
    from soft_robot_control_tpu.robots.robots import TrunkTetRobot
    from soft_robot_control_tpu.tasks import recipes

    np_dtype = np.float64 if args.f64 else np.float32
    jdtype = jnp.float64 if args.f64 else jnp.float32
    t0c = time.time()
    robot = TrunkTetRobot(dtype=np_dtype)
    dt = robot.dt
    model = recipes.load_tpwl(robot, args.out).pre_discretize(dt)
    gmodel = TPWLGuSTO(model)
    print(f"[{time.time()-t0c:6.1f}s] model P={model.num_points} "
          f"r={model.state_dim} on {jax.devices()}", flush=True)

    Hf = robot.get_output_model()
    z_eq = Hf @ np.asarray(robot.plant.x_rest())
    sim_duration = 11.0
    T_target = sim_duration + 4.0
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
    service = GuSTOService(gmodel, 50, dt, Qz, R, x0, t=tt, z=z_solver,
                           U=U, max_gusto_iters=5, convg_thresh=1e-2,
                           locp_backend="condensed", dtype=jdtype,
                           device_tr=True, plan_bound=args.plan_bound)
    print(f"[{time.time()-t0c:6.1f}s] service built", flush=True)

    H = np.asarray(model.H)
    cost = QuadraticCost(Q=H.T @ Qz @ H, R=R)
    nodes = ([int(s) for s in args.meas_nodes.split(",")]
             if args.meas_nodes else None)
    Cf = robot.get_measurement_model(nodes=nodes)
    if nodes is not None:
        model = model.set_measurement_model(Cf)
    dx_char = np.asarray(model.get_characteristic_dx(dt))
    W_ekf = args.ekf_W_scale * np.diag(dx_char + 1e-8)
    observer = None
    if not args.full_state:
        observer = DiscreteEKFObserver(
            model, W=W_ekf,
            Sigma0=None if args.ekf_W_scale == 1.0 else W_ekf,
            V=args.ekf_V * np.eye(Cf.shape[0]))
    ctrl = scp(model, cost, dt, N_replan=2, observer=observer, delay=1.0,
               wait=True, solver_service=service, mpc=True,
               feedback=args.feedback, feedback_R=args.feedback_R)
    ctrl.set_sim_timestep(dt)

    plant = robot.plant
    step_fn = jax.jit(lambda x_, u_: plant.step(x_, u_, dt))
    Cf_j = jnp.asarray(Cf, jdtype)
    Hf_j = jnp.asarray(Hf, jdtype)
    x = jnp.asarray(plant.x_rest())
    u_prev = np.zeros(8)
    errs, berrs, t_log = [], [], []
    for k in range(args.steps):
        t = k * dt
        y = np.asarray(Cf_j @ x)
        u = ctrl.evaluate(t, y, np.asarray(x), u_prev)
        u = np.clip(np.asarray(u), 0.0, 250.0)
        x = step_fn(x, jnp.asarray(u, x.dtype))
        u_prev = np.asarray(u)

        z_true = np.asarray(Hf_j @ x)
        # belief tip: lift the observer/full state through the ROM output map
        x_hat = np.asarray(ctrl.observer.x)
        z_hat = np.asarray(model.x_to_zfyf(jnp.asarray(x_hat), zf=True))
        zt = np.array([np.interp(t - 1.0, tt, z_target[:, j])
                       for j in range(3)])
        errs.append(z_true[:2] - zt[:2])
        berrs.append(z_hat - z_true)
        t_log.append(t)
        if k % 25 == 0:
            x_true_r = np.asarray(model.rom.project_x(x))
            gap = np.linalg.norm(x_hat - x_true_r)
            print(f"t={t:5.2f} |track|={np.linalg.norm(errs[-1]):8.3f} mm "
                  f"|z_hat-z_true|={np.linalg.norm(berrs[-1]):8.3f} mm "
                  f"|xhat-xtrue|={gap:9.3f} u[max]={u.max():6.1f} "
                  f"rejects={service.gusto.plan_rejects}", flush=True)
    errs = np.asarray(errs)
    mask = np.asarray(t_log) >= 1.0
    rmse = float(np.sqrt(np.mean(np.sum(errs[mask] ** 2, axis=1))))
    brms = float(np.sqrt(np.mean(np.sum(np.asarray(berrs)[mask] ** 2,
                                        axis=1))))
    print(f"\ntracking RMSE(xy, t>=1s) {rmse:.3f} mm; belief tip RMS "
          f"{brms:.3f} mm; rejects={service.gusto.plan_rejects}", flush=True)


if __name__ == "__main__":
    main()
