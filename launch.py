#!/usr/bin/env python
"""Experiment launcher — the problem-selection + headless-loop entry point.

Capability parity with the reference's problem_specification.py (comment-
toggled problem choice) + launch_sofa.py main() + the per-example
`python3 <example>.py <subcommand>` dispatch — replaced by one argparse CLI:

    python launch.py diamond collect_pod_data --save-dir runs/diamond
    python launch.py diamond compute_pod_basis --save-dir runs/diamond
    python launch.py diamond collect_tpwl_data --save-dir runs/diamond
    python launch.py diamond tpwl_check --save-dir runs/diamond
    python launch.py diamond run_scp --save-dir runs/diamond --duration 6
    python launch.py diamond run_ilqr --save-dir runs/diamond
    python launch.py diamond run_rompc --save-dir runs/diamond
    python launch.py diamond modal_analysis --save-dir runs/diamond
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def get_robot(name: str, dt: float):
    from soft_robot_control_tpu.robots import DiamondRobot, FingerRobot, TrunkRobot
    from soft_robot_control_tpu.robots.robots import (DiamondTetRobot,
                                                      TrunkTetRobot)

    cls = {"diamond": DiamondRobot, "trunk": TrunkRobot,
           "finger": FingerRobot,
           # full-scale reference-mesh tet-FEM robots (sim/fem_tet.py);
           # their plant step size is baked into the cached factor, so dt
           # is fixed at the reference 0.01
           "diamond_tet": DiamondTetRobot, "trunk_tet": TrunkTetRobot}[name]
    if name.endswith("_tet"):
        robot = cls()
        return robot
    robot = cls()
    robot.dt = dt
    robot.sequences.dt = dt
    return robot


def default_target(robot, dt):
    """Gentle sine on the tip output around rest."""
    import jax.numpy as jnp
    from soft_robot_control_tpu.tasks.targets import sine_setpoint

    Hf = robot.get_output_model()
    z0 = float((np.asarray(robot.plant.x_rest()) @ Hf.T)[0])
    t, z = sine_setpoint(T=4.0, duration=20.0, dt=dt, amplitude=0.05)
    return t, z + z0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("robot", choices=["diamond", "trunk", "finger",
                                     "diamond_tet", "trunk_tet"])
    p.add_argument("recipe", choices=[
        "collect_pod_data", "compute_pod_basis", "collect_tpwl_data",
        "tpwl_check", "run_scp", "run_ilqr", "run_scp_ol", "run_rompc",
        "run_koopman", "modal_analysis", "calibrate_rest"])
    p.add_argument("--save-dir", default="runs/default")
    p.add_argument("--dt", type=float, default=0.02)
    p.add_argument("--duration", type=float, default=6.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="force a JAX backend (the environment may pre-point "
                        "JAX at a TPU tunnel; env vars are too late)")
    args = p.parse_args(argv)

    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            # solver accuracy targets assume f64 off-TPU
            jax.config.update("jax_enable_x64", True)

    from soft_robot_control_tpu.tasks import recipes
    from soft_robot_control_tpu.tasks.analysis import summarize

    os.makedirs(args.save_dir, exist_ok=True)
    robot = get_robot(args.robot, args.dt)

    if args.recipe == "collect_pod_data":
        snap = recipes.collect_pod_data(robot, args.save_dir, seed=args.seed)
        print(json.dumps({"snapshots": len(snap["q"])}))
    elif args.recipe == "compute_pod_basis":
        res = recipes.compute_pod_basis(args.save_dir, pod_tolerance=1e-8,
                                        pod_type="v")
        print(json.dumps({"rom_dim": int(res["POD_info"]["U"].shape[1])}))
    elif args.recipe == "collect_tpwl_data":
        model = recipes.collect_tpwl_data(robot, args.save_dir,
                                          threshold=0.4, seed=args.seed)
        print(json.dumps({"tpwl_points": model.num_points}))
    elif args.recipe == "tpwl_check":
        res = recipes.tpwl_rollout_check(robot, args.save_dir)
        print(json.dumps({"rollout_mse": res["mse"]}))
    elif args.recipe == "run_scp":
        t_t, z_t = default_target(robot, args.dt)
        sim = recipes.run_scp(robot, args.save_dir, t_t, z_t,
                              Qz=np.array([[200.0]]),
                              sim_duration=args.duration, delay=0.5)
        stats = summarize(sim, t_t + 0.5, z_t, t_start=1.0, label="scp")
        print(json.dumps({"tracking_mse": stats["tracking"]["mse"],
                          "solve_times": stats["solve_times"]}))
    elif args.recipe == "run_ilqr":
        t_t, z_t = default_target(robot, args.dt)
        sim = recipes.run_ilqr(robot, args.save_dir, t_t, z_t,
                               Qz=np.array([[200.0]]),
                               sim_duration=args.duration, delay=0.5,
                               tf=args.duration)
        stats = summarize(sim, t_t + 0.5, z_t, t_start=1.0, label="ilqr")
        print(json.dumps({"tracking_mse": stats["tracking"]["mse"]}))
    elif args.recipe == "run_scp_ol":
        t_t, z_t = default_target(robot, args.dt)
        res = recipes.run_scp_open_loop(robot, args.save_dir, t_t, z_t, N=60)
        err = float(np.mean((res["zopt"][:, 0]
                             - np.interp(res["topt"], t_t, z_t[:, 0]))**2))
        print(json.dumps({"plan_mse": err}))
    elif args.recipe == "run_rompc":
        t_t, z_t = default_target(robot, args.dt)
        sim = recipes.run_rompc(robot, args.save_dir, t_t, z_t,
                                sim_duration=args.duration, delay=0.5)
        stats = summarize(sim, t_t + 0.5, z_t, t_start=1.0, label="rompc")
        print(json.dumps({"tracking_mse": stats["tracking"]["mse"]}))
    elif args.recipe == "run_koopman":
        t_t = np.arange(0, 20, args.dt)
        z_t = np.full((len(t_t), len(robot.default_output_nodes)), 0.05)
        sim = recipes.run_koopman(robot, args.save_dir, t_t, z_t,
                                  sim_duration=args.duration, delay=0.5)
        print(json.dumps({"steps": int(len(sim["t"]))}))
    elif args.recipe == "modal_analysis":
        from soft_robot_control_tpu.sim.modal import modal_decay_batch, mode_shapes

        w, phi = mode_shapes(robot.plant, n_modes=3)
        res = modal_decay_batch(robot.plant, phi.T, amplitudes=[0.05, 0.1],
                                dt=args.dt,
                                save_dir=os.path.join(args.save_dir, "modal"))
        print(json.dumps({"modes_hz": list(np.round(w / (2 * np.pi), 3)),
                          "cases": sorted(res.keys())}))
    elif args.recipe == "calibrate_rest":
        from soft_robot_control_tpu.tasks.calibration import calibrate_rest

        q, v = calibrate_rest(robot.plant, dt=args.dt)
        from soft_robot_control_tpu.utils.io import save_data

        save_data(os.path.join(args.save_dir, "rest.pkl"), {"rest": [q, v]})
        print(json.dumps({"rest_norm": float(np.linalg.norm(q))}))


if __name__ == "__main__":
    main()
