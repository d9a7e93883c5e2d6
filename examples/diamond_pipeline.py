#!/usr/bin/env python
"""End-to-end Diamond pipeline demo: collect data -> POD -> TPWL -> fidelity
check -> GuSTO MPC closed loop -> analysis (the examples/diamond/diamond.py
recipe sequence, SOFA-free).

    python examples/diamond_pipeline.py --save-dir /tmp/diamond --platform cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save-dir", default="/tmp/diamond_demo")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            # solver accuracy targets assume f64 off-TPU
            jax.config.update("jax_enable_x64", True)

    from soft_robot_control_tpu.robots import DiamondRobot
    from soft_robot_control_tpu.tasks import recipes
    from soft_robot_control_tpu.tasks.analysis import summarize
    from soft_robot_control_tpu.tasks.targets import sine_setpoint

    robot = DiamondRobot(n_nodes=10)
    robot.dt = 0.02
    robot.sequences.dt = 0.02
    d = args.save_dir
    os.makedirs(d, exist_ok=True)

    print("1/5 collecting POD snapshots ...")
    snap = recipes.collect_pod_data(robot, d, nbr_samples=15, seed=1)
    print(f"    {len(snap['q'])} snapshots")

    print("2/5 computing POD basis ...")
    res = recipes.compute_pod_basis(d, pod_tolerance=1e-8, pod_type="v")
    print(f"    ROM dim {res['POD_info']['U'].shape[1]}")

    print("3/5 building TPWL dictionary ...")
    model = recipes.collect_tpwl_data(robot, d, threshold=0.4, nbr_samples=15)
    print(f"    {model.num_points} linearization points")

    print("4/5 open-loop fidelity check ...")
    check = recipes.tpwl_rollout_check(robot, d)
    print(f"    rollout MSE vs plant: {check['mse']:.3e}")

    print("5/5 closed-loop GuSTO MPC ...")
    Hf = robot.get_output_model()
    z0 = float((np.asarray(robot.plant.x_rest()) @ Hf.T)[0])
    t_t, z_t = sine_setpoint(T=4.0, duration=12.0, dt=0.02, amplitude=0.05)
    z_t = z_t + z0
    sim = recipes.run_scp(robot, d, t_t, z_t, Qz=np.array([[200.0]]),
                          sim_duration=5.0, delay=0.5)
    stats = summarize(sim, t_t + 0.5, z_t, t_start=1.5)
    print(f"    tracking MSE: {stats['tracking']['mse']:.3e}; "
          f"solve times: {stats['solve_times']}")


if __name__ == "__main__":
    main()
