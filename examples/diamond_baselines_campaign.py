"""Diamond baselines campaign: Koopman MPC and ROMPC closed loops on the
full-scale Diamond tet plant (1628 nodes / 9768-dim state).

The reference demonstrates both baselines only against SOFA:
  - Koopman: /root/reference/examples/hardware/diamond_koopman.py:43-461
    (MATLAB-trained lifted model + linear MPC ROS node)
  - ROMPC:   /root/reference/examples/diamond/diamond_rompc.py:90-145
    (single-linearization ROM + Luenberger observer + linear MPC)

Here both run end-to-end in-repo at reference scale: the Koopman model is
trained natively (EDMD, models/koopman.py:train_edmd) from tet-plant data,
and ROMPC consumes the committed campaign TPWL dictionary
(examples/diamond_tet/tpwl_model_snapshots.pkl). Both track the reference's
circular/figure-8 tip targets and report tracking RMSE; results are
persisted to diamond_baselines.json.

    python examples/diamond_baselines_campaign.py --out examples/diamond_tet
    python examples/diamond_baselines_campaign.py --quick
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu forces CPU/float64; default = session TPU f32")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "diamond_tet"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sim-duration", type=float, default=11.0)
    ap.add_argument("--koopman-samples", type=int, default=60)
    ap.add_argument("--skip-koopman", action="store_true")
    ap.add_argument("--skip-rompc", action="store_true")
    ap.add_argument("--qp-backend", default="pallas",
                    choices=["xla", "pallas"],
                    help="fused LTI QP solver: 'pallas' runs the whole "
                    "fixed-iteration staged ADMM in one VMEM-resident "
                    "kernel launch (the batched-MPC headline solver, "
                    "VERDICT r4 #9); 'xla' is the adaptive residual-driven "
                    "solve_qp_dense oracle. The campaign gate "
                    "(test_diamond_baselines_gates) judges tracking + "
                    "solve-time either way")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        np_dtype_name = "float64"
    else:
        np_dtype_name = "float32"
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from soft_robot_control_tpu.robots.robots import DiamondTetRobot
    from soft_robot_control_tpu.tasks import recipes

    if args.quick:
        args.sim_duration = 3.0
        args.koopman_samples = 16

    np_dtype = np.float64 if np_dtype_name == "float64" else np.float32
    t0 = time.time()
    robot = DiamondTetRobot(dtype=np_dtype)
    print(f"[{time.time()-t0:6.1f}s] Diamond tet plant: "
          f"{robot.plant.n_nodes} nodes, state dim {robot.plant.state_dim}, "
          f"{robot.plant.input_dim} cables; devices={jax.devices()}",
          flush=True)

    d = args.out
    if not os.path.exists(os.path.join(d, "tpwl_model_snapshots.pkl")):
        raise SystemExit("run examples/diamond_tet_campaign.py first "
                         "(needs the committed TPWL dictionary)")

    Hf = robot.get_output_model()           # tip node 1354 position
    z_eq = Hf @ np.asarray(robot.plant.x_rest())
    T_target = args.sim_duration + 4.0
    tt = np.arange(0, T_target, robot.dt)
    th = 2 * np.pi * tt / 10.0
    # the reference ROMPC/Koopman demos track the same family of tip
    # targets as run_scp; keep the figure-8 for comparability with the
    # committed scp_fig8 result (diamond.py:277-281 amplitudes)
    z_target = np.tile(z_eq, (len(tt), 1))
    z_target[:, 0] += -15.0 * np.sin(th)
    z_target[:, 1] += 7.5 * np.sin(2 * th)

    results = {}

    def score(sim):
        """Tracking RMSE vs the delay-shifted target + mean solve time."""
        z = np.asarray(sim["z"])
        t = np.asarray(sim["t"])
        zt = np.stack([np.interp(t - 1.0, tt, z_target[:, j])
                       for j in range(3)], axis=1)
        act = t >= 2.0
        rmse = float(np.sqrt(np.mean(np.sum(
            (z[act][:, :2] - zt[act][:, :2]) ** 2, axis=1))))
        st = np.asarray(sim.get("info", {}).get("solve_times", []))
        return {"tracking_rmse_mm": rmse,
                "solve_ms_mean": float(st.mean() * 1e3) if st.size else None}

    def rescore_existing(prefix):
        """A skipped leg keeps its previously-computed result (re-scored
        from the persisted sim pkl) instead of dropping out of the JSON."""
        import pickle
        p = os.path.join(d, f"{prefix}_sim.pkl")
        if os.path.exists(p):
            with open(p, "rb") as f:
                return score(pickle.load(f))
        return None

    # ---- ROMPC ----------------------------------------------------------
    if args.skip_rompc:
        r = rescore_existing("rompc")
        if r is not None:
            results["rompc"] = r
            print(f"[{time.time()-t0:6.1f}s] ROMPC (re-scored from existing "
                  f"sim): RMSE {r['tracking_rmse_mm']:.2f} mm", flush=True)
    else:
        Qz = np.diag([100.0, 100.0, 0.0])
        R = 1e-4 * np.eye(4)
        backend = "dense" if np_dtype_name == "float64" else "condensed"
        sim = recipes.run_rompc(robot, d, tt, z_target, N=20, N_replan=4,
                                Qz=Qz, R=R, sim_duration=args.sim_duration,
                                delay=1.0, save_prefix="rompc",
                                locp_backend=backend,
                                qp_backend=args.qp_backend)
        results["rompc"] = score(sim)
        print(f"[{time.time()-t0:6.1f}s] ROMPC figure-8: RMSE "
              f"{results['rompc']['tracking_rmse_mm']:.2f} mm", flush=True)

    # ---- Koopman --------------------------------------------------------
    if args.skip_koopman:
        r = rescore_existing("koopman")
        if r is not None:
            results["koopman"] = r
            print(f"[{time.time()-t0:6.1f}s] Koopman (re-scored from existing"
                  f" sim): RMSE {r['tracking_rmse_mm']:.2f} mm", flush=True)
    else:
        # run_koopman trains natively (EDMD) and tracks targets in the
        # model's scaled output coordinates; pass absolute tip targets and
        # let the recipe normalize with the training scaling
        backend = "dense" if np_dtype_name == "float64" else "condensed"
        sim = recipes.run_koopman(
            robot, d, tt, z_target, delay_embed=1, degree=2, N=10,
            rollout_horizon=4, sim_duration=args.sim_duration, delay=1.0,
            nbr_samples=args.koopman_samples, save_prefix="koopman",
            absolute_targets=True, locp_backend=backend,
            qp_backend=args.qp_backend)
        results["koopman"] = score(sim)
        print(f"[{time.time()-t0:6.1f}s] Koopman MPC figure-8: RMSE "
              f"{results['koopman']['tracking_rmse_mm']:.2f} mm", flush=True)

    results["figure8_amp_mm"] = [15.0, 7.5]
    results["sim_duration_s"] = args.sim_duration
    results["platform"] = np_dtype_name
    results["qp_backend"] = args.qp_backend
    with open(os.path.join(d, "diamond_baselines.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"[{time.time()-t0:6.1f}s] saved diamond_baselines.json", flush=True)

    # gate + quarantine (utils/gatekeeper.py)
    from soft_robot_control_tpu.utils.gatekeeper import enforce_gates
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = [os.path.join(d, "diamond_baselines.json")]
    for prefix, skip in (("rompc", args.skip_rompc),
                         ("koopman", args.skip_koopman)):
        if not skip:
            arts.append(os.path.join(d, f"{prefix}_sim.pkl"))
    rc = enforce_gates([os.path.join(repo, "tests",
                                     "test_campaign_artifacts.py")],
                       arts, d, k="baselines")
    if rc != 0:
        sys.exit(rc)


if __name__ == "__main__":
    main()
