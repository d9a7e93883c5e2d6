"""Full-scale Trunk TPWL campaign on the shipped reference mesh.

The reference's Trunk pipeline (/root/reference/examples/trunk/trunk.py:154-325)
at TRUE reference dimensions — 709 nodes / 4254-dim state over trunk.vtk, 8
cables — with SOFA replaced by the in-repo tet-FEM plant:

  1. collect_POD_data   : LHS excitation -> snapshots    (trunk.py:76-127)
  2. compute_POD_basis  : SVD                            (trunk.py:130-151)
  3. collect_TPWL_data  : discrete-dictionary TPWL       (trunk.py:154-211)
  4. TPWL_rollout       : held-out fidelity check
  5. run_scp            : GuSTO MPC figure-8 ("infinity sign") tracking
     (trunk.py:213-325): z_x = -10 sin th, z_y = 10 sin 2th around the
     post-gravity rest tip, Qz=diag(100,100,0), R=1e-5 I, U=[0,800]^8.
  6. run_ilqr           : iLQR tracking of the same target (trunk.py:327-
     380; BASELINE config 2 at reference scale).

Platform: runs float32 on the session TPU by default. The trunk plant's
stiffness contrast is ~1e7 and round-2 code NaN'd in f32, but with the
HIGHEST-precision matmul pins and PCG guards now in sim/fem_tet.py the f32
plant is stable on both CPU and TPU (decay + full-amplitude LHS verified
finite); --platform cpu still gives the float64 oracle.

    python examples/trunk_tet_campaign.py --out examples/trunk_tet
    python examples/trunk_tet_campaign.py --quick
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
        os.path.abspath(__file__)), "trunk_tet"))
    ap.add_argument("--samples", type=int, default=40,
                    help="LHS samples for POD data")
    ap.add_argument("--tpwl-samples", type=int, default=40)
    ap.add_argument("--t-step", type=float, default=0.25)
    ap.add_argument("--threshold", type=float, default=15.0)
    ap.add_argument("--rom-dim", type=int, default=30)
    ap.add_argument("--amplitude-scale", type=str, default="0.25",
                    help="LHS excitation amplitude as a fraction of u_max, "
                    "or a comma-separated list of scales (multi-scale "
                    "excitation, one LHS sequence per scale); the reference "
                    "collects Trunk data at max_amplitude=200 of u_max=800 "
                    "(trunk.py:186) — full-amplitude data bends the trunk "
                    "~90 mm and starves the +/-10 mm figure-8 regime of "
                    "dictionary points")
    ap.add_argument("--traj", type=str,
                    default="50:1,100:1.5,150:2,200:2.5,250:3,150:10",
                    help="figure-8 ('infinity sign') excitation segments as "
                    "amp:period pairs, appended to the LHS data exactly like "
                    "the reference's Trunk collection (trunk.py:104-112 POD "
                    "amplitudes 50-450, trunk.py:186-192 TPWL amplitudes "
                    "150-250) — dictionary points along task-like orbits "
                    "are what make the figure-8 MPC track; '' disables")
    ap.add_argument("--solver-N", type=int, default=50,
                    help="MPC horizon steps at the dictionary dt; 50 x "
                    "0.01 s matches the reference's 0.5 s trunk horizon "
                    "(trunk.py: dt=0.1, N=5) — a 0.1 s horizon with cheap "
                    "inputs bang-bangs the loop unstable")
    ap.add_argument("--u-bound", type=float, default=250.0,
                    help="MPC input upper bound (mN). The one-LOCP no-trust-"
                    "region real-time configuration has no mechanism to stop "
                    "the solver extrapolating the TPWL model outside its "
                    "u<=200 training envelope (the reference keeps the full "
                    "GuSTO trust region via GUROBI instead, trunk.py:322); "
                    "bounding U at the data envelope plays that role")
    ap.add_argument("--mpc-R", type=float, default=1e-2,
                    help="MPC input cost weight. The reference's R=1e-5 "
                    "(trunk.py:308) prices inputs at bang-bang: the planned "
                    "model excursion is sub-mm but the 0->250 mN step inputs "
                    "are far outside what the TPWL dictionary (trained on "
                    "smooth figure-8/LHS excitation) can predict — the real "
                    "plant flips within 0.5 s of control start (observed: "
                    "tip +128 mm in y, z 195->3 mm). R=1e-2 keeps the plan "
                    "inside the model's validity regime, like the iLQR leg")
    ap.add_argument("--mpc-dU", type=float, default=0.0,
                    help="per-step input rate bound |u_k+1 - u_k| (mN); the "
                    "reference LOCP supports the same dU polytope "
                    "(scp/locp.py:296-302). 0 disables — matching the "
                    "reference trunk example, which runs without dU "
                    "(trunk.py:213-325). The round-4 in-loop dU mis-solve "
                    "no longer reproduces (tools/diag_trunk_gusto.py --dU "
                    "25 --perturb 0.5: 0/40 rejects, bounded excursions on "
                    "CPU-f32 AND TPU); pinned by "
                    "test_gusto_jit_condensed_dU_warm_belief")
    ap.add_argument("--dU-leg", type=float, default=0.0,
                    help="run an EXTRA MPC leg with this input slew bound "
                    "(mN) under scp_fig8_dU_* and record it in the JSON's "
                    "dU_leg block (the flagship leg stays dU=0, matching "
                    "the reference)")
    ap.add_argument("--mpc-feedback-R", type=float, default=1.0,
                    help="LQR feedback around the GuSTO plan, with per-TPWL-"
                    "point DARE gains computed at this R instead of the MPC "
                    "R (the reference's scp controller keeps feedback ON, "
                    "tpwl/controllers.py:239-246, but builds gains from the "
                    "MPC cost; at R=1e-2..1e-5 those gains amplify the "
                    "trunk's ~16%% ROM error into cable saturation — R=1.0 "
                    "is the same moderate-gain choice that makes the iLQR "
                    "leg fly at 2 mm). 0 disables feedback (round-4 "
                    "configuration: pure feedforward + replan; 60 mm RMSE "
                    "because rejected plans replay open-loop)")
    ap.add_argument("--ilqr-feedback-R", type=float, default=None,
                    help="decouple the iLQR EXECUTION feedback gains from "
                    "the planning R: gains recomputed along the converged "
                    "plan by a tracking-LQR pass at this R (inf = pure "
                    "feedforward replay; default keeps the iLQR gains)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-collect", action="store_true",
                    help="reuse the existing POD/TPWL artifacts in --out")
    ap.add_argument("--skip-pod", action="store_true",
                    help="reuse the existing POD basis in --out but rebuild "
                    "the TPWL dictionary + fidelity checks (resume a "
                    "collection that died between the POD and TPWL stages)")
    ap.add_argument("--skip-mpc", action="store_true")
    ap.add_argument("--skip-ilqr", action="store_true")
    ap.add_argument("--sim-duration", type=float, default=11.0)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
    else:
        dtype = "float32"
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from soft_robot_control_tpu.robots.robots import TrunkTetRobot
    from soft_robot_control_tpu.tasks import recipes

    if args.quick:
        args.samples = 6
        args.tpwl_samples = 6
        args.sim_duration = 3.0

    amp = [float(v) for v in str(args.amplitude_scale).split(",")]
    args.amplitude_scale = amp if len(amp) > 1 else amp[0]
    traj = tuple(tuple(float(x) for x in seg.split(":"))
                 for seg in args.traj.split(",") if seg)

    np_dtype = np.float64 if dtype == "float64" else np.float32
    t0 = time.time()
    robot = TrunkTetRobot(dtype=np_dtype)
    print(f"[{time.time()-t0:6.1f}s] Trunk tet plant: "
          f"{robot.plant.n_nodes} nodes, state dim {robot.plant.state_dim}, "
          f"{robot.plant.input_dim} cables; devices={jax.devices()}",
          flush=True)

    d = args.out
    os.makedirs(d, exist_ok=True)
    # partial reruns (--skip-collect / --skip-mpc / --skip-ilqr) refresh only
    # their own fields; start from the previous summary so the rest survive
    summary = {}
    summary_path = os.path.join(d, "trunk_tpwl_campaign.json")
    if os.path.exists(summary_path):
        try:
            with open(summary_path) as f:
                summary = json.load(f)
        except (json.JSONDecodeError, OSError):
            summary = {}
    # each stage owns its fields: drop them up front when the stage will
    # run (a partial rerun must not leave stale numbers beside fresh ones)
    # and record the platform per stage instead of one global key
    summary.pop("platform", None)
    stage_fields = {
        "collect": ["rom_dim", "tpwl_points", "heldout_rel_err",
                    "heldout_traj_rel_err", "collect_platform"],
        "mpc": ["scp_rmse_mm", "scp_solve_ms_mean", "scp_plan_rejects",
                "mpc_platform", "mpc_R", "mpc_dU", "mpc_feedback_R",
                "mpc_replan_budget_ms", "scp_reject_reasons",
                "scp_tip_span_mm"],
        "ilqr": ["ilqr_rmse_mm", "ilqr_platform", "ilqr_feedback_R"],
    }
    for stage, skip in (("collect", args.skip_collect),
                        ("mpc", args.skip_mpc), ("ilqr", args.skip_ilqr)):
        if not skip:
            for k in stage_fields[stage]:
                summary.pop(k, None)
    if args.dU_leg > 0:
        summary.pop("dU_leg", None)

    if not args.skip_collect:
        if not args.skip_pod:
            snap = recipes.collect_pod_data(robot, d,
                                            nbr_samples=args.samples,
                                            t_step=args.t_step,
                                            amplitude_scale=args.amplitude_scale,
                                            traj=traj)
            print(f"[{time.time()-t0:6.1f}s] POD data: {len(snap['q'])} "
                  f"snapshots", flush=True)

            res = recipes.compute_pod_basis(d, pod_tolerance=5e-5,
                                            pod_type="a",
                                            rom_dim=args.rom_dim)
            r = res["POD_info"]["U"].shape[1]
        else:
            from soft_robot_control_tpu.rom.pod import load_POD
            r = load_POD(os.path.join(d, "pod_model.pkl")).rom_dim
        print(f"[{time.time()-t0:6.1f}s] POD basis: r = {r}", flush=True)
        summary["rom_dim"] = int(r)

        model = recipes.collect_tpwl_data(robot, d,
                                          threshold=args.threshold,
                                          nbr_samples=args.tpwl_samples,
                                          t_step=args.t_step,
                                          dynamics="discrete",
                                          amplitude_scale=args.amplitude_scale,
                                          traj=traj)
        print(f"[{time.time()-t0:6.1f}s] TPWL dictionary: "
              f"P = {model.num_points}", flush=True)
        summary["tpwl_points"] = int(model.num_points)

        chk = recipes.tpwl_rollout_check(robot, d, nbr_samples=6, seed=333,
                                         t_step=args.t_step,
                                         amplitude_scale=args.amplitude_scale)
        print(f"[{time.time()-t0:6.1f}s] held-out rollout: MSE "
              f"{chk['mse']:.4g}, rel err {chk['rel_err']:.4f}", flush=True)
        summary["heldout_rel_err"] = float(chk["rel_err"])
        # task-regime fidelity: a figure-8 excitation at a HELD-OUT
        # amplitude/period between the training segments
        chk2 = recipes.tpwl_rollout_check(robot, d, traj=(175.0, 2.25))
        print(f"[{time.time()-t0:6.1f}s] held-out fig-8 rollout: MSE "
              f"{chk2['mse']:.4g}, rel err {chk2['rel_err']:.4f}", flush=True)
        summary["heldout_traj_rel_err"] = float(chk2["rel_err"])
        summary["collect_platform"] = dtype

    if args.skip_collect:
        # the dictionary on disk may have been pruned since collection
        # (tools/prune_tpwl_dict.py) — refresh its provenance fields so the
        # committed summary describes the artifact actually flown
        import pickle
        with open(os.path.join(d, "tpwl_model_snapshots.pkl"), "rb") as f:
            dinfo = pickle.load(f).get("info", {})
        if "nbr_lin" in dinfo:
            summary["tpwl_points"] = int(dinfo["nbr_lin"])
        if "pruned_from" in dinfo:
            summary["tpwl_pruned_from"] = int(dinfo["pruned_from"])

    # figure-8 "infinity sign" target around the post-gravity rest tip
    # (trunk.py:299-303: -10 sin th / 10 sin 2th, period 10 s)
    Hf = robot.get_output_model()          # node-51 position (3,)
    z_eq = Hf @ np.asarray(robot.plant.x_rest())
    T_target = args.sim_duration + 4.0
    npts = 1000
    tt = np.linspace(0, T_target, npts)
    th = 2 * np.pi * tt / 10.0
    z_target = np.tile(z_eq, (npts, 1))
    z_target[:, 0] += -10.0 * np.sin(th)
    z_target[:, 1] += 10.0 * np.sin(2 * th)
    Qz = np.diag([100.0, 100.0, 0.0])
    R = args.mpc_R * np.eye(8)
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    U = HyperRectangle(args.u_bound * np.ones(8), np.zeros(8))
    dU = None if args.mpc_dU <= 0 else HyperRectangle(
        args.mpc_dU * np.ones(8), -args.mpc_dU * np.ones(8))

    import jax.numpy as jnp
    jdtype = jnp.float64 if dtype == "float64" else jnp.float32

    if not args.skip_mpc:
        # device_tr=True: the FULL trust-region SCP loop runs on device
        # (scp/gusto_jit.py lax.while_loop) — one dispatch per MPC query
        # with the reference's TR semantics intact (trunk.py:322 keeps the
        # GuSTO trust region via GUROBI for exactly this robot). The
        # one-LOCP no-TR real-time mode cannot police model extrapolation
        # on a piecewise-linear model: the Taylor gate rho_k is ~0 by
        # construction, so the solver happily planned 170-380 mm excursions
        # on a 195 mm trunk (round-3 regression). plan_bound stays as a
        # belt-and-braces reject (40 mm envelope around the +-10/12.5 mm
        # figure-8 target).
        # feedback at moderate gains (--mpc-feedback-R, default 1.0): the
        # reference's scp controller closes LQR feedback around the plan
        # (tpwl/controllers.py:326-333); building those DARE gains from the
        # MPC cost itself (R<=1e-2) amplifies the trunk's ~16% ROM error
        # into cable saturation, and pure feedforward (round 4) flies the
        # stale plan open-loop whenever a solve is rejected. Gains at R=1.0
        # — the iLQR leg's working execution config — keep the plant ON the
        # plan between replans, which also keeps the EKF belief inside the
        # solver's validity regime (rejects drop from 246/500 to ~0).
        fbR = args.mpc_feedback_R
        sim = recipes.run_scp(robot, d, tt, z_target, dt_solver=robot.dt,
                              N=args.solver_N, N_replan=2, Qz=Qz, R=R,
                              sim_duration=args.sim_duration, delay=1.0,
                              U=U, dU=dU, save_prefix="scp_fig8",
                              locp_backend="condensed", dtype=jdtype,
                              device_tr=True, plan_bound=40.0,
                              u_sat=args.u_bound,
                              feedback=fbR > 0,
                              feedback_R=fbR if fbR > 0 else None)
        z = np.asarray(sim["z"])
        t = np.asarray(sim["t"])
        # score vs z_target(t - delay): the controller plan clock starts at
        # 0 when the delay window ends (tpwl/controllers.py:95-117)
        zt = np.stack([np.interp(t - 1.0, tt, z_target[:, j])
                       for j in range(3)], axis=1)
        act = t >= 1.0
        rmse = float(np.sqrt(np.mean(np.sum(
            (z[act][:, :2] - zt[act][:, :2]) ** 2, axis=1))))
        print(f"[{time.time()-t0:6.1f}s] GuSTO MPC figure-8: tracking RMSE "
              f"{rmse:.3f} mm (vs delay-shifted target)", flush=True)
        summary["scp_rmse_mm"] = rmse
        summary["mpc_platform"] = dtype
        summary["scp_plan_rejects"] = int(sim.get("info", {}).get(
            "plan_rejects", 0))
        rej = sim.get("info", {}).get("reject_log", [])
        summary["scp_reject_reasons"] = {
            r: sum(1 for e in rej if e.get("reason") == r)
            for r in {e.get("reason") for e in rej}}
        summary["mpc_R"] = args.mpc_R
        summary["mpc_dU"] = args.mpc_dU
        summary["mpc_feedback_R"] = args.mpc_feedback_R
        # the flown replan cadence: the budget a real-time deployment of
        # THIS configuration would have to meet (N_replan * dt)
        summary["mpc_replan_budget_ms"] = 2 * robot.dt * 1e3
        # tip excursion envelope over the active window, all axes (the
        # round-4 blow-up metric: 258/230/348 mm on a 195 mm robot)
        summary["scp_tip_span_mm"] = [
            float(np.ptp(z[act][:, j])) for j in range(3)]
        st = np.asarray(sim.get("info", {}).get("solve_times", []))
        if st.size:
            summary["scp_solve_ms_mean"] = float(st.mean() * 1e3)

    if args.dU_leg > 0:
        # dU demonstration leg: same closed loop with the input slew
        # polytope active (|u_{k+1}-u_k| <= dU mN). The reference trunk
        # example flies without dU; this leg evidences that the device-TR
        # condensed path solves in-loop dU QPs correctly (round-4 note
        # retired; regression: test_gusto_jit_condensed_dU_warm_belief).
        dU2 = HyperRectangle(args.dU_leg * np.ones(8),
                             -args.dU_leg * np.ones(8))
        fbR = args.mpc_feedback_R
        sim2 = recipes.run_scp(robot, d, tt, z_target, dt_solver=robot.dt,
                               N=args.solver_N, N_replan=2, Qz=Qz, R=R,
                               sim_duration=args.sim_duration, delay=1.0,
                               U=U, dU=dU2, save_prefix="scp_fig8_dU",
                               locp_backend="condensed", dtype=jdtype,
                               device_tr=True, plan_bound=40.0,
                               u_sat=args.u_bound, feedback=fbR > 0,
                               feedback_R=fbR if fbR > 0 else None)
        z2 = np.asarray(sim2["z"])
        t2 = np.asarray(sim2["t"])
        zt2 = np.stack([np.interp(t2 - 1.0, tt, z_target[:, j])
                        for j in range(3)], axis=1)
        act2 = t2 >= 1.0
        rmse2 = float(np.sqrt(np.mean(np.sum(
            (z2[act2][:, :2] - zt2[act2][:, :2]) ** 2, axis=1))))
        u2 = np.asarray(sim2["u"])
        st2 = np.asarray(sim2.get("info", {}).get("solve_times", []))
        summary["dU_leg"] = {
            "dU_mN": float(args.dU_leg),
            "scp_rmse_mm": rmse2,
            "plan_rejects": int(sim2.get("info", {}).get("plan_rejects", 0)),
            "applied_du_max_mN": float(np.abs(np.diff(u2, axis=0)).max()),
            "solve_ms_mean": (float(st2.mean() * 1e3) if st2.size else None),
        }
        print(f"[{time.time()-t0:6.1f}s] GuSTO MPC dU-leg (dU={args.dU_leg} "
              f"mN): RMSE {rmse2:.3f} mm, rejects "
              f"{summary['dU_leg']['plan_rejects']}", flush=True)

    if not args.skip_ilqr:
        # BASELINE config 2: Trunk iLQR on the TPWL ROM (trunk.py:327-380)
        # u_sat bounds the applied command at the dictionary's training
        # envelope — the LQR feedback term is invisible to the planner's U
        # bound, and unsaturated it pins all 8 cables at the 800 plant limit
        # once model error accumulates (see _run_and_save docstring)
        # R=1e-2 (the recipe default): iLQR's time-varying feedback gains
        # scale like sqrt(Q/R), and at R=1e-4 trunk ROM error (~16% held-out)
        # through those gains saturates all 8 cables and flies the plant
        # (45.6 mm RMSE, 334 mm z-span observed); the cheap-input planning
        # benefit is nil once u_sat clips at the training envelope anyway
        sim = recipes.run_ilqr(robot, d, tt, z_target, Qz=Qz,
                               R=1e-2 * np.eye(8),
                               sim_duration=args.sim_duration, delay=1.0,
                               tf=args.sim_duration, save_prefix="ilqr_fig8",
                               u_sat=args.u_bound,
                               feedback_R=args.ilqr_feedback_R)
        z = np.asarray(sim["z"])
        t = np.asarray(sim["t"])
        zt = np.stack([np.interp(t - 1.0, tt, z_target[:, j])
                       for j in range(3)], axis=1)
        act = t >= 1.0
        rmse = float(np.sqrt(np.mean(np.sum(
            (z[act][:, :2] - zt[act][:, :2]) ** 2, axis=1))))
        print(f"[{time.time()-t0:6.1f}s] iLQR figure-8: tracking RMSE "
              f"{rmse:.3f} mm (vs delay-shifted target)", flush=True)
        summary["ilqr_rmse_mm"] = rmse
        summary["ilqr_platform"] = dtype
        if args.ilqr_feedback_R is not None:
            summary["ilqr_feedback_R"] = args.ilqr_feedback_R

    with open(os.path.join(d, "trunk_tpwl_campaign.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"[{time.time()-t0:6.1f}s] saved trunk_tpwl_campaign.json",
          flush=True)

    # fail loudly if this run regressed its own committed quality gates, and
    # QUARANTINE the failing artifacts so a snapshot commit cannot sweep
    # them in (round-4 lesson: the gate script existed and red artifacts
    # were committed anyway)
    from soft_robot_control_tpu.utils.gatekeeper import enforce_gates
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = [summary_path]
    if not args.skip_mpc:
        arts.append(os.path.join(d, "scp_fig8_sim.pkl"))
    if args.dU_leg > 0:
        arts.append(os.path.join(d, "scp_fig8_dU_sim.pkl"))
    if not args.skip_ilqr:
        arts.append(os.path.join(d, "ilqr_fig8_sim.pkl"))
    if not args.skip_collect:
        arts += [os.path.join(d, "pod_model.pkl"),
                 os.path.join(d, "tpwl_model_snapshots.pkl")]
    rc = enforce_gates([os.path.join(repo, "tests",
                                     "test_trunk_campaign_artifacts.py")],
                       arts, d)
    if rc != 0:
        sys.exit(rc)


if __name__ == "__main__":
    main()
