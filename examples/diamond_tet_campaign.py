"""Full-scale Diamond campaign on the shipped reference mesh.

The reference's Diamond pipeline (examples/diamond/diamond.py +
examples/hardware/model.py) at TRUE reference dimensions — 1628 nodes /
9768-dim full state over diamond.vtu — with the SOFA FEM engine replaced by
the in-repo tet-FEM plant (sim/fem_tet.py):

  1. collect_POD_data   : LHS excitation -> snapshots (diamond.py:73-113)
  2. compute_POD_basis  : SVD, tol 5e-5, type 'a'     (diamond.py:116-137)
  3. collect_TPWL_data  : discrete-dictionary TPWL    (diamond.py:140-191)
  4. TPWL_rollout       : held-out fidelity MSE       (hardware/diamond.py:20-73)
  5. run_scp            : GuSTO MPC figure-8 tracking (diamond.py:194-316)
     target: z_x = -20 sin(th) - 5.5, z_y = 10 sin(2 th) + 1.5 relative to
     the post-gravity rest position, Qz=diag(100,100,0), R=1e-5 I,
     U=[0,1500]^4 (diamond.py:277-292).

Artifacts are written in the reference pkl layouts so they interchange with
the reference pipeline. Run on TPU (default platform) in float32; pass
--platform cpu for float64 (slow: ~0.5 s/plant-step single-core).

    python examples/diamond_tet_campaign.py --out examples/diamond_tet
    python examples/diamond_tet_campaign.py --quick   # small smoke campaign
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None,
                    help="cpu to force CPU/float64; default = session TPU")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "diamond_tet"))
    ap.add_argument("--samples", type=int, default=40,
                    help="LHS samples for POD data")
    ap.add_argument("--tpwl-samples", type=int, default=40)
    ap.add_argument("--t-step", type=float, default=0.25)
    ap.add_argument("--threshold", type=float, default=40.0,
                    help="TPWL distance threshold (reduced weighted units)")
    ap.add_argument("--eval-type", default="distance",
                    choices=["distance", "dynamics"],
                    help="dictionary point-selection criterion; 'dynamics' "
                    "adds points on one-step prediction error "
                    "(tpwl_utils.py:199-260)")
    ap.add_argument("--pod-tol", type=float, default=5e-5)
    ap.add_argument("--rom-dim", type=int, default=30,
                    help="explicit POD dimension; the energy tolerance "
                    "alone over-selects on float32 campaign data whose "
                    "singular tail sits at the numerical noise floor")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-collect", action="store_true",
                    help="reuse the committed POD/TPWL artifacts in --out "
                    "(the bench and sharding tests consume the committed "
                    "P=1087 dictionary — don't rebuild it for an MPC rerun)")
    ap.add_argument("--skip-mpc", action="store_true")
    ap.add_argument("--sim-duration", type=float, default=11.0)
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        dtype = "float64"
        # no persistent compile cache on CPU (foreign-host AOT entries hang
        # at load; see trunk_ssm_campaign.py note)
    else:
        dtype = "float32"
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from soft_robot_control_tpu.robots.robots import DiamondTetRobot
    from soft_robot_control_tpu.tasks import recipes

    if args.quick:
        args.samples = 8
        args.tpwl_samples = 8
        args.sim_duration = 3.0

    np_dtype = np.float64 if dtype == "float64" else np.float32
    t0 = time.time()
    robot = DiamondTetRobot(dtype=np_dtype)
    print(f"[{time.time()-t0:6.1f}s] Diamond tet plant: "
          f"{robot.plant.n_nodes} nodes, state dim {robot.plant.state_dim}, "
          f"{robot.plant.input_dim} cables; devices={jax.devices()}",
          flush=True)

    d = args.out
    os.makedirs(d, exist_ok=True)

    # per-stage summary: partial reruns refresh only the fields their stage
    # owns (same provenance rule as the trunk campaign)
    import json
    summary = {}
    summary_path = os.path.join(d, "diamond_tpwl_campaign.json")
    if os.path.exists(summary_path):
        try:
            with open(summary_path) as f:
                summary = json.load(f)
        except (json.JSONDecodeError, OSError):
            summary = {}
    stage_fields = {
        "collect": ["rom_dim", "tpwl_points", "heldout_rel_err",
                    "collect_platform"],
        "mpc": ["scp_rmse_mm", "scp_rmse_unshifted_mm", "scp_solve_ms_mean",
                "scp_plan_rejects", "mpc_platform", "mpc_replan_budget_ms"],
    }
    for stage, skip in (("collect", args.skip_collect),
                        ("mpc", args.skip_mpc)):
        if not skip:
            for k in stage_fields[stage]:
                summary.pop(k, None)

    def _persist():
        with open(summary_path, "w") as f:
            json.dump(summary, f, indent=1)

    if not args.skip_collect:
        snap = recipes.collect_pod_data(robot, d, nbr_samples=args.samples,
                                        t_step=args.t_step)
        print(f"[{time.time()-t0:6.1f}s] POD data: {len(snap['q'])} "
              f"snapshots", flush=True)

        res = recipes.compute_pod_basis(d, pod_tolerance=args.pod_tol,
                                        pod_type="a", rom_dim=args.rom_dim)
        r = res["POD_info"]["U"].shape[1]
        print(f"[{time.time()-t0:6.1f}s] POD basis: r = {r}", flush=True)
        summary["rom_dim"] = int(r)

        model = recipes.collect_tpwl_data(robot, d,
                                          threshold=args.threshold,
                                          nbr_samples=args.tpwl_samples,
                                          t_step=args.t_step,
                                          dynamics="discrete",
                                          eval_type=args.eval_type)
        print(f"[{time.time()-t0:6.1f}s] TPWL dictionary: "
              f"P = {model.num_points} (discrete, dt={robot.dt})", flush=True)
        summary["tpwl_points"] = int(model.num_points)

        chk = recipes.tpwl_rollout_check(robot, d, nbr_samples=6, seed=333,
                                         t_step=args.t_step)
        print(f"[{time.time()-t0:6.1f}s] held-out rollout: MSE "
              f"{chk['mse']:.4g}, rel err {chk['rel_err']:.4f}", flush=True)
        summary["heldout_rel_err"] = float(chk["rel_err"])
        summary["collect_platform"] = dtype
        _persist()

    if args.skip_mpc:
        return

    # figure-8 target around the post-gravity rest tip position
    # (diamond.py:277-281 with the same amplitudes/offsets)
    Hf = robot.get_output_model()          # node-1354 positions (3,)
    z_eq = Hf @ np.asarray(robot.plant.x_rest())
    T_target = args.sim_duration
    tt = np.linspace(0, T_target, 1000)
    th = np.linspace(0, 2 * np.pi * T_target / 10.0, 1000)
    z_target = np.tile(z_eq, (1000, 1))
    z_target[:, 0] += -20.0 * np.sin(th) - 5.5
    z_target[:, 1] += 10.0 * np.sin(2 * th) + 1.5
    Qz = np.diag([100.0, 100.0, 0.0])
    R = 1e-5 * np.eye(4)
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    U = HyperRectangle(1500.0 * np.ones(4), np.zeros(4))

    # Solver runs at the dictionary-native dt (the discrete TPWL maps are
    # exact at dt=0.01; re-discretizing the continuous family at a larger
    # solver dt reintroduces the Galerkin resolvent error at this scale).
    # Real-time configuration: one LOCP per MPC query (max_gusto_iters=0,
    # the reference's diamond_SSM.py:361 setting) with the trust region off
    # — the slacked infinity-norm TR epigraph is ADMM-hostile at these
    # dimensions (the reference resorts to GUROBI for it, diamond.py:316).
    import jax.numpy as jnp
    # oneshot_iters=2 + plan_bound: the fused one-shot's round-3 guards
    # (device-side residual + accuracy gates, one relinearization, planned-
    # output envelope check) — see scp/gusto.py:_build_oneshot
    sim = recipes.run_scp(robot, d, tt, z_target, dt_solver=robot.dt, N=10,
                          N_replan=2, Qz=Qz, R=R,
                          sim_duration=args.sim_duration, delay=1.0, U=U,
                          save_prefix="scp_fig8",
                          max_gusto_iters=0, is_tr_active=False,
                          locp_backend="condensed",
                          oneshot_iters=2, plan_bound=60.0,
                          dtype=jnp.float64 if dtype == "float64"
                          else jnp.float32)
    z = np.asarray(sim["z"])
    t = np.asarray(sim["t"])
    # score vs z_target(t - delay): the controller's plan clock starts at 0
    # when the delay window ends (tpwl/controllers.py:95-117), so the loop
    # tracks the delayed target by construction. The r2 campaign scored the
    # unshifted target and attributed the resulting 12-13 mm to the model —
    # delay-corrected, the same committed sim tracks at ~7.3 mm.
    delay = 1.0
    zt = np.stack([np.interp(t - delay, tt, z_target[:, j])
                   for j in range(3)], axis=1)
    zt0 = np.stack([np.interp(t, tt, z_target[:, j]) for j in range(3)],
                   axis=1)
    active = t >= 1.0
    rmse = float(np.sqrt(np.mean(np.sum(
        (z[active][:, :2] - zt[active][:, :2]) ** 2, axis=1))))
    rmse_unshifted = float(np.sqrt(np.mean(np.sum(
        (z[active][:, :2] - zt0[active][:, :2]) ** 2, axis=1))))
    print(f"[{time.time()-t0:6.1f}s] GuSTO MPC figure-8: tracking RMSE "
          f"{rmse:.3f} mm vs the delay-shifted target ({rmse_unshifted:.3f} "
          f"unshifted) over {active.sum()} steps", flush=True)
    summary["scp_rmse_mm"] = rmse
    summary["scp_rmse_unshifted_mm"] = rmse_unshifted
    summary["mpc_platform"] = dtype
    info = sim.get("info", {})
    if "solve_times" in info and len(info["solve_times"]):
        st = np.asarray(info["solve_times"])
        print(f"         solve times: mean {st.mean()*1e3:.2f} ms, "
              f"max {st.max()*1e3:.2f} ms", flush=True)
        summary["scp_solve_ms_mean"] = float(st.mean() * 1e3)
    summary["scp_plan_rejects"] = int(info.get("plan_rejects", 0))
    # the flown replan cadence (N_replan * dt): the budget a real-time
    # deployment of THIS configuration would have to meet. The sim pauses
    # the world during solves, so solve_ms_mean above is gated against the
    # reference's 300 ms workstation budget, not this number — see
    # tests/test_campaign_artifacts.py.
    summary["mpc_replan_budget_ms"] = 2 * robot.dt * 1e3
    _persist()
    print(f"[{time.time()-t0:6.1f}s] saved diamond_tpwl_campaign.json",
          flush=True)

    # gate + quarantine: failing artifacts must not stay where a snapshot
    # commit can sweep them in (utils/gatekeeper.py)
    from soft_robot_control_tpu.utils.gatekeeper import enforce_gates
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = [summary_path]
    if not args.skip_mpc:
        arts.append(os.path.join(d, "scp_fig8_sim.pkl"))
    if not args.skip_collect:
        arts += [os.path.join(d, "pod_model.pkl"),
                 os.path.join(d, "tpwl_model_snapshots.pkl")]
    rc = enforce_gates([os.path.join(repo, "tests",
                                     "test_campaign_artifacts.py")],
                       arts, d)
    if rc != 0:
        sys.exit(rc)


if __name__ == "__main__":
    main()
