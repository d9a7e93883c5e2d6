"""Trunk SSM campaign: native SSM identification + nonlinear MPC at
reference scale (BASELINE config 4, "Trunk SSM").

The reference identifies SSM models by exporting decay CSVs to MATLAB
SSMLearn (examples/diamond/SSM_sysID.py -> SSM_model.mat); here the whole
campaign runs in-repo on the tet-FEM Trunk (709 nodes / 4254-dim state over
the shipped trunk.vtk, sim/fem_tet.py):

  1. decay campaign        : hold each cable pattern, release, record tip
                             [q; v] decays (SSM_sysID.py role)
  2. native SSM fit        : models/ssm_learn.py — 6-dim spectral subspace,
                             cubic chart/parametrization/reduced dynamics,
                             input matrices from actuated runs
  3. open-loop validation  : held-out actuated trajectory prediction
  4. closed-loop SSM MPC   : scp_ssm + manifold observer + GuSTO
                             (max_gusto_iters=0: one LOCP per query, the
                             diamond_SSM.py:361 real-time configuration)
                             tracking a tip circle ON THE TET PLANT.

    python examples/trunk_ssm_campaign.py --out examples/trunk_tet
    python examples/trunk_ssm_campaign.py --quick
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tip_qv_output(num_nodes: int, node: int):
    """C matrix producing z = [q_tip; v_tip] from x = [v; q] (the [q; v]
    output ordering models/ssm.py expects, measurement_models.py qv=True)."""
    import numpy as np
    C = np.zeros((6, 6 * num_nodes))
    for k in range(3):
        C[k, 3 * num_nodes + 3 * node + k] = 1.0      # q block of x
        C[3 + k, 3 * node + k] = 1.0                  # v block of x
    return C


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "trunk_tet"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--amp", type=float, default=200.0,
                    help="cable hold amplitude for decays (mN)")
    ap.add_argument("--sim-duration", type=float, default=6.0)
    ap.add_argument("--skip-mpc", action="store_true")
    ap.add_argument("--fresh-data", action="store_true",
                    help="re-run the plant sims even if sysid_data.pkl exists")
    ap.add_argument("--half-levels", action="store_true",
                    help="add half-amplitude single-cable decay levels "
                    "(richer data, but a 12-run batch shape that misses "
                    "the compile cache)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        np_dtype_name = "float64"
        # NOTE: no persistent compilation cache on CPU — entries written on
        # a different host CPU hang/miscompile at load (cpu_aot_loader
        # machine-feature mismatch); the cache is for the remote TPU
        # compiler only.
    else:
        np_dtype_name = "float32"
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp
    from soft_robot_control_tpu.robots.robots import TrunkTetRobot
    from soft_robot_control_tpu.tasks.sysid_export import train_ssm_native
    from soft_robot_control_tpu.models import ssm as ssm_mod
    from soft_robot_control_tpu.models.ssm_learn import save_mat, to_mat_dict

    np_dtype = np.float64 if np_dtype_name == "float64" else np.float32
    t0 = time.time()
    robot = TrunkTetRobot(dtype=np_dtype)
    plant = robot.plant
    print(f"[{time.time()-t0:6.1f}s] Trunk tet plant: {plant.n_nodes} nodes, "
          f"state dim {plant.state_dim}, {plant.input_dim} cables; "
          f"devices={jax.devices()}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    tip = 51  # reference tip node (examples/trunk/trunk.py:181)
    Hf = tip_qv_output(plant.n_nodes, tip)

    # decay campaign: single long-cable holds + combinations (mirrors the
    # per-cable decay sweep of SSM_sysID.py)
    amp = args.amp
    levels = []
    for i in range(4):  # long cables bend in 4 directions
        lv = np.zeros(8)
        lv[i] = amp
        levels.append(lv)
    if args.half_levels:
        # half-amplitude singles: radial richness near the task envelope
        # (the diamond campaign's recipe). Off by default: the 8-level
        # batch shape matches the persistent-compile-cache entries, and
        # the dev tunnel's remote compile service can be unavailable —
        # cache-hit shapes are the only ones that run during an outage.
        for i in range(4):
            lv = np.zeros(8)
            lv[i] = 0.5 * amp
            levels.append(lv)
    levels += [np.array([amp, amp, 0, 0, 0, 0, 0, 0.]) / 1.5,
               np.array([0, amp, amp, 0, 0, 0, 0, 0.]) / 1.5,
               np.array([0, 0, amp, amp, 0, 0, 0, 0.]) / 1.5,
               np.array([amp, 0, 0, amp, 0, 0, 0, 0.]) / 1.5]
    if args.quick:
        levels = levels[:4]

    # actuated runs for the B fit: smooth multi-sine inputs. Length matches
    # the decay sims exactly so the whole campaign compiles ONE scan shape.
    dt = robot.dt
    hold_t = 1.5 if args.quick else 2.5
    decay_t = 2.5 if args.quick else 4.0
    T_act = int(round((hold_t + decay_t) / dt))
    tt = dt * np.arange(T_act)
    # batch sizes match the decay batch so the whole campaign reuses ONE
    # compiled batched-sim program (each distinct batch shape costs minutes
    # of single-core XLA compile at this mesh scale).
    # Excitation design: per-cable INDIVIDUAL runs first (the reference's
    # individual_actuation concept, open_loop_sequences.py) — driving all
    # cables with correlated always-positive sines leaves the input-matrix
    # regression unable to separate per-cable directions (a model trained
    # that way believed all four cables bend the trunk the same way).
    rng = np.random.default_rng(0)
    acts = []
    for k in range(len(levels)):
        u = np.zeros((T_act, 8))
        if k < 4:      # single long cable
            fr = 0.4 + 0.2 * k
            u[:, k] = 0.5 * amp * (1 + np.sin(2 * np.pi * fr * tt))
        else:          # mixed pair
            i, j = (k - 4) % 4, (k - 3) % 4
            u[:, i] = 0.4 * amp * (1 + np.sin(2 * np.pi * 0.5 * tt))
            u[:, j] = 0.4 * amp * (1 + np.sin(2 * np.pi * 0.7 * tt
                                              + rng.uniform(0, 2 * np.pi)))
        acts.append(u)

    # sysid data cache: the plant sims dominate campaign time on the
    # single-core CPU; model-fitting iterations reuse them
    import pickle
    cache_f = os.path.join(args.out, "sysid_data.pkl")
    if os.path.exists(cache_f) and not args.fresh_data:
        with open(cache_f, "rb") as f:
            blob = pickle.load(f)
        decays, acts_data = blob["decays"], blob["acts"]
        print(f"[{time.time()-t0:6.1f}s] sysid data loaded from cache",
              flush=True)
    else:
        from soft_robot_control_tpu.tasks.sysid_export import (
            collect_actuated_trajectories, collect_decay_trajectories)
        decays = collect_decay_trajectories(plant, Hf, levels,
                                            hold_time=hold_t,
                                            decay_time=decay_t, dt=dt)
        acts_data = collect_actuated_trajectories(plant, Hf, acts, dt=dt)
        with open(cache_f, "wb") as f:
            pickle.dump({"decays": decays, "acts": acts_data}, f)
        print(f"[{time.time()-t0:6.1f}s] sysid data collected + cached",
              flush=True)

    from soft_robot_control_tpu.models.ssm_learn import learn_ssm
    z_eq = np.asarray(Hf) @ np.asarray(plant.x_rest())
    # ridge candidates up to 1e4: the 200 mN decays swing the tip +-130 mm,
    # so cubic monomials of the ~100-scale reduced coordinates give normal
    # equations with ~1e-22 rcond — only heavily Jacobi-scaled-regularized
    # fits are stable on this data (holdout still picks the weight)
    try:
        model = learn_ssm([z[5:] for _, z in decays], dt, state_dim=6,
                          SSM_order=3, ROM_order=3, n_delay=0, z_ref=z_eq,
                          actuated_trajs=[z for z, _ in acts_data],
                          input_trajs=[u for _, u in acts_data],
                          ridge=[1e-8, 1e-6, 1e-4, 1e-2, 1.0, 1e2, 1e4],
                          joint_fit=True)
    except RuntimeError as e:
        art_path = os.path.join(args.out, "trunk_SSM_model.mat")
        if not os.path.exists(art_path):
            raise
        print(f"[{time.time()-t0:6.1f}s] fit FAILED ({e}); continuing MPC "
              "with the previously accepted artifact", flush=True)
        model = ssm_mod.from_mat(art_path, None, discrete=False,
                                 discr_method="be")
    print(f"[{time.time()-t0:6.1f}s] SSM trained: state_dim "
          f"{model.state_dim}", flush=True)

    # ---- acceptance gate #1: unforced decay must contract --------------
    # (the module_test accept-gate pattern of
    # /root/reference/examples/hardware/diamond_SSM.py:21-140; mirrors
    # tests/test_trunk_ssm.py::test_trunk_ssm_dims_and_stability so an
    # unstable fit is never committed)
    x0_stab = model.observed_to_reduced(jnp.asarray(2.0 * np.ones(6)))
    xs_stab, _ = model.rollout(x0_stab, jnp.zeros((200, 8)), 0.01)
    n0 = float(jnp.linalg.norm(xs_stab[0]))
    nT = float(jnp.linalg.norm(xs_stab[-1]))
    stable = bool(np.isfinite(nT) and nT < n0)
    print(f"[{time.time()-t0:6.1f}s] stability gate: |x| {n0:.3f} -> "
          f"{nT:.3f} over 200 unforced steps -> "
          f"{'PASS' if stable else 'FAIL'}", flush=True)

    # held-out actuated validation
    from soft_robot_control_tpu.tasks.sysid_export import (
        collect_actuated_trajectories)
    u_tests = []
    for k in range(len(levels)):   # same batch size -> same compiled program
        ph = rng.uniform(0, 2 * np.pi, 8)
        u_t = 0.4 * amp * (1 + np.sin(2 * np.pi * 0.5 * tt[:, None]
                                      + ph[None, :]))
        u_t[:, 4:] = 0.0
        u_tests.append(u_t)
    tests = collect_actuated_trajectories(plant, Hf, u_tests, dt=dt)
    rels = []
    for z_true, u_test in tests:
        x0 = model.observed_to_reduced(jnp.asarray(
            z_true[0] - np.asarray(model.z_ref)))
        xs = [np.asarray(x0)]
        for i in range(len(u_test) - 1):
            xs.append(np.asarray(model.update_state(
                jnp.asarray(xs[-1]), jnp.asarray(u_test[i], jnp.float64),
                dt)))
        z_pred = np.asarray(jax.vmap(model.reduced_to_observed)(
            jnp.asarray(np.stack(xs)))) + np.asarray(model.z_ref)
        err = np.linalg.norm(z_pred[:, :3] - z_true[:, :3], axis=1)
        motion = np.linalg.norm(z_true[:, :3] - z_true[0, :3], axis=1)
        rels.append(float(np.sqrt(np.mean(err**2))
                          / max(motion.max(), 1e-9)))
    rel = float(np.mean(rels))
    print(f"[{time.time()-t0:6.1f}s] held-out actuated tip prediction "
          f"rel RMS mean {rel:.3f} over {len(rels)} runs "
          f"({['%.3f' % r for r in rels]})", flush=True)

    # ---- acceptance gate #2: held-out fidelity; persist only if BOTH ----
    # gates pass (never overwrite a committed artifact with a worse fit)
    accept = stable and rel < 0.6
    art_path = os.path.join(args.out, "trunk_SSM_model.mat")
    if accept:
        save_mat(model, art_path)
        print(f"[{time.time()-t0:6.1f}s] gates PASS -> saved "
              f"trunk_SSM_model.mat", flush=True)
    else:
        rej_path = os.path.join(args.out, "trunk_SSM_model.rejected.mat")
        save_mat(model, rej_path)
        print(f"[{time.time()-t0:6.1f}s] gates FAIL (stable={stable}, "
              f"held-out rel {rel:.3f}) -> artifact NOT persisted; fit "
              f"written to {os.path.basename(rej_path)} for inspection",
              flush=True)
        if not os.path.exists(art_path):
            raise SystemExit(1)
        model = ssm_mod.from_mat(art_path, None, discrete=False,
                                 discr_method="be")
        print(f"[{time.time()-t0:6.1f}s] continuing MPC with the previously "
              f"accepted artifact", flush=True)

    if args.skip_mpc:
        return

    # closed-loop SSM MPC on the tet plant
    from soft_robot_control_tpu.control.mpc import scp_ssm
    from soft_robot_control_tpu.control.service import GuSTOService
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.interfaces import SSMGuSTO
    from soft_robot_control_tpu.sim.closed_loop import run_closed_loop

    gm = SSMGuSTO(model)
    nz = model.output_dim
    T_traj = max(args.sim_duration + 4.0, 10.0)
    t_target = np.arange(0, T_traj, dt)
    amp_z = 8.0
    z_target = np.zeros((len(t_target), nz))
    z_target[:, 0] = amp_z * np.cos(2 * np.pi * t_target / 6.0) - amp_z
    z_target[:, 1] = amp_z * np.sin(2 * np.pi * t_target / 6.0)
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-5 * np.eye(model.input_dim)
    # bound the solver (and, below, the applied command) at the SSM's
    # training envelope: the model is identified from decays at u <= amp —
    # letting the feedforward plan ride to u_max=800 drives the plant far
    # off-manifold and the loop diverges on contact with the first model
    # error (round-3 committed sim: 360 mm excursions)
    u_env = min(1.25 * args.amp, robot.u_max)
    U = HyperRectangle(u_env * np.ones(8), np.zeros(8))

    x0r = np.zeros(model.state_dim)
    # CONSISTENT control clock: the service plans AND the controller
    # interpolates on the same dt_c = 2*dt grid (the reference SSM
    # configuration, examples/hardware/diamond_SSM.py:353-355 dt=0.02 N=3;
    # delay=1.0 like the working diamond campaign). The round-5 first cut
    # planned on a 3*dt grid while the controller ran its plan clock at
    # dt — that mismatch alone turned a 0.6 mm loop into a 40 mm runaway
    # with three cables pinned at the envelope.
    dt_c = 2 * dt
    service = GuSTOService(gm, N=3, dt=dt_c, Qz=Qz, R=R, x0=x0r,
                           t=t_target, z=z_target, U=U, verbose=0,
                           max_gusto_iters=0, convg_thresh=1e-3)
    controller = scp_ssm(model, None, dt_c, N_replan=2, delay=1.0, wait=True,
                         solver_service=service)

    Cf = robot.get_measurement_model(nodes=[tip])  # [v_tip; q_tip] raw y

    class _Lin:
        def __init__(self, M):
            self.M = jnp.asarray(M, jnp.asarray(plant.rest_pos).dtype)

        def evaluate(self, x, key=None):
            return self.M @ x

    sim = run_closed_loop(plant, controller,
                          sim_duration=args.sim_duration, dt=dt,
                          measurement_model=_Lin(Cf),
                          output_model=_Lin(Hf),
                          u_limits=(np.zeros(8), u_env * np.ones(8)))
    z = np.asarray(sim["z"])  # [q_tip; v_tip]
    t = np.asarray(sim["t"])
    zs = z[:, :2] - np.asarray(model.z_ref)[:2]
    mask = t > 1.5
    delay = 1.0  # matches the controller's plan clock t - delay
    zx = np.interp(t[mask] - delay, t_target, z_target[:, 0])
    zy = np.interp(t[mask] - delay, t_target, z_target[:, 1])
    err = np.hypot(zs[mask, 0] - zx, zs[mask, 1] - zy)
    rmse = float(np.sqrt(np.mean(err ** 2)))
    print(f"[{time.time()-t0:6.1f}s] SSM MPC on tet plant: tracking RMSE "
          f"{rmse:.2f} mm (circle amp {amp_z} mm)", flush=True)
    from soft_robot_control_tpu.utils.io import save_data
    save_data(os.path.join(args.out, "ssm_mpc_sim.pkl"), sim)
    st = np.asarray(sim.get("info", {}).get("solve_times", []))
    res = {"tracking_rmse_mm": rmse, "circle_amp_mm": float(amp_z),
           "u_envelope_mN": float(u_env), "amp_mN": float(args.amp),
           "control_dt_s": float(dt_c), "delay_s": delay,
           "mpc_replan_budget_ms": 1e3 * 2 * dt_c,
           "solve_ms_mean": float(st.mean() * 1e3) if st.size else None,
           "platform": np_dtype_name}
    import json
    with open(os.path.join(args.out, "trunk_ssm_mpc.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(f"[{time.time()-t0:6.1f}s] saved trunk_ssm_mpc.json", flush=True)

    # gate + quarantine: failing artifacts must not stay where a snapshot
    # commit can sweep them in (utils/gatekeeper.py)
    from soft_robot_control_tpu.utils.gatekeeper import enforce_gates
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rc = enforce_gates(
        [os.path.join(repo, "tests", "test_trunk_campaign_artifacts.py")],
        [os.path.join(args.out, "trunk_ssm_mpc.json"),
         os.path.join(args.out, "ssm_mpc_sim.pkl")], args.out)
    if rc != 0:
        sys.exit(rc)


if __name__ == "__main__":
    main()
