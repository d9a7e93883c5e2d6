"""Benchmark entry — runs on one real TPU chip (float32).

Primary metric (BASELINE.json): GuSTO SCP solve time per MPC step at Diamond
scale (4 cables, 6-dim output, ~40-dim reduced state, N=5 horizon), on-device
ADMM QP — north star < 2 ms. Secondary: 1024-way vmapped TPWL rollout
throughput and batched closed-loop MPC+EKF steps/sec.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compilation cache: the remote TPU compiler is slow (minutes for
# the scan-heavy programs); cache compiled executables across processes
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


DIAMOND_TET_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "examples", "diamond_tet",
                               "tpwl_model_snapshots.pkl")


def load_bench_model(dtype):
    """Physics-campaign Diamond TPWL at reference dictionary scale when the
    committed artifact exists (built by examples/diamond_tet_campaign.py
    from the 1628-node tet-FEM plant over the shipped diamond.vtu);
    otherwise a synthetic model at P>=300 so the dictionary gather/HBM
    pressure matches reference scale either way (SURVEY.md §6: thresholds
    200-1100 -> O(100s) of points)."""
    from soft_robot_control_tpu.tasks.demo import make_demo_tpwl

    if os.path.exists(DIAMOND_TET_ART):
        from soft_robot_control_tpu.models.tpwl import from_tpwl_dict
        from soft_robot_control_tpu.sim.measurement import linearModel

        Cf = linearModel([1354, 726, 139, 1445, 729], 1628).C_dense()
        Hf = linearModel([1354], 1628, vel=False).C_dense()
        model = from_tpwl_dict(
            DIAMOND_TET_ART,
            params={"dist_weights": {"q": 10.0, "v": 1.0}},
            Cf=Cf, Hf=Hf, discr_method="be")
        dt = (float(model.pre_discretized_dt)
              if model.pre_discretized_dt else 0.01)
        src = (f"diamond_tet_campaign(P={model.num_points}, "
               f"r={model.rom.rom_dim}, n_f=9768)")
    else:
        model = make_demo_tpwl(r=21, P=320, m=4, nz=6, nf=64,
                               dtype=np.float32)
        dt = 0.02
        src = f"synthetic(P={model.num_points}, r=21)"
    model = jax.tree_util.tree_map(
        lambda a: a.astype(np.float32) if hasattr(a, "astype") else a, model)
    return model, dt, src


def main():
    from soft_robot_control_tpu.control.batch_mpc import BatchMPC
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.tpwl import rollout_batch
    from soft_robot_control_tpu.tasks.demo import demo_targets, make_demo_tpwl

    dtype = jnp.float32
    # Diamond scale (SURVEY.md §6 problem sizes) at reference dictionary
    # size P>=300; cable bounds u in [0, 1500] like the calibrated hardware
    # Diamond (examples/hardware/model.py u_max=1500) so every QP carries
    # the production constraint rows
    model, dt, model_src = load_bench_model(dtype)
    nz = int(np.asarray(model.H).shape[0])
    m_in = int(model.input_dim)
    N, N_replan = 5, 2
    U = HyperRectangle(1500.0 * np.ones(m_in), np.zeros(m_in))

    # primary latency path: condensed formulation at the QUALITY-GATED
    # settings (same config whose closed-loop tracking error is measured and
    # gated below — a latency headline must come from a config that actually
    # tracks); the Pallas sparse-ADMM path is timed alongside as extra
    mpc = BatchMPC(model, 100.0 * np.eye(nz), 1e-5 * np.eye(m_in), N=N, dt=dt,
                   N_replan=N_replan, qp_iters=100, scp_iters=1, dtype=dtype,
                   x_step="kinv", formulation="condensed", U=U,
                   rho_stages=4, scaling_iters=6,
                   W=1e-2 * np.eye(model.state_dim),
                   V=1e-4 * np.eye(model.C.shape[0]))
    mpc_pallas = BatchMPC(model, 100.0 * np.eye(nz), 1e-3 * np.eye(m_in),
                          N=N, dt=dt,
                          N_replan=N_replan, qp_iters=50, scp_iters=1,
                          dtype=dtype, use_pallas=True, U=U,
                          W=1e-2 * np.eye(model.state_dim),
                          V=1e-4 * np.eye(model.C.shape[0]))
    # batched path: precomputed-K^-1 iterations (batched triangular solves
    # would otherwise dominate at 1024-way)
    mpc_xla = BatchMPC(model, 100.0 * np.eye(nz), 1e-5 * np.eye(m_in), N=N, dt=dt,
                       N_replan=N_replan, qp_iters=100, scp_iters=1,
                       dtype=dtype, x_step="kinv", U=U,
                       rho_stages=4, scaling_iters=6,
                       W=1e-2 * np.eye(model.state_dim),
                       V=1e-4 * np.eye(model.C.shape[0]))

    # ---- 1. MPC step latency: one window = replan (linearize + assemble +
    # factorize + ADMM solve) + N_replan EKF/feedback/plant ticks.
    # Primary number: per-window cost with the control loop resident on
    # device (50 windows in one program — the production serving mode).
    # Secondary: per-call time issuing one window per dispatch (pipelined;
    # NB this dev environment reaches the TPU through a ~25 ms-RTT tunnel,
    # so true blocking single-call latency is RTT-dominated — see
    # examples/realtime_mpc_tpu.py for the RTT-separated measurement).
    n_win = 50
    run50 = jax.jit(mpc.build(n_win))
    zt50 = demo_targets(model, n_win, N_replan, N, dt, batch=1)[0]
    x0 = jnp.zeros(model.state_dim, dtype)
    key = jax.random.PRNGKey(0)
    t50 = timeit(lambda: run50(x0, x0, jnp.asarray(zt50, dtype), key),
                 warmup=2, iters=10)
    mpc_ms = 1e3 * t50 / n_win

    # single-call path: AOT-compile the one-window program and pre-commit
    # the arguments to device. jax.jit dispatch costs ~1 ms per call on
    # this single-core host (arg canonicalization + cache lookup), which
    # dominated the r3 number (2.33 ms); the compiled executable's call
    # path is what a deployed controller would sit on.
    zt = demo_targets(model, 1, N_replan, N, dt, batch=1)[0]
    zt_d = jax.device_put(jnp.asarray(zt, dtype))
    x0_d = jax.device_put(x0)
    key_d = jax.device_put(key)
    run1 = jax.jit(mpc.build(1)).lower(x0_d, x0_d, zt_d, key_d).compile()
    t_single = timeit(lambda: run1(x0_d, x0_d, zt_d, key_d),
                      warmup=3, iters=20)
    mpc_single_ms = 1e3 * t_single

    run50_p = jax.jit(mpc_pallas.build(n_win))
    t50_p = timeit(lambda: run50_p(x0, x0, jnp.asarray(zt50, dtype), key),
                   warmup=2, iters=10)
    mpc_ms_pallas_sparse = 1e3 * t50_p / n_win

    # ---- 2. 1024-way vmapped TPWL rollouts (100 steps each)
    model_d = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if hasattr(a, "astype") else a,
        model).pre_discretize(dt)
    B, T = 1024, 100
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(0.1 * rng.normal(size=(B, model.state_dim)), dtype)
    us = jnp.asarray(np.abs(rng.normal(size=(B, T, model.input_dim))), dtype)
    roll = jax.jit(lambda a, b: rollout_batch(model_d, a, b, dt,
                                              select="exact"))
    t_roll = timeit(roll, x0s, us, warmup=2, iters=10)
    rollouts_per_sec = B / t_roll
    # batch-fused matmul-distance path (models/tpwl.py): at P ~ 1e3 the
    # per-sample (P, r) distance broadcast dominates; two (B,r)x(r,P)
    # matmuls per step instead
    roll_f = jax.jit(lambda a, b: rollout_batch(model_d, a, b, dt,
                                                select="matmul"))
    t_roll_f = timeit(roll_f, x0s, us, warmup=2, iters=10)
    rollouts_per_sec_fused = B / t_roll_f

    # ---- 3. batched closed-loop MPC+EKF throughput (1024 loops, 4 windows).
    # Fast path: batch-fused window scan — all 1024 QPs per window solve in
    # ONE grid-batched Pallas launch (VMEM-resident iterations) instead of
    # iters x 8 HBM-bound batched XLA ops. The vmapped-XLA kinv path is
    # reported alongside for reference.
    n_win = 4
    ztB = jnp.asarray(demo_targets(model, n_win, N_replan, N, dt, batch=B),
                      dtype)
    x0B = jnp.zeros((B, model.state_dim), dtype)
    keysB = jax.random.split(jax.random.PRNGKey(1), B)
    # headline: condensed formulation (states eliminated exactly,
    # scp/locp_condensed.py — (N*nu)^2 KKT) through the fused launch; also
    # ~10x lower tracking error at equal ADMM iterations since no dynamics
    # -equality residual survives
    # quality-gated settings (measured on TPU, quality sweep r3): reference
    # input penalty R=1e-5 (examples/diamond/diamond.py:194) + 4-stage rho
    # re-balancing inside the 100-iteration budget -> rel tracking err 0.0105
    # vs the r2 config's 0.45 (which was dominated by R=1e-3's input-effort
    # optimum, not solver accuracy), at ~28k windows/s
    mpc_cond = BatchMPC(model, 100.0 * np.eye(nz), 1e-5 * np.eye(m_in), N=N,
                        dt=dt, N_replan=N_replan, qp_iters=100, scp_iters=1,
                        dtype=dtype, x_step="kinv", formulation="condensed",
                        U=U, rho_stages=4, scaling_iters=6,
                        W=1e-2 * np.eye(model.state_dim),
                        V=1e-4 * np.eye(model.C.shape[0]))
    runC = mpc_cond.build_fused(n_win)
    t_cond = timeit(lambda: runC(x0B, x0B, ztB, keysB), warmup=2, iters=5)
    batch_mpc_steps_per_sec = B * n_win / t_cond
    runF = mpc_xla.build_fused(n_win)
    t_batch = timeit(lambda: runF(x0B, x0B, ztB, keysB), warmup=2, iters=5)
    batch_mpc_steps_per_sec_sparse = B * n_win / t_batch
    fB = jax.jit(jax.vmap(mpc_xla.build(n_win)))
    t_batch_xla = timeit(lambda: fB(x0B, x0B, ztB, keysB), warmup=2, iters=5)
    batch_mpc_steps_per_sec_xla = B * n_win / t_batch_xla

    # solution quality AT the benchmarked iteration counts: closed-loop
    # tracking error of the timed configurations against *dynamically
    # feasible* targets — the z-response of the model itself to admissible
    # smooth inputs (4 nonnegative cables cannot track 6 independent random
    # sinusoids, so random targets would only measure infeasibility).
    from soft_robot_control_tpu.control.batch_mpc import window_targets

    T_q = n_win * N_replan + N + 1
    rng_q = np.random.default_rng(11)
    tq = dt * np.arange(T_q + 1)
    u_ref = 0.5 * 1500.0 * (1.0 + np.sin(
        2 * np.pi * tq[None, :, None] / 4.0
        + rng_q.uniform(0, 2 * np.pi, size=(B, 1, model.input_dim))))
    Xq = rollout_batch(model_d, jnp.zeros((B, model.state_dim), dtype),
                       jnp.asarray(u_ref, dtype), dt)
    zq = (np.asarray(Xq) @ np.asarray(model_d.H).T
          + np.asarray(model_d.z_ref))
    ztQ = jnp.asarray(np.stack([window_targets(zq[b, :T_q], n_win, N_replan,
                                               N) for b in range(B)]), dtype)

    def rel_track(run_fn):
        logs = jax.block_until_ready(run_fn(x0B, x0B, ztQ, keysB))
        z = np.asarray(logs["z"])            # (B, n_win*N_replan, nz)
        # targets are windowed (n_win, N+1, nz); window w executes ticks
        # matching its target entries 1..N_replan
        zt_exec = np.asarray(ztQ)[:, :, 1:N_replan + 1, :].reshape(
            B, n_win * N_replan, -1)
        num = np.linalg.norm(z - zt_exec)
        den = max(np.linalg.norm(zt_exec - zt_exec.mean(axis=(0, 1))), 1e-12)
        return float(num / den)

    track_cond = rel_track(runC)
    track_sparse = rel_track(runF)

    # QUALITY GATE (VERDICT r2 #3): the headline throughput configuration
    # must actually track — rel err vs dynamically feasible targets <= 0.05.
    # A regression makes the bench fail loudly (nonzero exit) after still
    # emitting the JSON line.
    QUALITY_GATE = 0.05
    quality_ok = bool(track_cond <= QUALITY_GATE)

    # THROUGHPUT FLOOR (VERDICT r3 #9): quality and speed must not silently
    # trade against each other — the quality-gated batched MPC throughput
    # may not drop more than 20% below the last committed reference number
    # (r3: 29.5k windows/s on TPU v5e). Both gates fail the bench loudly.
    THROUGHPUT_FLOOR = 0.8 * 29500.0
    throughput_ok = bool(batch_mpc_steps_per_sec >= THROUGHPUT_FLOOR)

    # analytic ADMM FLOPs (lower bound: K^-1 apply + constraint matvecs per
    # iteration) -> achieved FLOP/s + fraction of v5e peak (f32 ~49 TFLOP/s)
    def admm_flops_per_window(m):
        n_var, n_con = m._qp_dims()
        per_iter = 2 * n_var * n_var + 4 * n_con * n_var
        return m.qp_iters * m.scp_iters * per_iter

    flops_cond = admm_flops_per_window(mpc_cond)
    achieved_tflops = flops_cond * batch_mpc_steps_per_sec / 1e12
    V5E_F32_PEAK_TFLOPS = 49.0
    pct_peak = 100.0 * achieved_tflops / V5E_F32_PEAK_TFLOPS

    # ---- 4. batched full-GuSTO trajectory optimization (device while_loop)
    from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
    from soft_robot_control_tpu.scp.gusto_jit import GuSTOJit

    g_model = TPWLGuSTO(model_d)
    # headline: condensed formulation (TR as affine rows + one slack)
    gj_c = GuSTOJit(g_model, N=5, dt=dt, Qz=100.0 * np.eye(nz),
                    R=1e-3 * np.eye(m_in), U=U, max_iters=5, qp_iters=50,
                    x_step="kinv", formulation="condensed", dtype=dtype)
    gj = GuSTOJit(g_model, N=5, dt=dt, Qz=100.0 * np.eye(nz),
                  R=1e-3 * np.eye(m_in), U=U, max_iters=5, qp_iters=50,
                  x_step="kinv", dtype=dtype)
    Bg = 64
    rng2 = np.random.default_rng(2)
    x0g = jnp.asarray(0.05 * rng2.normal(size=(Bg, model.state_dim)), dtype)
    u0g = jnp.zeros((Bg, 5, m_in), dtype)
    xig = jnp.repeat(x0g[:, None, :], 6, axis=1)
    zg = jnp.asarray(np.repeat(
        np.asarray(model_d.z_ref)[None, None, :], 6, axis=1).repeat(Bg, 0), dtype)
    # fused path: lockstep fori + ONE grid-batched Pallas LOCP launch per
    # SCP iteration (identical per-element results; ~10x the vmapped
    # while_loop whose batched XLA ADMM refetches K^-1/A from HBM each
    # iteration)
    t_g = timeit(lambda: gj_c.solve_batch_fused(x0g, u0g, xig, zg), warmup=1,
                 iters=5)
    gusto_solves_per_sec = Bg / t_g
    t_gs = timeit(lambda: gj.solve_batch_fused(x0g, u0g, xig, zg), warmup=1,
                  iters=5)
    gusto_solves_per_sec_sparse = Bg / t_gs
    t_gx = timeit(lambda: gj.solve_batch(x0g, u0g, xig, zg), warmup=1,
                  iters=5)
    gusto_solves_per_sec_xla = Bg / t_gx

    # ---- 4b. long-horizon N=200 open-loop trajectory optimization
    # (scp/standalone.py:11 role, examples/hardware/diamond.py:400-496):
    # stage-structured LOCP with the cyclic-reduction KKT solve — log2(N)
    # batched levels instead of 200 sequential block steps; the dense path
    # cannot even assemble ((N+1)nx+Nnu)^2 at this horizon. Reported as
    # full fixed-iteration LOCP trajectory solves per second.
    from soft_robot_control_tpu.scp.locp_stages import StageLOCP

    N200 = 200
    nx200 = model.state_dim
    nu200 = model.input_dim
    rng3 = np.random.default_rng(3)
    Ad_s = jnp.asarray(np.repeat(np.asarray(model_d.A_d[:1]), N200, 0), dtype)
    Bd_s = jnp.asarray(np.repeat(np.asarray(model_d.B_d[:1]), N200, 0), dtype)
    dd_s = jnp.asarray(np.repeat(np.asarray(model_d.d_d[:1]), N200, 0), dtype)
    z_s = jnp.asarray(0.05 * rng3.normal(size=(N200 + 1, model.H.shape[0])),
                      dtype)
    x0_s = jnp.zeros(nx200, dtype)
    st_cr = StageLOCP(N200, np.asarray(model.H), 100.0 * np.eye(nz),
                      1e-3 * np.eye(nu200), U=U, kkt_solver="cr",
                      dtype=dtype)
    st_scan = StageLOCP(N200, np.asarray(model.H), 100.0 * np.eye(nz),
                        1e-3 * np.eye(nu200), U=U, kkt_solver="scan",
                        dtype=dtype)
    f_cr = jax.jit(lambda: st_cr.solve(Ad_s, Bd_s, dd_s, x0_s, z_s,
                                       iters=100)[0])
    f_scan = jax.jit(lambda: st_scan.solve(Ad_s, Bd_s, dd_s, x0_s, z_s,
                                           iters=100)[0])
    t_cr = timeit(f_cr, warmup=1, iters=5)
    t_scan = timeit(f_scan, warmup=1, iters=5)
    n200_cr_per_sec = 1.0 / t_cr
    n200_scan_per_sec = 1.0 / t_scan

    # ---- 5. batched SSM MPC throughput (config 4 x 5): nonlinear-chart
    # relinearization + LOCP with time-varying H_d/c_d per window, fused
    # Pallas launch. Model: natively-trained Trunk SSM artifact when
    # present, else the reference's shipped Diamond SSM_model.mat.
    ssm_windows_per_sec = None
    ssm_src = None
    try:
        import pickle
        from soft_robot_control_tpu.control.batch_mpc import (BatchSSMMPC,
                                                              window_targets)
        from soft_robot_control_tpu.models import ssm as ssm_mod

        trunk_art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "examples", "trunk_tet",
                                 "trunk_SSM_model.mat")
        if os.path.exists(trunk_art):
            from soft_robot_control_tpu.models.ssm_learn import SSMModel  # noqa
            smodel = ssm_mod.from_mat(trunk_art, None, discrete=False,
                                      discr_method="be")
            ssm_src = "trunk_tet_native"
        else:
            ref = "/root/reference/examples/hardware"
            with open(os.path.join(ref, "rest_qv.pkl"), "rb") as f:
                rest = pickle.load(f)
            qv_eq = np.array(rest["rest"])
            x_eq = np.concatenate((qv_eq[1], qv_eq[0]))
            from soft_robot_control_tpu.sim.measurement import linearModel
            out = linearModel([1354], 1628)
            z_eq = np.asarray(out.evaluate(jnp.asarray(x_eq), qv=True))
            smodel = ssm_mod.from_mat(
                os.path.join(ref, "SSMmodels/SSM_model.mat"), z_eq,
                discrete=False, discr_method="be")
            ssm_src = "reference_diamond_mat"
        nz_s = smodel.output_dim
        Qz_s = np.zeros((nz_s, nz_s))
        Qz_s[0, 0] = Qz_s[1, 1] = 100.0
        smpc = BatchSSMMPC(smodel, Qz_s, 1e-6 * np.eye(smodel.input_dim),
                           N=3, dt=0.02, N_replan=2, qp_iters=50,
                           dtype=dtype)
        n_win_s = 4
        Bs = 1024
        Ts = n_win_s * 2 + 3 + 1
        ts = 0.02 * np.arange(Ts)
        rngs = np.random.default_rng(7)
        zts = []
        for b in range(Bs):
            ph = rngs.uniform(0, 2 * np.pi)
            zz = np.zeros((Ts, nz_s))
            zz[:, 0] = 2.0 * np.cos(2 * np.pi * ts / 6.0 + ph) - 2.0 * np.cos(ph)
            zz[:, 1] = 2.0 * np.sin(2 * np.pi * ts / 6.0 + ph) - 2.0 * np.sin(ph)
            zts.append(window_targets(zz, n_win_s, 2, 3))
        zts = jnp.asarray(np.stack(zts), dtype)
        x0s_s = jnp.zeros((Bs, smodel.state_dim), dtype)
        runS = smpc.build_fused(n_win_s)
        t_ssm = timeit(lambda: runS(x0s_s, zts), warmup=2, iters=5)
        ssm_windows_per_sec = Bs * n_win_s / t_ssm
    except Exception as e:  # keep the primary metrics robust
        ssm_src = f"skipped: {type(e).__name__}: {e}"

    # ---- 6. fused LTI MPC service step (the ROMPC/Koopman serving path,
    # control/linear_mpc.py): adaptive residual-driven XLA ADMM vs the
    # one-launch VMEM-resident Pallas staged ADMM (VERDICT r4 #9). Timed as
    # the device step function the service dispatches (pipelined amortized,
    # net of the dev tunnel's RTT like metric 1).
    lti_step_ms = {}
    try:
        from soft_robot_control_tpu.control.linear_mpc import (
            LinearMPCService)
        from soft_robot_control_tpu.core.types import QuadraticCost, Target
        from soft_robot_control_tpu.models.linear import (LinearROM,
                                                          tpwl_to_linear_rom)

        if os.path.exists(DIAMOND_TET_ART):
            from soft_robot_control_tpu.sim.measurement import linearModel

            lin = LinearROM(tpwl_to_linear_rom(DIAMOND_TET_ART), dt,
                            Cf=linearModel([1354, 726, 139, 1445, 729],
                                           1628).C_dense(),
                            Hf=linearModel([1354], 1628, vel=False).C_dense())
            nz_l = int(np.asarray(lin.H).shape[0])
            tt_l = dt * np.arange(1200)
            zt_l = np.zeros((len(tt_l), nz_l))
            zt_l[:, 0] = 15.0 * np.sin(2 * np.pi * tt_l / 2.0)
            zt_l[:, 1] = 7.5 * np.sin(4 * np.pi * tt_l / 2.0)
            tgt_l = Target(t=tt_l, z=zt_l - np.asarray(lin.z_ref))
            cost_l = QuadraticCost(Q=100.0 * np.eye(nz_l),
                                   R=1e-4 * np.eye(m_in),
                                   Qf=1000.0 * np.eye(nz_l))
            for bk in ("xla", "pallas"):
                svc = LinearMPCService(lin, 20, dt, cost_l, tgt_l, U=U,
                                       locp_backend="condensed",
                                       qp_backend=bk)
                sdt_l = svc.locp.spec.dtype
                t0_d = jnp.asarray(0.37, sdt_l)
                x0_d = jnp.zeros((lin.state_dim,), sdt_l)
                t_l = timeit(
                    lambda: svc._fused_fn(t0_d, x0_d, svc._w, svc._y)[0],
                    warmup=2, iters=20)
                lti_step_ms[bk] = 1e3 * t_l
    except Exception as e:
        lti_step_ms = {"skipped": f"{type(e).__name__}: {e}"}

    result = {
        "metric": "gusto_mpc_step_ms_diamond",
        "value": round(mpc_ms, 4),
        "unit": "ms",
        # north star: < 2 ms per MPC step (BASELINE.md); >1 means target met
        "vs_baseline": round(2.0 / mpc_ms, 3),
        "extra": {
            "mpc_step_ms_single_call_pipelined": round(mpc_single_ms, 4),
            "mpc_step_ms_sparse_pallas_50it": round(mpc_ms_pallas_sparse, 4),
            "quality_gate_rel_err_max": QUALITY_GATE,
            "quality_gate_ok": quality_ok,
            "throughput_floor_windows_per_sec": THROUGHPUT_FLOOR,
            "throughput_floor_ok": throughput_ok,
            "tpwl_rollouts_per_sec_1024way": round(rollouts_per_sec_fused, 1),
            "tpwl_rollouts_per_sec_1024way_exact_select": round(rollouts_per_sec, 1),
            "batched_mpc_windows_per_sec_1024way": round(batch_mpc_steps_per_sec, 1),
            "batched_mpc_windows_per_sec_1024way_sparse": round(batch_mpc_steps_per_sec_sparse, 1),
            "batched_mpc_windows_per_sec_1024way_xla": round(batch_mpc_steps_per_sec_xla, 1),
            "batched_full_gusto_solves_per_sec_64way": round(gusto_solves_per_sec, 1),
            "batched_full_gusto_solves_per_sec_64way_sparse": round(gusto_solves_per_sec_sparse, 1),
            "batched_full_gusto_solves_per_sec_64way_xla": round(gusto_solves_per_sec_xla, 1),
            "model_source": model_src,
            "dict_points_P": int(model.num_points),
            "reduced_dim_r": int(model.rom.rom_dim),
            "batched_mpc_rel_tracking_err_condensed": round(track_cond, 4),
            "batched_mpc_rel_tracking_err_sparse": round(track_sparse, 4),
            "admm_flops_per_window_analytic": int(flops_cond),
            "achieved_tflops_batched_mpc": round(achieved_tflops, 4),
            "pct_of_v5e_f32_peak": round(pct_peak, 3),
            "n200_trajopt_solves_per_sec_cr": round(n200_cr_per_sec, 2),
            "n200_trajopt_solves_per_sec_scan": round(n200_scan_per_sec, 2),
            "ssm_mpc_windows_per_sec_1024way": (round(ssm_windows_per_sec, 1)
                                                if ssm_windows_per_sec else None),
            "ssm_model_source": ssm_src,
            "lti_mpc_step_ms_xla": (round(lti_step_ms["xla"], 4)
                                    if "xla" in lti_step_ms else None),
            "lti_mpc_step_ms_pallas": (round(lti_step_ms["pallas"], 4)
                                       if "pallas" in lti_step_ms else None),
            "lti_mpc_step_skipped": lti_step_ms.get("skipped"),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))
    if not quality_ok or not throughput_ok:
        import sys

        if not quality_ok:
            print(f"QUALITY GATE FAILED: "
                  f"batched_mpc_rel_tracking_err_condensed "
                  f"= {track_cond:.4f} > {QUALITY_GATE}", file=sys.stderr)
        if not throughput_ok:
            print(f"THROUGHPUT FLOOR FAILED: "
                  f"batched_mpc_windows_per_sec_1024way "
                  f"= {batch_mpc_steps_per_sec:.1f} < {THROUGHPUT_FLOOR:.1f}",
                  file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
