"""GuSTO — trust-region sequential convex programming.

Capability parity with sofacontrol/scp/gusto.py, including the three
documented modifications to vanilla GuSTO (gusto.py:386-415):
1. if (delta, omega) were constant for two accepted solves but the QP cost
   increased, shrink delta;
2. no delta growth on good model accuracy;
3. no omega decrease when state constraints are satisfied.

TPU-first: trajectory linearization is one `vmap` over the horizon (instead
of the reference's per-point Python loop wrapped in jax.jit,
gusto.py:253-281); the LOCP is assembled and solved on device by the ADMM
kernel; the outer loop is host-side Python because its iteration count is
small and data-dependent (the batched MPC path uses the fixed-iteration
variant in control/mpc.py instead).

Default hyperparameters are identical to the reference (gusto.py:12-22).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.scp.locp import LOCP

# Defaults (gusto.py:12-22)
DELTA0 = 1e4
OMEGA0 = 1.0
RHO = 0.1
BETA_FAIL = 0.5
BETA_SUCC = 2.0
EPSILON = 0.01
GAMMA_FAIL = 5.0
OMEGA_MAX = 1e10
MAX_ITERS = 500
CONVERGE = 0.1


@dataclass
class GuSTOParams:
    delta0: float = DELTA0
    omega0: float = OMEGA0
    rho: float = RHO
    beta_fail: float = BETA_FAIL
    beta_succ: float = BETA_SUCC
    gamma_fail: float = GAMMA_FAIL
    omega_max: float = OMEGA_MAX
    epsilon: float = EPSILON
    convg_thresh: float = CONVERGE
    max_gusto_iters: int = MAX_ITERS


class GuSTO:
    """Trust-region SCP solver over a TemplateModel-style adapter.

    Constructor signature mirrors the reference (gusto.py:54-147): builds the
    LOCP once and solves immediately for the given initial guess.
    """

    def __init__(self, model, N, dt, Qz, R, x0, u_init, x_init, z=None, u=None,
                 Qzf=None, zf=None, U=None, X=None, Xf=None, dU=None,
                 verbose=0, warm_start=True, **kwargs):
        self.model = model
        self.n_x = x0.shape[0]
        self.n_u = R.shape[0]
        self.n_z = Qz.shape[0]
        self.dt = dt
        self.N = N
        self.Qz, self.R, self.Qzf = Qz, R, Qzf
        self.U, self.X, self.Xf, self.dU = U, X, Xf, dU
        self.verbose = verbose

        p = GuSTOParams(
            delta0=kwargs.pop("delta0", DELTA0),
            omega0=kwargs.pop("omega0", OMEGA0),
            rho=kwargs.pop("rho", RHO),
            beta_fail=kwargs.pop("beta_fail", BETA_FAIL),
            beta_succ=kwargs.pop("beta_succ", BETA_SUCC),
            gamma_fail=kwargs.pop("gamma_fail", GAMMA_FAIL),
            omega_max=kwargs.pop("omega_max", OMEGA_MAX),
            epsilon=kwargs.pop("epsilon", EPSILON),
            convg_thresh=kwargs.pop("convg_thresh", CONVERGE),
            max_gusto_iters=MAX_ITERS,  # first solve may take more iterations
        )
        self.params = p
        max_iters_later = kwargs.pop("max_gusto_iters", MAX_ITERS)

        self.x_char = np.asarray(kwargs.pop("x_char", np.ones(self.n_x)), float)
        self.x_scale = 1.0 / np.abs(self.x_char)
        self.f_char = np.asarray(kwargs.pop("f_char", np.ones(self.n_x)), float)
        self.f_scale = 1.0 / np.abs(self.f_char)
        kwargs.pop("jit", None)
        # oneshot=False forces the host loop even in the real-time config
        # (used by tests to pin fast-path/host-path equivalence)
        self._use_oneshot = bool(kwargs.pop("oneshot", True))
        # fused SCP iterations inside the one-shot device call: >1
        # relinearizes at the previous round's solution before re-solving —
        # the device-side analog of one extra GuSTO iteration, which stops
        # the single-linearization plan from extrapolating the model far
        # from the warm-start trajectory (observed on the trunk campaign:
        # one-round plans blow 380 mm through a 195 mm robot's envelope)
        self._oneshot_iters = max(1, int(kwargs.pop("oneshot_iters", 1)))
        # plan sanity bound: reject a solve whose PLANNED output deviates
        # more than this (inf-norm, output units) from the horizon target,
        # keeping the previous plan instead — the role the trust region
        # plays in the full GuSTO loop (gusto.py:386-415), collapsed to one
        # test the real-time path can afford
        self._plan_bound = kwargs.pop("plan_bound", None)
        # one-shot acceptance thresholds (relative residuals); defaults
        # match the host condensed adapter's f32/f64 gates
        self._accept_pri = kwargs.pop("accept_pri_rel", None)
        self._accept_dua = kwargs.pop("accept_dua_rel", None)
        # device_tr=True runs the FULL trust-region SCP loop on device
        # (scp/gusto_jit.py lax.while_loop) — one dispatch per MPC query
        # with the reference's TR semantics intact. The one-LOCP real-time
        # mode has no mechanism against model extrapolation when the model
        # is piecewise-linear: the Taylor-accuracy gate rho_k is ~0 for a
        # PWL model by construction, so a no-TR LOCP happily plans 170 mm
        # excursions on a 195 mm trunk (observed). The TR loop bounds each
        # SCP step and relinearizes along the way, following the dictionary.
        self._device_tr = bool(kwargs.pop("device_tr", False))
        self._device_tr_iters = int(kwargs.pop("device_tr_max_iters", 30))
        # 400 iters / 4 rho-rebalance stages: measured on the trunk
        # campaign's condensed TR QP (N=50, 8 cables, 401 vars x 6801 rows)
        # — f32 relative residuals reach pri ~1e-5 / dua ~3e-5 there, while
        # 200/2 is borderline at the acceptance gates (1e-3/1e-2)
        self._device_tr_qp_iters = int(kwargs.pop("device_tr_qp_iters", 400))
        self._device_tr_rho_qp = float(kwargs.pop("device_tr_rho_qp", 0.1))
        self._device_tr_qp_stages = int(kwargs.pop("device_tr_qp_stages", 4))

        self.nonlinear_observer = bool(getattr(model, "nonlinear_observer", False))

        locp_backend = kwargs.pop("locp_backend", "dense")
        if locp_backend == "condensed":
            # states eliminated exactly (scp/locp_condensed.py): the QP
            # shrinks to N*nu + 1 variables and the slacked trust region
            # stays ADMM-friendly at large nx (the dense sparse LOCP's
            # shared-slack epigraph stalls there; the reference hands those
            # QPs to GUROBI, examples/hardware/diamond.py:316)
            if Qzf is not None or Xf is not None:
                raise NotImplementedError(
                    "condensed backend supports the no-terminal LOCP")
            from soft_robot_control_tpu.scp.locp_condensed import (
                CondensedLOCPAdapter)

            self.locp = CondensedLOCPAdapter(
                N, np.asarray(model.H), Qz, R, U=U, X=X, dU=dU,
                x_char=self.x_char,
                nonlinear_observer=self.nonlinear_observer,
                warm_start=warm_start, **kwargs)
        elif locp_backend == "stage":
            # block-sparse long-horizon backend (scp/locp_stages.py); only
            # the linear-observer path is stage-structured
            if self.nonlinear_observer or Qzf is not None or Xf is not None:
                raise NotImplementedError(
                    "stage backend supports the linear-observer LOCP "
                    "without terminal cost/set")
            from soft_robot_control_tpu.scp.locp_stages import StageLOCPAdapter

            self.locp = StageLOCPAdapter(N, np.asarray(model.H), Qz, R, U=U,
                                         X=X, dU=dU, x_char=self.x_char,
                                         **kwargs)
        else:
            self.locp = LOCP(N, np.asarray(model.H), Qz, R, Qzf=Qzf, U=U, X=X,
                             Xf=Xf, dU=dU, verbose=(verbose == 2),
                             warm_start=warm_start, x_char=self.x_char,
                             nonlinear_observer=self.nonlinear_observer,
                             **kwargs)

        # device-resident TR loop (see device_tr above): compiled once per
        # problem shape, first call at the construction-time solve
        self._jit_tr = None
        if self._device_tr:
            if locp_backend != "condensed":
                raise NotImplementedError(
                    "device_tr requires locp_backend='condensed'")
            if Qzf is not None or Xf is not None:
                raise NotImplementedError(
                    "device_tr supports the no-terminal LOCP")
            if self.nonlinear_observer:
                raise NotImplementedError(
                    "device_tr supports linear observers (z = H x)")
            from soft_robot_control_tpu.scp.gusto_jit import GuSTOJit
            self._jit_tr = GuSTOJit(
                model, N, dt, Qz, R, U=U, dU=dU, X=X,
                x_char=self.x_char, f_char=self.f_char,
                max_iters=self._device_tr_iters,
                qp_iters=self._device_tr_qp_iters,
                rho_qp=self._device_tr_rho_qp,
                qp_stages=self._device_tr_qp_stages,
                accept_pri=self._accept_pri, accept_dua=self._accept_dua,
                delta0=p.delta0, omega0=p.omega0, rho=p.rho,
                beta_fail=p.beta_fail, gamma_fail=p.gamma_fail,
                omega_max=p.omega_max, epsilon=p.epsilon,
                convg_thresh=p.convg_thresh,
                formulation="condensed", dtype=self.locp.spec.dtype)

        # vmapped trajectory linearizations (gusto.py:225-281, loop-free)
        self._traj_dyn = jax.jit(jax.vmap(
            lambda x, u_: model.get_discrete_dynamics(x, u_, dt)))
        self._traj_cont = jax.jit(jax.vmap(
            lambda x, u_: model.get_continuous_dynamics(x, u_)))
        if self.nonlinear_observer:
            self._traj_obs = jax.jit(jax.vmap(model.get_observer_jacobians))
        else:
            self._traj_obs = None

        self.xopt = None
        self.uopt = None
        self.zopt = None
        self.locp_solve_time = None
        self.itr_count = 0
        self.plan_rejects = 0
        # per-reject diagnostics: why each plan was dropped (excursion vs
        # residual vs non-finite), for campaign-level instrumentation
        self.reject_log = []

        # Real-time one-shot path: with max_gusto_iters=0, the condensed
        # backend and no trust region (the reference's real-time MPC mode,
        # examples/hardware/diamond_SSM.py:361), the whole solve —
        # linearization along the warm-start trajectory, condensed QP
        # assembly, ADMM, x/z recovery — fuses into ONE jitted device call.
        # The host loop's per-solve overhead (device->host->device jacobian
        # bounce in locp.update, separate rollout/accuracy/convergence
        # dispatches) measured ~430 ms of the trunk campaign's ~730 ms
        # solves on the tunneled TPU; this path eliminates it.
        self._oneshot = None
        self._warm_start = bool(warm_start)
        if (locp_backend == "condensed" and max_iters_later == 0
                and not self.locp.spec.trust_region
                and self._use_oneshot):
            self._oneshot = self._build_oneshot()
            sdt = self.locp.spec.dtype
            self._os_w = jnp.zeros((self.locp.spec.n_var,), sdt)
            self._os_y = jnp.zeros((self.locp.spec.n_con,), sdt)

        # First solve happens at construction, like the reference
        self.solve(x0, u_init, x_init, z, zf, u)
        self.params.max_gusto_iters = max_iters_later

    # ------------------------------------------------------------------
    def is_converged(self, x, u):
        dx = (1.0 / self.n_x) * np.sum(
            np.linalg.norm(self.x_scale * (x - self.x_k), axis=1))
        dsol = (1.0 / self.N) * dx
        return dsol, dsol <= self.params.convg_thresh

    def is_in_trust_region(self, x, delta):
        max_diff = np.max(np.max(np.abs(self.x_scale * (x - self.x_k)), axis=1))
        if max_diff - delta > self.params.epsilon:
            return max_diff, False
        return 0.0, True

    def state_constraints_violated(self, x, z_traj=None):
        """Max 2-norm violation over the horizon (gusto.py:185-201). For
        nonlinear observers the constraint acts on z = C_map(x)."""
        if self.X is None:
            return 0.0, True
        pts = z_traj if z_traj is not None else x
        viol = np.asarray(self.X.violation(jnp.asarray(pts)))
        max_violation = float(np.max(viol))
        return max_violation, max_violation <= self.params.epsilon

    def compute_accuracy(self, x, u, J):
        """Taylor-error model accuracy ratio rho_k (gusto.py:203-223),
        vectorized over the horizon."""
        f_new, _, _ = self._traj_cont(jnp.asarray(x[:-1]), jnp.asarray(u))
        fk, Ak, Bk = self._traj_cont(jnp.asarray(self.x_k[:-1]),
                                     jnp.asarray(self.u_k))
        dx = jnp.asarray(x[:-1] - self.x_k[:-1])
        du = jnp.asarray(u - self.u_k)
        f_approx = fk + jnp.einsum("kij,kj->ki", Ak, dx) + \
            jnp.einsum("kij,kj->ki", Bk, du)
        fs = jnp.asarray(self.f_scale)
        err = self.dt * jnp.sum(jnp.linalg.norm(fs * (f_new - f_approx), axis=1))
        approx = self.dt * jnp.sum(jnp.linalg.norm(fs * f_approx, axis=1))
        return float(err / (J + float(approx)))

    # ------------------------------------------------------------------
    def _build_oneshot(self):
        """Compile the one-LOCP MPC step as a single device program."""
        from soft_robot_control_tpu.qp.admm import solve_qp_dense
        from soft_robot_control_tpu.scp.locp_condensed import CondensedParams

        spec = self.locp.spec
        model = self.model
        dt = self.dt
        nlobs = self.nonlinear_observer
        skw = dict(self.locp.solver_kwargs)
        N, nx, nz, nu = spec.N, spec.n_x, spec.n_z, spec.n_u
        H = jnp.asarray(spec.H, spec.dtype)
        n_rounds = self._oneshot_iters
        fs = jnp.asarray(self.f_scale)
        rho_gate = float(self.params.rho)
        if spec.dtype == jnp.float32:
            acc_pri, acc_dua = 1e-3, 1e-2
        else:
            acc_pri, acc_dua = 1e-5, 1e-4
        if self._accept_pri is not None:
            acc_pri = self._accept_pri
        if self._accept_dua is not None:
            acc_dua = self._accept_dua

        def accuracy_ratio(x_new, u_new, x_traj, u_traj, J):
            """Taylor-error model accuracy rho_k (compute_accuracy, on
            device): linearization quality of the step x_traj -> x_new."""
            f_new, _, _ = jax.vmap(model.get_continuous_dynamics)(
                x_new[:-1], u_new)
            fk, Ak, Bk = jax.vmap(model.get_continuous_dynamics)(
                x_traj[:-1], u_traj)
            dx = x_new[:-1] - x_traj[:-1]
            du = u_new - u_traj
            f_approx = fk + jnp.einsum("kij,kj->ki", Ak, dx) + \
                jnp.einsum("kij,kj->ki", Bk, du)
            err = dt * jnp.sum(jnp.linalg.norm(fs * (f_new - f_approx),
                                               axis=1))
            approx = dt * jnp.sum(jnp.linalg.norm(fs * f_approx, axis=1))
            return err / (J + approx)

        def one_round(x_traj, u_traj, x0, z, u_des, w, y):
            """Linearize at (x_traj, u_traj), assemble, solve, recover, and
            ACCEPT only if (a) the QP's relative residuals pass and (b) the
            model-accuracy ratio rho_k <= rho — the same gates the host loop
            applies (solve residual gate + gusto.py:365-368 accuracy rule).
            A rejected round keeps the incoming trajectory and drops the
            ADMM warm start."""
            Ad, Bd, dd = jax.vmap(
                lambda x_, u_: model.get_discrete_dynamics(x_, u_, dt))(
                    x_traj[:-1], u_traj)
            if nlobs:
                Hd, cd = jax.vmap(model.get_observer_jacobians)(x_traj)
                Hd = Hd.reshape(N + 1, nz, nx).astype(spec.dtype)
                cd = cd.reshape(N + 1, nz).astype(spec.dtype)
            else:
                Hd = jnp.zeros((N + 1, nz, nx), spec.dtype)
                cd = jnp.zeros((N + 1, nz), spec.dtype)
            params = CondensedParams(
                Ad=Ad.astype(spec.dtype), Bd=Bd.astype(spec.dtype),
                dd=dd.astype(spec.dtype), x0=x0, z=z, u_des=u_des,
                Hd=Hd, cd=cd, xk=x_traj, delta=jnp.asarray(1.0, spec.dtype),
                omega=jnp.asarray(1.0, spec.dtype))
            P, q, A, l, ub, const, xfree, G = spec.assemble(params)
            sol = solve_qp_dense(P, q, A, l, ub, x0=w, y0=y, **skw)
            u_opt = sol.x[:N * nu].reshape(N, nu)
            x_opt = spec.recover_x(xfree, G, sol.x)
            J = sol.obj + const
            pri_rel = sol.pri_res / jnp.maximum(1.0, sol.pri_sc)
            dua_rel = sol.dua_res / jnp.maximum(1.0, sol.dua_sc)
            rho_k = accuracy_ratio(x_opt.astype(x_traj.dtype),
                                   u_opt.astype(u_traj.dtype),
                                   x_traj, u_traj, J.astype(x_traj.dtype))
            ok = (sol.solved | ((pri_rel < acc_pri) & (dua_rel < acc_dua))) \
                & (rho_k <= rho_gate) & jnp.isfinite(rho_k)
            x_keep = jnp.where(ok, x_opt.astype(x_traj.dtype), x_traj)
            u_keep = jnp.where(ok, u_opt.astype(u_traj.dtype), u_traj)
            w_keep = jnp.where(ok, sol.x, jnp.zeros_like(sol.x))
            y_keep = jnp.where(ok, sol.y, jnp.zeros_like(sol.y))
            stats = jnp.stack([sol.pri_res, sol.dua_res, sol.pri_sc,
                               sol.dua_sc,
                               sol.solved.astype(spec.dtype),
                               J, rho_k.astype(spec.dtype)])
            return x_keep, u_keep, w_keep, y_keep, ok, stats

        def step(x0, x_init, u_init, z, u_des, w0, y0):
            x_traj, u_traj, w, y = x_init, u_init, w0, y0
            any_ok = jnp.asarray(False)
            for _ in range(n_rounds):  # unrolled fused SCP rounds
                x_traj, u_traj, w, y, ok, stats = one_round(
                    x_traj, u_traj, x0, z, u_des, w, y)
                any_ok = any_ok | ok
            if nlobs:
                z_opt = jax.vmap(model.dyn_sys.C_map)(x_traj)
            else:
                z_opt = x_traj @ H.T
            return x_traj, u_traj, z_opt, w, y, stats, any_ok

        return jax.jit(step)

    def _plan_excursion(self, z_opt, z_arr):
        """Max deviation of the planned output TAIL from the horizon target.

        Measured on ALL output axes over the tail half of the horizon. A
        correct MPC plan may START far from the target — x0 is wherever the
        plant actually is — but must CONVERGE toward it, so the initial
        transient is exempt and only the tail is policed. Rejecting plans by
        their whole-horizon excursion vetoed exactly the recovery plans a
        perturbed belief needs, and the loop then replayed stale plans
        open-loop (round-4 trunk: 246/500 rejects, 60 mm RMSE). Unweighted
        axes count too: the round-4 blow-up was on the trunk's Qz=0 z axis,
        which a weighted-only guard cannot see. A plan whose tail stays
        inside the bound on every axis is by construction not the
        model-extrapolation runaway this guard exists to stop."""
        z_o = np.asarray(z_opt, float)
        diff = np.abs(z_o - np.asarray(z_arr))[z_o.shape[0] // 2:]
        return float(np.max(diff)) if diff.size else 0.0

    def _solve_device_tr(self, x0, u_init, x_init, z, u):
        """Full trust-region SCP loop on device: ONE dispatch per MPC query
        (scp/gusto_jit.py while_loop — linearize, assemble, fixed-iteration
        ADMM, TR accept/reject, delta/omega schedules, convergence). Keeps
        the reference's TR semantics (gusto.py:283-488) at real-time cost:
        the host loop pays a device->host->device bounce per SCP iteration
        (~25 ms RTT each on the tunneled TPU); this path pays one."""
        t0 = time.time()
        N, nz, nu = self.N, self.n_z, self.n_u
        n_x = self._jit_tr.n_x
        z_arr = np.zeros((N + 1, nz)) if z is None else np.asarray(z)
        u_des = np.zeros((N, nu)) if u is None else np.asarray(u)
        # one packed download (x | u | iters, converged, J): five separate
        # fetches each paid ~an RTT on the tunneled TPU and dominated the
        # solve wall time (104 ms mean in the r5 trunk campaign)
        flat = np.asarray(self._jit_tr.solve_packed(
            np.asarray(x0, float), np.asarray(u_init, float),
            np.asarray(x_init, float), z_arr, u_des), float)
        nX = (N + 1) * n_x
        x_opt = flat[:nX].reshape(N + 1, n_x)
        u_opt = flat[nX:nX + N * nu].reshape(N, nu)
        res_iters = int(flat[-3]) if np.isfinite(flat[-3]) else -1
        res_converged = bool(flat[-2] > 0.5) if np.isfinite(flat[-2]) else False
        success = bool(np.isfinite(x_opt).all() and np.isfinite(u_opt).all())
        if not success:
            self.reject_log.append({"reason": "nonfinite",
                                    "iters": res_iters})
        z_opt = self._z_of(x_opt) if success else None
        if success and self._plan_bound is not None:
            exc = self._plan_excursion(z_opt, z_arr)
            if not np.isfinite(exc) or exc > self._plan_bound:
                print(f"device-TR plan rejected (tail excursion {exc:.1f} > "
                      f"{self._plan_bound:.1f}, iters {res_iters}, "
                      f"converged {res_converged})")
                self.reject_log.append({
                    "reason": "excursion", "excursion": float(exc),
                    "iters": res_iters,
                    "converged": res_converged})
                success = False
        if success:
            self.xopt = x_opt
            self.uopt = u_opt
            self.zopt = np.asarray(z_opt, float)
        else:
            # keep-old-plan failure semantics (same as the host loop)
            self.plan_rejects += 1
            self.xopt = np.asarray(x_init, float)
            self.uopt = np.asarray(u_init, float)
            self.zopt = self._z_of(self.xopt)
        self.itr_count = res_iters
        self.locp_solve_time = time.time() - t0
        self.x_k = self.xopt
        self.u_k = self.uopt
        return

    def _solve_oneshot(self, x0, u_init, x_init, z, u):
        """Fast path for max_gusto_iters=0 (see __init__). Mirrors the host
        loop's single-iteration semantics: accept on the adapter's relative
        residual thresholds, keep the previous plan on solver failure."""
        t0 = time.time()
        spec = self.locp.spec
        sdt = spec.dtype
        N, nz, nu = spec.N, spec.n_z, spec.n_u
        z_arr = np.zeros((N + 1, nz)) if z is None else np.asarray(z)
        u_des = np.zeros((N, nu)) if u is None else np.asarray(u)
        x_opt, u_opt, z_opt, w, y, stats, any_ok = self._oneshot(
            jnp.asarray(np.asarray(x0), sdt),
            jnp.asarray(np.asarray(x_init), sdt),
            jnp.asarray(np.asarray(u_init), sdt),
            jnp.asarray(z_arr, sdt), jnp.asarray(u_des, sdt),
            self._os_w, self._os_y)
        st = np.asarray(stats, float)
        pri_rel = st[0] / max(1.0, st[2])
        dua_rel = st[1] / max(1.0, st[3])
        # the per-round residual + accuracy gates already ran on device;
        # any_ok says whether ANY fused round was accepted (a fully-rejected
        # call returns the incoming plan unchanged)
        success = bool(any_ok)
        if success and self._plan_bound is not None:
            exc = self._plan_excursion(z_opt, z_arr)
            if not np.isfinite(exc) or exc > self._plan_bound:
                print(f"one-shot plan rejected (tail excursion {exc:.1f} > "
                      f"{self._plan_bound:.1f})")
                self.reject_log.append({
                    "reason": "excursion", "excursion": float(exc)})
                success = False
        if success:
            self.xopt = np.asarray(x_opt, float)
            self.uopt = np.asarray(u_opt, float)
            self.zopt = np.asarray(z_opt, float)
            if self._warm_start:
                self._os_w, self._os_y = w, y
        else:
            # same failure semantics as the host loop: return the previous
            # iterate so the controller keeps flying the old plan. Drop the
            # ADMM warm start too — duals of a rejected solve would seed the
            # next one with the same garbage.
            print("one-shot LOCP not accepted "
                  f"(pri_rel {pri_rel:.2e}, dua_rel {dua_rel:.2e}, "
                  f"rho_k {st[6]:.2e})")
            if not bool(any_ok):  # excursion rejects logged above
                self.reject_log.append({
                    "reason": "residual", "pri_rel": float(pri_rel),
                    "dua_rel": float(dua_rel), "rho_k": float(st[6])})
            self.plan_rejects += 1
            self.xopt = np.asarray(x_init, float)
            self.uopt = np.asarray(u_init, float)
            self.zopt = self._z_of(self.xopt)
            self._os_w = jnp.zeros_like(self._os_w)
            self._os_y = jnp.zeros_like(self._os_y)
        self.itr_count = 1
        self.locp_solve_time = time.time() - t0
        self.x_k = self.xopt
        self.u_k = self.uopt
        return

    def solve(self, x0, u_init, x_init, z=None, zf=None, u=None):
        """SCP iteration loop; semantics follow gusto.py:283-488."""
        if self._jit_tr is not None:
            return self._solve_device_tr(x0, u_init, x_init, z, u)
        if self._oneshot is not None and self.params.max_gusto_iters == 0:
            return self._solve_oneshot(x0, u_init, x_init, z, u)
        t0 = time.time()
        t_locp = 0.0
        p = self.params
        itr = 0
        self.u_k = np.asarray(u_init, float)
        self.x_k = np.asarray(x_init, float)

        A_d, B_d, d_d = self._traj_dyn(jnp.asarray(self.x_k[:-1]),
                                       jnp.asarray(self.u_k))
        if self.nonlinear_observer:
            H_d, c_d = self._traj_obs(jnp.asarray(self.x_k))
        else:
            H_d, c_d = None, None

        new_solution = True
        Jstar_prev = np.inf
        delta_prev = np.inf
        omega_prev = np.inf
        converged = False
        delta = p.delta0
        omega = p.omega0

        if self.verbose >= 1:
            print("|   J   | TR_viol |  rho_k  |  X_viol |   x-x_k |  delta  |  omega |")

        while itr <= p.max_gusto_iters and not converged and omega <= p.omega_max:
            rho_k = -1.0
            max_violation = -1.0
            dsol = -1.0
            delta_cur, omega_cur = delta, omega

            self.locp.update(A_d, B_d, d_d, np.asarray(x0, float), self.x_k,
                             delta, omega, z=z, zf=zf, u=u, Hd=H_d, cd=c_d,
                             full=new_solution)
            new_solution = False

            Jstar, success, _ = self.locp.solve()
            if not success:
                print(f"Iteration {itr} of problem cannot be solved")
                self.xopt = np.copy(self.x_k)
                self.uopt = np.copy(self.u_k)
                self.zopt = self._z_of(self.xopt)
                self.locp_solve_time = t_locp
                return
            t_locp += self.locp.solve_time

            x_next, u_next, _ = self.locp.get_solution()

            e_tr, tr_satisfied = self.is_in_trust_region(x_next, delta)
            if tr_satisfied:
                rho_k = self.compute_accuracy(x_next, u_next, Jstar)
                if rho_k > p.rho and itr != 1:
                    delta = p.beta_fail * delta
                else:
                    # Modification 1 (gusto.py:386-394)
                    if delta_prev == delta and omega_prev == omega and Jstar_prev <= Jstar:
                        delta = p.beta_fail * delta
                    delta_prev, Jstar_prev, omega_prev = delta, Jstar, omega

                    if self.nonlinear_observer:
                        z_traj = np.asarray(jax.vmap(self.model.dyn_sys.C_map)(
                            jnp.asarray(x_next)))
                        max_violation, X_satisfied = self.state_constraints_violated(
                            x_next, z_traj=z_traj)
                    else:
                        max_violation, X_satisfied = self.state_constraints_violated(x_next)

                    # Modification 3 (gusto.py:407-415): only grow omega
                    if not X_satisfied:
                        omega = p.gamma_fail * omega

                    dsol, converged = self.is_converged(x_next, u_next)
                    if not X_satisfied:
                        converged = False
                    new_solution = True
            else:
                omega = p.gamma_fail * omega

            itr += 1

            if self.verbose >= 1:
                print(f"{Jstar:.2e}, {e_tr:.2e}, {rho_k:.2e}, "
                      f"{max_violation:.2e}, {dsol:.2e}, {delta_cur:.2e}, "
                      f"{omega_cur:.2e}, {itr}")

            if new_solution:
                self.x_k = x_next.copy()
                self.u_k = u_next.copy()
                if p.max_gusto_iters >= 1:
                    A_d, B_d, d_d = self._traj_dyn(jnp.asarray(self.x_k[:-1]),
                                                   jnp.asarray(self.u_k))
                    if self.nonlinear_observer:
                        H_d, c_d = self._traj_obs(jnp.asarray(self.x_k))

        t_gusto = time.time() - t0
        if omega > p.omega_max:
            print("omega > omega_max, solution did not converge")
        if self.verbose >= 1:
            print(f"Solved in {itr} iterations/{t_gusto:.3f} s "
                  f"({t_locp:.3f} s in LOCP)")

        self.itr_count = itr
        self.xopt = np.copy(self.x_k)
        self.uopt = np.copy(self.u_k)
        self.zopt = self._z_of(self.xopt)
        self.locp_solve_time = t_locp

    def _z_of(self, x):
        if self.nonlinear_observer:
            return np.asarray(jax.vmap(self.model.dyn_sys.C_map)(jnp.asarray(x)))
        return np.asarray(x @ np.asarray(self.model.H).T)

    def get_solution(self):
        return self.xopt, self.uopt, self.zopt, self.locp_solve_time
