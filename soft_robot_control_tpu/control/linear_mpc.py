"""Linear time-invariant MPC service (trust region off).

Capability parity with sofacontrol/baselines/ros.py: the LOCP with
is_tr_active=False and constant (A_d, B_d, d_d) replicated over the horizon,
wrapped in the same client contract as GuSTOService (send_request /
check_if_done / force_wait / get_solution). Used by the Koopman and ROMPC
controllers. On failure the previous plan is extended by repeating its last
step (ros.py:93-96, 223-226).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from soft_robot_control_tpu.scp.locp import LOCP


def _interp_rows_fill(tq, t, Y):
    t = np.asarray(t, float)
    Y = np.asarray(Y, float)
    return np.stack([np.interp(tq, t, Y[:, j]) for j in range(Y.shape[1])],
                    axis=1)


class LinearMPCService:
    """Persistent linear MPC solver with the ROS-node semantics."""

    def __init__(self, model, N, dt, cost_params, target, U=None, X=None,
                 Xf=None, dU=None, verbose=0, warm_start=True, **kwargs):
        self.model = model
        self.N = N
        self.dt = dt
        self.target = target
        self.cost_params = cost_params
        self.verbose = verbose

        locp_backend = kwargs.pop("locp_backend", "dense")
        if locp_backend == "condensed":
            # states eliminated exactly — the sparse LOCP's big KKT system
            # stalls f32 ADMM on TPU (see scp/gusto.py backend notes); the
            # condensed QP is tiny and solves in one shot.
            from soft_robot_control_tpu.scp.locp_condensed import (
                CondensedLOCPAdapter)

            self.locp = CondensedLOCPAdapter(
                N, np.asarray(model.H), np.asarray(cost_params.Q),
                np.asarray(cost_params.R),
                Qzf=None if cost_params.Qf is None
                else np.asarray(cost_params.Qf),
                U=U, X=X, Xf=Xf, dU=dU,
                warm_start=warm_start, is_tr_active=False, **kwargs)
        else:
            self.locp = LOCP(N, np.asarray(model.H), np.asarray(cost_params.Q),
                             np.asarray(cost_params.R),
                             Qzf=None if cost_params.Qf is None else np.asarray(cost_params.Qf),
                             U=U, X=X, Xf=Xf, dU=dU, verbose=(verbose == 2),
                             warm_start=warm_start, is_tr_active=False, **kwargs)

        n = np.asarray(model.A_d).shape[0]
        self.A_d = np.tile(np.asarray(model.A_d), (N, 1, 1))
        self.B_d = np.tile(np.asarray(model.B_d), (N, 1, 1))
        d = (np.asarray(model.d_d).reshape(-1) if hasattr(model, "d_d")
             and model.d_d is not None else np.zeros(n))
        self.d_d = np.tile(d, (N, 1))

        self.xopt = None
        self.uopt = None
        self.topt = self.dt * np.arange(self.N + 1)
        self.t_solve = 0.0
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def get_target(self, t0):
        """(z, zf, u) over the horizon (baselines/ros.py get_target)."""
        tq = t0 + self.dt * np.arange(self.N + 1)
        tgt = self.target
        z = None
        if tgt.z is not None:
            z_arr = np.asarray(tgt.z, float)
            if z_arr.ndim == 2:
                z = _interp_rows_fill(tq, tgt.t, z_arr)
            else:
                z = np.tile(z_arr, (self.N + 1, 1))
        zf = z[-1, :] if (self.cost_params.Qf is not None and z is not None) else None
        u = None
        if tgt.u is not None:
            u_arr = np.asarray(tgt.u, float)
            if u_arr.ndim == 2:
                u = _interp_rows_fill(tq[:-1], tgt.t, u_arr)
            else:
                u = np.tile(u_arr, (self.N, 1))
        return z, zf, u

    def _solve(self, t0, x0):
        z, zf, u = self.get_target(t0)
        xk = np.zeros((self.N + 1, self.locp.spec.n_x))
        self.locp.update(self.A_d, self.B_d, self.d_d, np.asarray(x0, float),
                         xk, 0.0, 0.0, z=z, zf=zf, u=u)
        Jstar, success, _ = self.locp.solve()
        with self._lock:
            if success:
                self.xopt, self.uopt, _ = self.locp.get_solution()
            elif self.xopt is not None:
                # extend the previous plan (ros.py:93-96)
                self.xopt = np.concatenate((self.xopt[1:], self.xopt[-1:]), axis=0)
                self.uopt = np.concatenate((self.uopt[1:], self.uopt[-1:]), axis=0)
            else:
                raise RuntimeError("first linear MPC solve failed")
            self.t_solve = self.locp.solve_time
            self.topt = t0 + self.dt * np.arange(self.N + 1)

    # client API -----------------------------------------------------------
    def send_request(self, t0, x0, wait=True):
        if wait:
            self._solve(t0, x0)
        else:
            self._thread = threading.Thread(target=self._solve, args=(t0, x0),
                                            daemon=True)
            self._thread.start()

    def check_if_done(self):
        return self._thread is None or not self._thread.is_alive()

    def force_wait(self):
        if self._thread is not None:
            self._thread.join()

    def force_spin(self):
        pass

    def get_solution(self, n_x=None, n_u=None):
        self.force_wait()
        with self._lock:
            return (self.topt.copy(), self.uopt.copy(), self.xopt.copy(),
                    self.t_solve)


def run_linear_mpc(model, N, dt, cost_params, x0, target, U=None, X=None,
                   Xf=None, dU=None, verbose=0, warm_start=True, **kwargs):
    """One-shot synchronous solve (runMPCSolver, baselines/ros.py:22-27)."""
    svc = LinearMPCService(model, N, dt, cost_params, target, U=U, X=X,
                           Xf=Xf, dU=dU, verbose=verbose,
                           warm_start=warm_start, **kwargs)
    svc.send_request(0.0, x0, wait=True)
    t, u, x, _ = svc.get_solution()
    z = x @ np.asarray(model.H).T
    return x, u, z, t
