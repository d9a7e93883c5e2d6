"""Diagnose the trunk device-TR GuSTO regression (60 mm / 246 rejects at HEAD).

Reproduces the campaign's solver configuration (examples/trunk_tet_campaign.py
--skip-collect MPC stage) WITHOUT the tet plant: builds the GuSTO solver on the
committed P=1450 dictionary and runs a sequence of MPC-style queries along the
figure-8 target, reporting per-query plan excursion / convergence / iterations.

    JAX_PLATFORMS=cpu python tools/diag_trunk_gusto.py --f64
    python tools/diag_trunk_gusto.py            # session TPU f32 (campaign cfg)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--f64", action="store_true")
ap.add_argument("--queries", type=int, default=12)
ap.add_argument("--host-tr", action="store_true",
                help="use the host TR loop instead of the default device_tr")
ap.add_argument("--perturb", type=float, default=0.0,
                help="scale of a random belief perturbation added to each "
                "query state (units of the model's characteristic dx) — "
                "emulates EKF/model mismatch in the real closed loop")
ap.add_argument("--dU", type=float, default=0.0,
                help="slew-rate box |u_{k+1}-u_k| <= dU (mN): >0 reproduces "
                "the campaign's documented condensed-dU in-loop mis-solve")
ap.add_argument("--cpu-f32", action="store_true",
                help="run on CPU in float32 (the campaign's solver dtype) "
                "without needing the session TPU")
ap.add_argument("--stride", type=int, default=2,
                help="plan steps advanced per query (campaign N_replan=2); "
                "larger strides sweep the figure-8 in fewer queries")
args = ap.parse_args()

import jax
if args.f64:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
elif args.cpu_f32:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from soft_robot_control_tpu.robots.robots import TrunkTetRobot
from soft_robot_control_tpu.tasks.recipes import load_tpwl
from soft_robot_control_tpu.models.interfaces import TPWLGuSTO
from soft_robot_control_tpu.control.service import GuSTOService
from soft_robot_control_tpu.core.constraints import HyperRectangle

dtype = np.float64 if args.f64 else np.float32
jdtype = jnp.float64 if args.f64 else jnp.float32

d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples", "trunk_tet")
robot = TrunkTetRobot(dtype=dtype)
dt = robot.dt
model = load_tpwl(robot, d).pre_discretize(dt)
gmodel = TPWLGuSTO(model)
Hf = robot.get_output_model()
print(f"dict P={model.num_points}, dt={dt}", flush=True)

# figure-8 target, campaign-identical
z_eq = Hf @ np.asarray(robot.plant.x_rest())
sim_duration = 11.0
T_target = sim_duration + 4.0
tt = np.linspace(0, T_target, 1000)
th = 2 * np.pi * tt / 10.0
z_target = np.tile(z_eq, (1000, 1))
z_target[:, 0] += -10.0 * np.sin(th)
z_target[:, 1] += 10.0 * np.sin(2 * th)
Qz = np.diag([100.0, 100.0, 0.0])
R = 1e-2 * np.eye(8)
U = HyperRectangle(250.0 * np.ones(8), np.zeros(8))
dU = (HyperRectangle(args.dU * np.ones(8), -args.dU * np.ones(8))
      if args.dU > 0 else None)

x0 = np.asarray(model.rom.project_x(model.rom.x_ref))
z_solver = np.asarray(model.zfyf_to_zy(zf=jnp.asarray(z_target)))

N = 50
kw = dict(locp_backend="condensed", dtype=jdtype, plan_bound=40.0)
if args.host_tr:
    kw.update(max_gusto_iters=10, convg_thresh=1e-2)
else:
    kw.update(device_tr=True, max_gusto_iters=5, convg_thresh=1e-2)

t0 = time.time()
service = GuSTOService(gmodel, N, dt, Qz, R, x0, t=tt, z=z_solver, U=U,
                       dU=dU, **kw)
g = service.gusto
print(f"[{time.time()-t0:.1f}s] constructed; construction solve: "
      f"rejects={getattr(g, 'plan_rejects', 0)}", flush=True)


def excursion(z_opt, z_arr):
    w = np.diag(Qz) > 0
    d = np.abs(np.asarray(z_opt, float) - z_arr)
    return float(np.max(d[:, w])), np.max(d, axis=0)


# emulate the MPC loop via the service (target interp + warm-start shift are
# the service's own code): at each replanning time t_k, x0 = the model state
# reached by rolling the previous accepted plan (ideal plant == model)
stride = max(1, min(args.stride, N - 1))
dt_replan = stride * dt   # campaign: N_replan=2

rng = np.random.default_rng(0)
dx_char = np.asarray(model.get_characteristic_dx(dt), float)
xq = x0
for k in range(args.queries):
    t_k = k * dt_replan
    zq, _, _ = service.get_target(t_k)
    rej0 = g.plan_rejects
    ts = time.time()
    if args.perturb > 0:
        xq = xq + args.perturb * dx_char * rng.standard_normal(xq.shape)
    service.send_request(t_k, xq, wait=True)
    el = (time.time() - ts) * 1e3
    exc, per_axis = excursion(g.zopt, zq)
    rejected = g.plan_rejects > rej0
    print(f"q{k:02d} t={t_k:5.2f} exc={exc:7.2f} mm "
          f"per-axis=[{per_axis[0]:6.2f} {per_axis[1]:6.2f} {per_axis[2]:6.2f}] "
          f"iters={g.itr_count:3d} rejected={rejected} solve={el:7.1f} ms",
          flush=True)
    # ideal plant: next belief = plan state at +stride steps
    xq = np.asarray(service.xopt[stride])
print("total rejects:", g.plan_rejects)
