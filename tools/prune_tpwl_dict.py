"""Prune a TPWL dictionary to a target size with a greedy distance pass.

The task-matched trunk collection (figure-8 traj_tracking segments mixed
into the LHS data, reference trunk.py:186-192) produces a dense dictionary
(P ~ 4900 at threshold 15): points along slowly-swept orbits sit far closer
together than the build threshold requires. A greedy thin-out in visit
order — keep a point iff its weighted distance to every kept point exceeds
tau — preserves orbit coverage while shrinking P, the committed artifact,
the per-step nearest-point matmul, and the per-point DARE-gain setup.

Distance metric matches the model's nearest-point selection
(models/tpwl.py dist_weights {q:10, v:1}, squared Euclidean in reduced
coordinates), so the pruned model's point selection approximates the full
model's wherever kept points are dense.

    python tools/prune_tpwl_dict.py --dict examples/trunk_tet/tpwl_model_snapshots.pkl \
        --target 1200 --check
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def greedy_keep(q, v, tau, wq=10.0, wv=1.0):
    """Indices kept by one greedy pass in storage (visit) order.

    The local threshold is GRADED by distance from the rest point (point 0):
    tau_i = tau * (0.05 + d(x_i, x_rest) / d_max). Small-amplitude orbits
    near rest — exactly the closed-loop task regime — keep proportionally
    finer resolution; a uniform tau wipes them first (their inter-point
    distances are smallest) and the pruned model's small-amplitude fidelity
    collapses while large orbits stay exact."""
    P = q.shape[0]
    d_rest = wq * np.sum((q - q[0]) ** 2, axis=1) + \
        wv * np.sum((v - v[0]) ** 2, axis=1)
    grade = 0.05 + d_rest / max(d_rest.max(), 1e-12)
    kept = [0]
    kq = [q[0]]
    kv = [v[0]]
    for i in range(1, P):
        d = wq * np.sum((np.asarray(kq) - q[i]) ** 2, axis=1) + \
            wv * np.sum((np.asarray(kv) - v[i]) ** 2, axis=1)
        if d.min() > tau * grade[i]:
            kept.append(i)
            kq.append(q[i])
            kv.append(v[i])
    return np.asarray(kept)


def prune(data, target, wq=10.0, wv=1.0):
    q = np.asarray(data["q"], np.float64)
    v = np.asarray(data["v"], np.float64)
    # bisect tau to land within ~5% of the target point count
    lo, hi = 0.0, float(wq * np.sum((q.max(0) - q.min(0)) ** 2)
                        + wv * np.sum((v.max(0) - v.min(0)) ** 2))
    kept = np.arange(q.shape[0])
    for _ in range(40):
        tau = 0.5 * (lo + hi)
        kept = greedy_keep(q, v, tau, wq, wv)
        n = len(kept)
        if abs(n - target) <= max(1, int(0.05 * target)):
            break
        if n > target:
            lo = tau
        else:
            hi = tau
    out = dict(data)
    for k in ("q", "v", "u", "A_c", "B_c", "d_c", "A_d", "B_d", "d_d"):
        if k in data and data[k] is not None:
            out[k] = np.asarray(data[k])[kept]
    out["info"] = dict(data.get("info", {}))
    out["info"]["nbr_lin"] = str(len(kept))
    out["info"]["pruned_from"] = int(q.shape[0])
    out["info"]["prune_tau"] = float(tau)
    return out, kept, tau


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dict", required=True)
    ap.add_argument("--target", type=int, default=1200)
    ap.add_argument("--out", default=None,
                    help="default: overwrite --dict (old file kept as .full)")
    ap.add_argument("--check", action="store_true",
                    help="model-vs-model rollout check on held-out figure-8 "
                    "inputs (pruned vs full TPWL, no plant sim)")
    ap.add_argument("--robot", default="trunk", choices=["trunk", "diamond"])
    args = ap.parse_args()

    with open(args.dict, "rb") as f:
        data = pickle.load(f)
    P0 = np.asarray(data["q"]).shape[0]
    out, kept, tau = prune(data, args.target)
    print(f"pruned P {P0} -> {len(kept)} (tau {tau:.4g})", flush=True)

    if args.check:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from soft_robot_control_tpu.models.tpwl import from_tpwl_dict
        from soft_robot_control_tpu.robots.robots import (DiamondTetRobot,
                                                          TrunkTetRobot)

        robot = (TrunkTetRobot(dtype=np.float32) if args.robot == "trunk"
                 else DiamondTetRobot(dtype=np.float32))
        Hf = robot.get_output_model()
        params = {"dist_weights": {"q": 10.0, "v": 1.0}}
        m_full = from_tpwl_dict(data, params=params, Hf=Hf,
                                discr_method="be").pre_discretize(robot.dt)
        m_prun = from_tpwl_dict(out, params=params, Hf=Hf,
                                discr_method="be").pre_discretize(robot.dt)
        worst = 0.0
        for amp, period in ((75.0, 1.25), (125.0, 1.75), (175.0, 2.25)):
            u_seq, _, _ = robot.sequences.traj_tracking(amplitude=amp,
                                                        period=period)
            u = jnp.asarray(np.asarray(u_seq).T, jnp.float32)
            x0 = m_full.rom.project_x(m_full.rom.x_ref)
            _, zf = m_full.rollout(jnp.asarray(x0), u, robot.dt)
            _, zp = m_prun.rollout(jnp.asarray(x0), u, robot.dt)
            zf, zp = np.asarray(zf), np.asarray(zp)
            rel = (np.linalg.norm(zp - zf)
                   / max(np.linalg.norm(zf - zf.mean(0)), 1e-9))
            print(f"  fig-8 amp {amp:5.0f} period {period}: pruned-vs-full "
                  f"rel {rel:.4f}", flush=True)
            worst = max(worst, rel)
        if worst > 0.10:
            print(f"CHECK FAILED: pruned model deviates {worst:.3f} > 0.10 "
                  "from the full model — raise --target", flush=True)
            sys.exit(1)

    dst = args.out or args.dict
    if dst == args.dict:
        os.replace(args.dict, args.dict + ".full")
        print(f"original kept at {args.dict}.full", flush=True)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(out, f)
    os.replace(tmp, dst)
    print(f"wrote {dst} (P={len(kept)})", flush=True)


if __name__ == "__main__":
    main()
