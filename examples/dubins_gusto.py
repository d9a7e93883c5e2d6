#!/usr/bin/env python
"""GuSTO sanity demo on the analytic Dubins car — the SOFA-free solver
check (role of sofacontrol/scp/example.py).

    python examples/dubins_gusto.py [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            # solver accuracy targets assume f64 off-TPU
            jax.config.update("jax_enable_x64", True)

    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.dubins import DubinsCar
    from soft_robot_control_tpu.scp.gusto import GuSTO

    model = DubinsCar()
    N, dt = 50, 0.1
    Qz = np.zeros((3, 3))
    R = np.eye(2)
    Qzf = 100 * np.eye(3)
    zf_des = np.array([4.0, 5.0, 0.0])
    x0 = np.zeros(3)
    u_init = np.zeros((N, 2))
    x_init = np.asarray(model.rollout(x0, u_init, dt))
    dU = HyperRectangle(np.array([0.1, 0.1]), np.array([-0.1, -0.1]))

    gusto = GuSTO(model, N, dt, Qz, R, x0, u_init, x_init, u=u_init,
                  zf=zf_des, Qzf=Qzf, dU=dU, verbose=1, warm_start=True,
                  x_char=np.array([1.0, 1.0, np.pi]))
    x, u, z, t_solve = gusto.get_solution()
    print(f"terminal state: {np.round(x[-1], 3)} (target {zf_des})")
    print(f"max |du|: {np.abs(np.diff(u, axis=0)).max():.3f} (limit 0.1)")
    print(f"LOCP time: {t_solve:.3f} s over {gusto.itr_count} SCP iterations")


if __name__ == "__main__":
    main()
