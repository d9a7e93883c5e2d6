"""BASELINE config 4 with a natively-trained Trunk SSM (no MATLAB).

The committed examples/trunk_tet/trunk_SSM_model.mat is identified by
models/ssm_learn.py from decay + actuated campaigns on the 709-node tet-FEM
Trunk (examples/trunk_ssm_campaign.py) and carries its equilibrium z_ref.
The closed-loop test runs the SSM MPC (manifold observer, feedforward,
max_gusto_iters=0) with the SSM-as-plant — the same harness as the
reference-artifact config-4 test (tests/test_ssm_mpc.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.models import ssm as ssm_mod

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples", "trunk_tet", "trunk_SSM_model.mat")

pytestmark = pytest.mark.skipif(not os.path.exists(ART),
                                reason="trunk SSM artifact not present")


@pytest.fixture(scope="module")
def trunk_ssm():
    model = ssm_mod.from_mat(ART, None, discrete=False, discr_method="be")
    assert np.isfinite(np.asarray(model.z_ref)).all()  # artifact carries it
    return model


def test_trunk_ssm_dims_and_stability(trunk_ssm):
    m = trunk_ssm
    assert m.state_dim == 6 and m.input_dim == 8 and m.output_dim == 6
    # unforced decay from a small on-manifold state contracts
    z0 = 2.0 * np.ones(6)
    x0 = m.observed_to_reduced(jnp.asarray(z0))
    xs, _ = m.rollout(x0, jnp.zeros((200, 8)), 0.01)
    n0 = float(jnp.linalg.norm(xs[0]))
    nT = float(jnp.linalg.norm(xs[-1]))
    assert np.isfinite(nT) and nT < n0


def test_trunk_ssm_gusto_solves(trunk_ssm):
    """One GuSTO solve on the trained model moves the tip toward the
    target through the learned input matrix."""
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.interfaces import SSMGuSTO
    from soft_robot_control_tpu.scp.gusto import GuSTO

    m = trunk_ssm
    gm = SSMGuSTO(m)
    N, dt = 3, 0.03
    nz = m.output_dim
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-6 * np.eye(8)
    z = np.zeros((N + 1, nz))
    z[:, 0] = -4.0
    x0 = np.zeros(m.state_dim)
    u_init = np.zeros((N, 8))
    xi, _ = m.rollout(jnp.asarray(x0), jnp.asarray(u_init), dt)
    U = HyperRectangle(800.0 * np.ones(8), np.zeros(8))
    g = GuSTO(gm, N, dt, Qz, R, x0, u_init, np.asarray(xi), z=z, U=U,
              verbose=0, max_gusto_iters=0)
    xopt, uopt, zopt, _ = g.get_solution()
    assert np.all(np.isfinite(np.asarray(uopt)))
    assert np.asarray(zopt)[-1, 0] < -1.0  # moved toward the -4 mm target


@pytest.mark.slow
def test_trunk_ssm_mpc_closed_loop(trunk_ssm):
    """Config 4: SSM MPC, SSM-as-plant, circle tracking."""
    from soft_robot_control_tpu.control.mpc import scp_ssm
    from soft_robot_control_tpu.control.service import GuSTOService
    from soft_robot_control_tpu.core.constraints import HyperRectangle
    from soft_robot_control_tpu.models.interfaces import SSMGuSTO

    m = trunk_ssm
    gm = SSMGuSTO(m)
    dt = 0.02
    nz = m.output_dim
    t_target = np.arange(0, 10.0, dt)
    amp = 3.0
    z_target = np.zeros((len(t_target), nz))
    z_target[:, 0] = amp * np.cos(2 * np.pi * t_target / 6.0) - amp
    z_target[:, 1] = amp * np.sin(2 * np.pi * t_target / 6.0)
    Qz = np.zeros((nz, nz))
    Qz[0, 0] = Qz[1, 1] = 100.0
    R = 1e-6 * np.eye(8)
    U = HyperRectangle(800.0 * np.ones(8), np.zeros(8))
    service = GuSTOService(gm, 3, 3 * dt, Qz, R, np.zeros(m.state_dim),
                           t=t_target, z=z_target, U=U, verbose=0,
                           max_gusto_iters=0, convg_thresh=1e-2)
    controller = scp_ssm(m, None, dt, N_replan=2, delay=0.3, wait=True,
                         solver_service=service)
    controller.set_sim_timestep(dt)

    x = jnp.zeros(m.state_dim)
    u_prev = np.zeros(8)
    zs, ts = [], []
    for i in range(int(6.0 / dt)):
        t = i * dt
        z_unshift = np.asarray(m.x_to_zfyf(x))
        y = np.concatenate((z_unshift[3:], z_unshift[:3]))
        u = controller.evaluate(t, y, None, u_prev)
        x = m.update_state(x, jnp.asarray(u, x.dtype), dt)
        u_prev = u
        zs.append(np.asarray(m.x_to_zfyf(x)) - np.asarray(m.z_ref))
        ts.append(t)
    zs = np.asarray(zs)
    ts = np.asarray(ts)
    mask = ts > 1.5
    zx = np.interp(ts[mask] - 0.3, t_target, z_target[:, 0])
    zy = np.interp(ts[mask] - 0.3, t_target, z_target[:, 1])
    err = np.hypot(zs[mask, 0] - zx, zs[mask, 1] - zy)
    rel = np.sqrt(np.mean(err ** 2)) / amp
    assert rel < 0.5, f"trunk SSM MPC rel RMSE {rel:.3f}"
