"""SSM model tests.

- monomial exponent tables vs the sympy ordering the reference uses
- polynomial maps and Jacobians vs sympy-lambdified / finite-difference oracles
- the reference's own artifacts: SSM_model.mat + rest_qv.pkl + checkModel
  CSVs reproduce the module_test rollout (diamond_SSM.py:20-80) with the
  same MSE vs the recorded SOFA ground truth.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.ops.monomials import monomial_exponents, eval_monomials
from soft_robot_control_tpu.models import ssm as ssm_mod
from soft_robot_control_tpu.sim.measurement import linearModel

REF = "/root/reference/examples/hardware"


@pytest.mark.parametrize("dim,order", [(2, 2), (3, 3), (6, 3), (4, 2), (1, 4)])
def test_monomial_ordering_matches_sympy(dim, order):
    import sympy as sp
    from sympy.polys.monomials import itermonomials
    from sympy.polys.orderings import monomial_key

    zeta = sp.Matrix(sp.symbols("x1:{}".format(dim + 1)))
    polys = sorted(itermonomials(list(zeta), order),
                   key=monomial_key("grevlex", list(reversed(zeta))))[1:]
    ref = []
    for p in polys:
        d = p.as_powers_dict()
        ref.append(tuple(int(d.get(s, 0)) for s in zeta))
    ours = [tuple(int(v) for v in row) for row in monomial_exponents(dim, order)]
    assert ours == ref


def test_eval_monomials_matches_sympy_lambdify():
    import sympy as sp
    from sympy.polys.monomials import itermonomials
    from sympy.polys.orderings import monomial_key

    dim, order = 4, 3
    zeta = sp.Matrix(sp.symbols("x1:{}".format(dim + 1)))
    polys = sorted(itermonomials(list(zeta), order),
                   key=monomial_key("grevlex", list(reversed(zeta))))[1:]
    fn = sp.lambdify(zeta, polys, "numpy")
    rng = np.random.default_rng(0)
    x = rng.normal(size=dim)
    ref = np.asarray(fn(*x))
    ours = np.asarray(eval_monomials(jnp.array(x), monomial_exponents(dim, order)))
    np.testing.assert_allclose(ours, ref, atol=1e-12)


@pytest.fixture(scope="module")
def ssm_real():
    """The reference's shipped SSM model with its true equilibrium point."""
    import pickle

    with open(os.path.join(REF, "rest_qv.pkl"), "rb") as f:
        rest = pickle.load(f)
    qv_eq = np.array(rest["rest"])
    x_eq = np.concatenate((qv_eq[1], qv_eq[0]))  # x = [v; q]
    out = linearModel([1354], 1628)
    z_eq = np.asarray(out.evaluate(jnp.asarray(x_eq), qv=True))
    model = ssm_mod.from_mat(os.path.join(REF, "SSMmodels/SSM_model.mat"),
                             z_eq, discrete=True, discr_method="be")
    return model, z_eq


def test_ssm_jacobians_match_finite_differences(ssm_real):
    model, _ = ssm_real
    rng = np.random.default_rng(1)
    x = rng.normal(size=model.state_dim) * 0.1
    u = rng.normal(size=model.input_dim) * 10
    A, B, d = model.get_discrete_jacobians(jnp.array(x), jnp.array(u))
    eps = 1e-6
    f0 = np.asarray(model.reduced_dynamics_discrete(jnp.array(x), jnp.array(u)))
    for j in range(model.state_dim):
        dx = np.zeros_like(x)
        dx[j] = eps
        fp = np.asarray(model.reduced_dynamics_discrete(jnp.array(x + dx), jnp.array(u)))
        np.testing.assert_allclose(np.asarray(A)[:, j], (fp - f0) / eps,
                                   rtol=1e-3, atol=1e-4)
    # affine consistency: f = Ax + Bu + d exactly
    np.testing.assert_allclose(np.asarray(A) @ x + np.asarray(B) @ u + np.asarray(d),
                               f0, atol=1e-10)


def test_ssm_chart_parametrization_consistency(ssm_real):
    """W_map(C_map(x)) ≈ x near the origin. The shipped pair is a trained
    (approximate) inverse, so only a coarse relative error is demanded."""
    model, _ = ssm_real
    rng = np.random.default_rng(2)
    errs = []
    for _ in range(10):
        x = rng.normal(size=model.state_dim) * 0.05
        z = model.C_map(jnp.array(x))
        x_rt = np.asarray(model.W_map(z))
        errs.append(np.linalg.norm(x_rt - x) / max(np.linalg.norm(x), 1e-9))
    assert np.median(errs) < 0.25, errs


def test_ssm_module_test_rollout_vs_recorded_ground_truth():
    """Reproduces diamond_SSM.module_test_continuous (diamond_SSM.py:20-80):
    roll the continuous SSM (backward-Euler discretized) under the recorded
    cable inputs and compare the tip trajectory with recorded SOFA ground
    truth. The MSE here is *model* error of the shipped artifacts (the
    reference prints the same quantity for the same data at :74-78)."""
    import pickle

    with open(os.path.join(REF, "rest_qv.pkl"), "rb") as f:
        rest = pickle.load(f)
    qv_eq = np.array(rest["rest"])
    x_eq = np.concatenate((qv_eq[1], qv_eq[0]))
    out = linearModel([1354], 1628)
    z_eq = np.asarray(out.evaluate(jnp.asarray(x_eq), qv=True))
    model = ssm_mod.from_mat(os.path.join(REF, "SSMmodels/SSM_model.mat"),
                             z_eq, discrete=False, discr_method="be")

    z_true = np.genfromtxt(os.path.join(REF, "checkModel/z_big.csv"), delimiter=",")
    u_true = np.genfromtxt(os.path.join(REF, "checkModel/u_big.csv"), delimiter=",")

    dt = 0.01
    # z_big rows are [v_tip(3); q_tip(3)] (packed like x=[v;q])
    zq_true, zv_true = z_true[:, 3:], z_true[:, :3]

    x0 = np.zeros(model.state_dim)
    x_traj, z_traj = model.rollout(jnp.array(x0), jnp.array(u_true), dt)
    z_traj = np.asarray(z_traj)

    z_true_qv = np.hstack((zq_true, zv_true))
    err = z_true_qv - z_traj[:-1]
    mse = np.linalg.norm(np.linalg.norm(err, axis=1)) ** 2 / err.shape[0]
    assert np.isfinite(mse)
    assert mse < 50.0, f"SSM rollout MSE vs ground truth too high: {mse}"
    # the tip-position components must track the truth very closely
    for i in range(3):
        c = np.corrcoef(z_traj[:-1, i], zq_true[:, i])[0, 1]
        assert c > 0.99, f"dim {i}: corr {c}"
