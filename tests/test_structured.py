"""Block-tridiagonal KKT solver: agreement with dense solves on real LOCP
structures (incl. dU coupling) and with dense ADMM end to end."""

import numpy as np
import jax.numpy as jnp
import pytest

from soft_robot_control_tpu.control.batch_mpc import admm_fixed
from soft_robot_control_tpu.core.constraints import HyperRectangle
from soft_robot_control_tpu.qp.structured import StructuredKKT, admm_fixed_btd
from soft_robot_control_tpu.qp.admm import OSQP_RHO_EQ_SCALE
from soft_robot_control_tpu.scp.locp import LOCPParams, LOCPSpec


def _locp_qp(N=8, nx=5, nu=2, nz=2, seed=0, with_dU=True):
    rng = np.random.default_rng(seed)
    H = rng.normal(size=(nz, nx))
    U = HyperRectangle(np.ones(nu), -np.ones(nu))
    dU = HyperRectangle(0.3 * np.ones(nu), -0.3 * np.ones(nu)) if with_dU else None
    spec = LOCPSpec(N, H, np.eye(nz), 0.1 * np.eye(nu), U=U, dU=dU,
                    is_tr_active=False)
    Ad = rng.normal(size=(N, nx, nx)) * 0.3 + 0.7 * np.eye(nx)
    Bd = rng.normal(size=(N, nx, nu))
    dd = 0.05 * rng.normal(size=(N, nx))
    x0 = rng.normal(size=nx) * 0.3
    params = LOCPParams(
        Ad=jnp.array(Ad), Bd=jnp.array(Bd), dd=jnp.array(dd),
        x0=jnp.array(x0), xk=jnp.zeros((N + 1, nx)), delta=jnp.array(0.0),
        omega=jnp.array(0.0), z=jnp.array(rng.normal(size=(N + 1, nz))),
        zf=jnp.zeros(nz), u_des=jnp.zeros((N, nu)),
        Hd=jnp.zeros((N + 1, nz, nx)), cd=jnp.zeros((N + 1, nz)))
    P, q, A, l, u, _ = spec.assemble(params)
    rho_vec = np.full(spec.n_con, 0.1)
    rho_vec[spec.r_init:spec.r_init + nx] *= OSQP_RHO_EQ_SCALE
    rho_vec[spec.r_dyn:spec.r_dyn + N * nx] *= OSQP_RHO_EQ_SCALE
    return spec, P, q, A, l, u, jnp.asarray(rho_vec)


@pytest.mark.parametrize("with_dU", [False, True])
def test_btd_solve_matches_dense(with_dU):
    N, nx, nu = 8, 5, 2
    spec, P, q, A, l, u, rho_vec = _locp_qp(N=N, nx=nx, nu=nu,
                                            with_dU=with_dU)
    n = spec.n_var
    K = np.asarray(P) + 1e-6 * np.eye(n) + \
        (np.asarray(A).T * np.asarray(rho_vec)[None, :]) @ np.asarray(A)

    # verify the block-tridiagonal premise: no coupling beyond adjacent stages
    skkt = StructuredKKT(N, nx, nu)
    perm = np.asarray(skkt.perm)
    Kp = K[perm][:, perm]
    nb = nx + nu
    for i in range(N + 1):
        for j in range(N + 1):
            if abs(i - j) > 1:
                blk = Kp[i * nb:min((i + 1) * nb, len(Kp)),
                         j * nb:min((j + 1) * nb, len(Kp))]
                assert np.max(np.abs(blk)) == 0.0, (i, j)

    rng = np.random.default_rng(1)
    rhs = rng.normal(size=n)
    factors = skkt.factor(jnp.asarray(K))
    w = np.asarray(skkt.solve(factors, jnp.asarray(rhs)))
    w_dense = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(w, w_dense, rtol=1e-8, atol=1e-8)


def test_admm_btd_matches_dense_admm():
    N, nx, nu = 10, 4, 2
    spec, P, q, A, l, u, rho_vec = _locp_qp(N=N, nx=nx, nu=nu, seed=3)
    skkt = StructuredKKT(N, nx, nu)
    w0 = jnp.zeros(spec.n_var)
    y0 = jnp.zeros(spec.n_con)
    w1, y1 = admm_fixed(P, q, A, l, u, w0, y0, rho_vec, 150)
    w2, y2 = admm_fixed_btd(P, q, A, l, u, w0, y0, rho_vec, 150, skkt)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w1), atol=1e-8)


@pytest.mark.parametrize("method", ["cr", "scan"])
def test_structured_kkt_methods_agree(method):
    """Cyclic reduction and scan Cholesky solve the same KKT system."""
    N, nx, nu = 13, 6, 3
    rng = np.random.default_rng(5)
    n = (N + 1) * nx + N * nu
    # SPD K with LOCP block-tridiagonal sparsity via a random stage QP
    from tests.test_structured import _make_locp_like  # self-import guard
    K, rhs = _make_locp_like(N, nx, nu, rng)
    skkt = StructuredKKT(N, nx, nu, method=method)
    w = np.asarray(skkt.solve(skkt.factor(jnp.asarray(K)), jnp.asarray(rhs)))
    w_dense = np.linalg.solve(K, rhs)
    np.testing.assert_allclose(w, w_dense, rtol=1e-9, atol=1e-9)


def _make_locp_like(N, nx, nu, rng):
    """An SPD matrix with the LOCP's block-tridiagonal stage structure."""
    n = (N + 1) * nx + N * nu
    off_u = (N + 1) * nx
    K = np.zeros((n, n))
    for k in range(N + 1):
        A = rng.normal(size=(nx, nx))
        K[k * nx:(k + 1) * nx, k * nx:(k + 1) * nx] = A @ A.T + nx * np.eye(nx)
    for k in range(N):
        Au = rng.normal(size=(nu, nu))
        K[off_u + k * nu:off_u + (k + 1) * nu,
          off_u + k * nu:off_u + (k + 1) * nu] = Au @ Au.T + nu * np.eye(nu)
        # dynamics-style couplings x_k -(x_{k+1}, u_k)
        Cxx = 0.2 * rng.normal(size=(nx, nx))
        K[(k + 1) * nx:(k + 2) * nx, k * nx:(k + 1) * nx] += Cxx
        K[k * nx:(k + 1) * nx, (k + 1) * nx:(k + 2) * nx] += Cxx.T
        Cxu = 0.2 * rng.normal(size=(nu, nx))
        K[off_u + k * nu:off_u + (k + 1) * nu, k * nx:(k + 1) * nx] += Cxu
        K[k * nx:(k + 1) * nx, off_u + k * nu:off_u + (k + 1) * nu] += Cxu.T
    rhs = rng.normal(size=n)
    return K, rhs


def test_stage_locp_cr_matches_scan():
    """StageLOCP ADMM with the cyclic-reduction x-step reproduces the scan
    x-step exactly (same fixed iterations)."""
    from soft_robot_control_tpu.scp.locp_stages import StageLOCP
    from soft_robot_control_tpu.core.constraints import HyperRectangle

    N, nx, nu, nz = 9, 6, 3, 2
    rng = np.random.default_rng(7)
    H = rng.normal(size=(nz, nx))
    Qz = np.eye(nz)
    R = 0.1 * np.eye(nu)
    U = HyperRectangle(2.0 * np.ones(nu), -2.0 * np.ones(nu))
    Ad = np.stack([np.eye(nx) + 0.05 * rng.normal(size=(nx, nx))
                   for _ in range(N)])
    Bd = 0.1 * rng.normal(size=(N, nx, nu))
    dd = 0.01 * rng.normal(size=(N, nx))
    x0 = 0.1 * rng.normal(size=nx)
    z = 0.3 * rng.normal(size=(N + 1, nz))
    outs = {}
    for method in ("cr", "scan"):
        st = StageLOCP(N, H, Qz, R, U=U, kkt_solver=method)
        outs[method] = st.solve(Ad, Bd, dd, x0, z, iters=120)
    np.testing.assert_allclose(np.asarray(outs["cr"][0]),
                               np.asarray(outs["scan"][0]),
                               rtol=1e-8, atol=1e-8)
