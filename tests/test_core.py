"""Parity tests for core numerics: packing, discretization, constraints, POD.

Oracles are independent numpy/scipy implementations mirroring the reference
semantics (sofacontrol/utils.py, sofacontrol/mor/pod.py).
"""

import numpy as np
import jax.numpy as jnp
import scipy.linalg

from soft_robot_control_tpu.core import packing, discretize
from soft_robot_control_tpu.core.constraints import Polyhedron, HyperRectangle
from soft_robot_control_tpu.rom import pod


def test_packing_roundtrip():
    rng = np.random.default_rng(0)
    q, v = rng.normal(size=7), rng.normal(size=7)
    x = packing.qv2x(q, v)
    np.testing.assert_allclose(x, np.concatenate((v, q)))
    q2, v2 = packing.x2qv(x)
    np.testing.assert_allclose(q2, q)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_allclose(packing.vq2qv(x), np.concatenate((q, v)))
    # batched
    X = rng.normal(size=(5, 14))
    Q, V = packing.x2qv(X)
    np.testing.assert_allclose(np.asarray(packing.qv2x(Q, V)), X)


def _scipy_zoh_affine(A, B, d, dt):
    """Oracle: exact ZOH via scipy expm of the stacked block
    (reference semantics, utils.py:302-335)."""
    B_ext = np.hstack((B, d[:, None]))
    n, m = A.shape[0], B_ext.shape[1]
    em = np.zeros((n + m, n + m))
    em[:n, :n] = A
    em[:n, n:] = B_ext
    Phi = scipy.linalg.expm(em * dt)
    Ad = Phi[:n, :n]
    Bd_ext = Phi[:n, n:]
    return Ad, Bd_ext[:, :-1], Bd_ext[:, -1]


def test_zoh_matches_scipy_expm():
    rng = np.random.default_rng(1)
    n, m = 8, 3
    A = rng.normal(size=(n, n)) - 2 * np.eye(n)
    B = rng.normal(size=(n, m))
    d = rng.normal(size=n)
    dt = 0.05
    Ad, Bd, dd = discretize.zoh_affine(jnp.array(A), jnp.array(B), jnp.array(d), dt)
    Ad_o, Bd_o, dd_o = _scipy_zoh_affine(A, B, d, dt)
    np.testing.assert_allclose(np.asarray(Ad), Ad_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(Bd), Bd_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(dd), dd_o, atol=1e-9)


def test_discretization_methods_against_numpy():
    rng = np.random.default_rng(2)
    n, m = 6, 2
    A = rng.normal(size=(n, n)) - 2 * np.eye(n)
    B = rng.normal(size=(n, m))
    d = rng.normal(size=n)
    dt = 0.02
    I = np.eye(n)

    Ad, Bd, dd = discretize.fe(jnp.array(A), jnp.array(B), jnp.array(d), dt)
    np.testing.assert_allclose(Ad, I + dt * A, atol=1e-12)
    np.testing.assert_allclose(Bd, dt * B, atol=1e-12)
    np.testing.assert_allclose(dd, dt * d, atol=1e-12)

    Ad, Bd, dd = discretize.be(jnp.array(A), jnp.array(B), jnp.array(d), dt)
    Ad_o = np.linalg.inv(I - dt * A)
    sep = np.linalg.inv(A) @ (Ad_o - I)
    np.testing.assert_allclose(Ad, Ad_o, atol=1e-10)
    np.testing.assert_allclose(Bd, sep @ B, atol=1e-10)
    np.testing.assert_allclose(dd, sep @ d, atol=1e-10)

    Ad, Bd, dd = discretize.bil(jnp.array(A), jnp.array(B), jnp.array(d), dt)
    Ad_o = (I + 0.5 * dt * A) @ np.linalg.inv(I - 0.5 * dt * A)
    sep = np.linalg.inv(A) @ (Ad_o - I)
    np.testing.assert_allclose(Ad, Ad_o, atol=1e-10)
    np.testing.assert_allclose(Bd, sep @ B, atol=1e-10)
    np.testing.assert_allclose(dd, sep @ d, atol=1e-10)


def test_discretize_batch_matches_single():
    rng = np.random.default_rng(3)
    P, n, m = 5, 4, 2
    A = rng.normal(size=(P, n, n)) - 2 * np.eye(n)
    B = rng.normal(size=(P, n, m))
    d = rng.normal(size=(P, n))
    Ad, Bd, dd = discretize.discretize_affine_batch(
        jnp.array(A), jnp.array(B), jnp.array(d), 0.03, method="zoh")
    for i in range(P):
        a, b, c = _scipy_zoh_affine(A[i], B[i], d[i], 0.03)
        np.testing.assert_allclose(np.asarray(Ad[i]), a, atol=1e-9)
        np.testing.assert_allclose(np.asarray(Bd[i]), b, atol=1e-9)
        np.testing.assert_allclose(np.asarray(dd[i]), c, atol=1e-9)


def test_hyperrectangle_layout_and_membership():
    ub, lb = np.array([2.0, 3.0]), np.array([-1.0, 0.0])
    box = HyperRectangle(ub, lb)
    # row layout matches reference kron(I, [[1],[-1]]) (utils.py:409-414)
    A_exp = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], dtype=float)
    b_exp = np.array([2.0, 1.0, 3.0, -0.0])
    np.testing.assert_allclose(np.asarray(box.A), A_exp)
    np.testing.assert_allclose(np.asarray(box.b), b_exp)
    assert bool(box.contains(jnp.array([0.0, 1.0])))
    assert not bool(box.contains(jnp.array([3.0, 1.0])))
    v = float(box.violation(jnp.array([3.0, 4.0])))
    np.testing.assert_allclose(v, np.sqrt(1.0 + 1.0), atol=1e-12)


def test_pod_energy_truncation_matches_reference_loop():
    rng = np.random.default_rng(4)
    snaps = rng.normal(size=(30, 200)) * (10.0 ** -np.arange(30))[:, None]
    snaps = snaps.T @ rng.normal(size=(30, 30))  # (200, 30)? build (nf, nsnap)
    snaps = rng.normal(size=(50, 40)) @ np.diag(10.0 ** -np.linspace(0, 6, 40)) @ rng.normal(size=(40, 40))
    tol = 1e-4

    _, U, r, S = pod.compute_POD(snaps, tol)

    # reference truncation loop (mor/pod.py:190-200)
    s2 = S**2
    i = 0
    while (np.sum(s2[i:]) / np.sum(s2)) > tol or i == 0:
        i += 1
    assert r == i
    assert U.shape == (snaps.shape[0], r)


def test_pod_project_lift_roundtrip():
    rng = np.random.default_rng(5)
    nf, r = 40, 6
    U, _ = np.linalg.qr(rng.normal(size=(nf, r)))
    q_ref = rng.normal(size=nf)
    rom = pod.POD({"U": U, "q_ref": q_ref, "v_ref": np.zeros(nf)})

    # a full state exactly on the affine subspace reconstructs exactly
    qr_ = rng.normal(size=r)
    vr_ = rng.normal(size=r)
    xf = packing.qv2x(U @ qr_ + q_ref, U @ vr_)
    xr = rom.project_x(jnp.asarray(xf))
    np.testing.assert_allclose(np.asarray(xr), np.concatenate((vr_, qr_)), atol=1e-10)
    np.testing.assert_allclose(np.asarray(rom.lift_x(xr)), xf, atol=1e-10)

    # matrix projection matches U^T M U
    M = rng.normal(size=(nf, nf))
    np.testing.assert_allclose(np.asarray(rom.project_matrix(M)), U.T @ M @ U, atol=1e-10)

    # block projection matches kron(I2,U)^T Mf kron(I2,U)
    Mf = rng.normal(size=(2 * nf, 2 * nf))
    V = np.kron(np.eye(2), U)
    np.testing.assert_allclose(np.asarray(rom.project_block_matrix(Mf)),
                               V.T @ Mf @ V, atol=1e-9)

    # output projection matches Hf V
    Hf = rng.normal(size=(3, 2 * nf))
    np.testing.assert_allclose(np.asarray(rom.project_output_matrix(Hf)),
                               Hf @ V, atol=1e-10)
