"""Geometry numerics tests — the unit-test coverage role of the reference's
dependencies/numerics/{vec3,quat,matrix}_test.py, checked against
scipy.spatial.transform as the oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from soft_robot_control_tpu.utils import geometry as g


def test_vector_ops():
    a = jnp.array([1.0, 2.0, 2.0])
    assert float(g.vnorm(a)) == pytest.approx(3.0)
    n = g.vnormalize(a)
    assert float(g.vnorm(n)) == pytest.approx(1.0)
    b = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(g.vcross(jnp.array([1.0, 0, 0]), b)),
                               [0, 0, 1], atol=1e-12)


def test_rodrigues_rotation_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        axis = rng.normal(size=3)
        angle = rng.uniform(-np.pi, np.pi)
        v = rng.normal(size=3)
        out = np.asarray(g.vrotate_axis_angle(jnp.asarray(v), axis, angle))
        R = Rotation.from_rotvec(angle * axis / np.linalg.norm(axis))
        np.testing.assert_allclose(out, R.apply(v), atol=1e-10)


def test_quaternion_mul_rotate_matches_scipy():
    rng = np.random.default_rng(1)
    for _ in range(5):
        q1 = Rotation.random(random_state=rng).as_quat()  # [x,y,z,w]
        q2 = Rotation.random(random_state=rng).as_quat()
        q12 = np.asarray(g.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        ref = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
        # quaternions are sign-ambiguous
        assert (np.allclose(q12, ref, atol=1e-10)
                or np.allclose(q12, -ref, atol=1e-10))

        v = rng.normal(size=3)
        out = np.asarray(g.quat_rotate(jnp.asarray(q1), jnp.asarray(v)))
        np.testing.assert_allclose(out, Rotation.from_quat(q1).apply(v),
                                    atol=1e-10)


def test_quat_to_matrix_matches_scipy():
    rng = np.random.default_rng(2)
    q = Rotation.random(random_state=rng).as_quat()
    M = np.asarray(g.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(M, Rotation.from_quat(q).as_matrix(), atol=1e-10)


def test_quat_from_euler_matches_scipy():
    angles = [30.0, -45.0, 60.0]
    q = np.asarray(g.quat_from_euler(angles[0], angles[1], angles[2],
                                     degrees=True))
    ref = Rotation.from_euler("XYZ", angles, degrees=True).as_quat()
    assert (np.allclose(q, ref, atol=1e-10) or np.allclose(q, -ref, atol=1e-10))


def test_trs_to_matrix_and_apply():
    M = np.asarray(g.trs_to_matrix([1.0, 2.0, 3.0],
                                   rotation_euler_deg=[0.0, 0.0, 90.0],
                                   scale=[2.0, 2.0, 2.0]))
    pt = g.transform_points(jnp.asarray(M), jnp.array([1.0, 0.0, 0.0]))
    # 90deg about z on scaled x-unit: (0, 2, 0) + t
    np.testing.assert_allclose(np.asarray(pt), [1.0, 4.0, 3.0], atol=1e-9)
    # identity transform
    I = np.asarray(g.trs_to_matrix([0.0, 0.0, 0.0]))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-12)
