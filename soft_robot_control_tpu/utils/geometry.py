"""3D geometry numerics: vectors, quaternions, rigid transforms.

Capability parity with the reference's vendored STLIB numerics
(dependencies/numerics/{vec3,quat,matrix,__init__}.py: Vec3/Quat/Matrix and
TRS_to_matrix) — the only formally unit-tested code in the reference
(SURVEY.md §2.4). Re-designed as stateless jnp functions (vmappable, usable
on device for mesh/robot geometry) instead of mutable container classes.

Quaternion convention: [x, y, z, w] (scalar last), matching SOFA/splib.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------- vectors


def vnorm(v):
    return jnp.linalg.norm(v, axis=-1)


def vnormalize(v, eps=1e-12):
    return v / (vnorm(v)[..., None] + eps)


def vdot(a, b):
    return jnp.sum(a * b, axis=-1)


def vcross(a, b):
    return jnp.cross(a, b)


def vrotate_axis_angle(v, axis, angle):
    """Rodrigues rotation of v about `axis` by `angle` (radians)."""
    k = vnormalize(jnp.asarray(axis, jnp.result_type(float)))
    c, s = jnp.cos(angle), jnp.sin(angle)
    return v * c + vcross(k, v) * s + k * vdot(k, v)[..., None] * (1 - c)


# -------------------------------------------------------------- quaternions


def quat_identity(dtype=float):
    return jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=jnp.result_type(dtype))


def quat_from_axis_angle(axis, angle):
    k = vnormalize(jnp.asarray(axis, jnp.result_type(float)))
    half = jnp.asarray(angle) / 2.0
    return jnp.concatenate([k * jnp.sin(half)[..., None],
                            jnp.cos(half)[..., None]], axis=-1)


def quat_mul(q1, q2):
    """Hamilton product, [x,y,z,w] convention."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quat_conjugate(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q, eps=1e-12):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion q."""
    qv = jnp.concatenate([v, jnp.zeros(v.shape[:-1] + (1,), v.dtype)], axis=-1)
    return quat_mul(quat_mul(q, qv), quat_conjugate(q))[..., :3]


def quat_to_matrix(q):
    """3x3 rotation matrix from a unit quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], axis=-1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], axis=-1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def quat_from_euler(rx, ry, rz, degrees=False):
    """Intrinsic XYZ Euler angles to quaternion."""
    if degrees:
        rx, ry, rz = (jnp.deg2rad(a) for a in (rx, ry, rz))
    qx = quat_from_axis_angle(jnp.asarray([1.0, 0, 0]), rx)
    qy = quat_from_axis_angle(jnp.asarray([0, 1.0, 0]), ry)
    qz = quat_from_axis_angle(jnp.asarray([0, 0, 1.0]), rz)
    return quat_mul(qx, quat_mul(qy, qz))


# ------------------------------------------------------------- transforms


def trs_to_matrix(translation, rotation_euler_deg=None, scale=None,
                  quaternion=None):
    """4x4 homogeneous transform from Translation/Rotation/Scale — the
    TRS_to_matrix capability (dependencies/numerics/__init__.py:36-80)."""
    t = jnp.asarray(translation, jnp.result_type(float))
    if quaternion is not None:
        R = quat_to_matrix(quat_normalize(jnp.asarray(quaternion, t.dtype)))
    elif rotation_euler_deg is not None:
        r = jnp.asarray(rotation_euler_deg, t.dtype)
        R = quat_to_matrix(quat_from_euler(r[0], r[1], r[2], degrees=True))
    else:
        R = jnp.eye(3, dtype=t.dtype)
    s = jnp.ones(3, t.dtype) if scale is None else jnp.asarray(scale, t.dtype)
    M = jnp.zeros((4, 4), t.dtype)
    M = M.at[:3, :3].set(R * s[None, :])
    M = M.at[:3, 3].set(t)
    M = M.at[3, 3].set(1.0)
    return M


def transform_points(M, pts):
    """Apply a 4x4 transform to (..., 3) points."""
    pts = jnp.asarray(pts)
    return pts @ M[:3, :3].T + M[:3, 3]
