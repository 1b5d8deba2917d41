"""Quaternion and rotation math for the TPU-native multigoal suite.

Conventions
-----------
* Quaternions are stored **wxyz** (scalar first), matching `numpy-quaternion`
  which the reference uses (`/root/reference/pybullet_multigoal_gym/robots/kuka.py:4`).
  PyBullet's xyzw layout appears only at API boundaries; use :func:`wxyz_to_xyzw`
  / :func:`xyzw_to_wxyz` there (the reference shuffles likewise, e.g.
  `kuka_shape_assemble_base_env.py:124`).
* Two Euler conventions coexist in the reference and are both provided here:
  - :func:`euler_zyz_to_quat` / :func:`quat_to_euler_zyz` — the
    `numpy-quaternion` ``from_euler_angles``/``as_euler_angles`` spherical
    (Z-Y-Z) convention, used for EE rotation control and object yaw goals.
  - :func:`euler_xyz_to_quat` / :func:`quat_to_euler_xyz` — PyBullet's
    roll-pitch-yaw extrinsic X-Y-Z convention (``getEulerFromQuaternion``),
    used by `robot_bases.py:117-118` for gripper orientation observations.

All functions are pure, jittable and batch along leading axes.
"""

import jax.numpy as jnp

_EPS = 1e-12


def normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def mul(q1, q2):
    """Hamilton product, wxyz."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q (wxyz)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def rotate_inv(q, v):
    return rotate(conj(q), v)


def from_axis_angle(axis, angle):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS)
    half = angle[..., None] * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def to_matrix(q):
    """3x3 rotation matrix from wxyz quaternion."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
        2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
        2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(r.shape[:-1] + (3, 3))


def from_matrix(m):
    """wxyz quaternion from a 3x3 rotation matrix (Shepperd's method, branchless)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions, pick the numerically best
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    return normalize(q) * jnp.sign(q[..., :1] + _EPS)


def euler_xyz_to_quat(rpy):
    """PyBullet ``getQuaternionFromEuler``: extrinsic X-Y-Z (roll, pitch, yaw)."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)


def quat_to_euler_xyz(q):
    """Inverse of :func:`euler_xyz_to_quat` (PyBullet ``getEulerFromQuaternion``)."""
    w, x, y, z = jnp.moveaxis(normalize(q), -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    sp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_zyz_to_quat(abc):
    """`numpy-quaternion` ``from_euler_angles(alpha, beta, gamma)``:
    q = exp(alpha/2 * z) * exp(beta/2 * y) * exp(gamma/2 * z)."""
    a, b, g = abc[..., 0] * 0.5, abc[..., 1] * 0.5, abc[..., 2] * 0.5
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cg, sg = jnp.cos(g), jnp.sin(g)
    return jnp.stack([
        ca * cb * cg - sa * cb * sg,
        ca * sb * sg - sa * sb * cg,
        ca * sb * cg + sa * sb * sg,
        sa * cb * cg + ca * cb * sg,
    ], axis=-1)


def quat_to_euler_zyz(q):
    """`numpy-quaternion` ``as_euler_angles``: inverse Z-Y-Z decomposition."""
    w, x, y, z = jnp.moveaxis(normalize(q), -1, 0)
    alpha = jnp.arctan2(z, w) + jnp.arctan2(-x, y)
    beta = 2 * jnp.arctan2(jnp.sqrt(x * x + y * y), jnp.sqrt(w * w + z * z))
    gamma = jnp.arctan2(z, w) - jnp.arctan2(-x, y)
    return jnp.stack([alpha, beta, gamma], axis=-1)


def yaw_quat_zyz(yaw):
    """Quaternion for the reference's object-yaw randomisation: take Euler
    angles of identity in ZYZ, set the last angle to ``yaw`` and convert back
    (`kuka_shape_assemble_base_env.py:121-124`). Equivalent to a pure z-rotation."""
    zeros = jnp.zeros_like(yaw)
    return euler_zyz_to_quat(jnp.stack([zeros, zeros, yaw], axis=-1))


def wxyz_to_xyzw(q):
    return jnp.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def xyzw_to_wxyz(q):
    return jnp.concatenate([q[..., 3:], q[..., :3]], axis=-1)


def integrate_angvel(q, omega, dt):
    """Integrate a world-frame angular velocity over dt (first order exp map)."""
    angle = jnp.linalg.norm(omega, axis=-1)
    axis = omega / jnp.maximum(angle[..., None], _EPS)
    dq = from_axis_angle(axis, angle * dt)
    return normalize(mul(dq, q))
