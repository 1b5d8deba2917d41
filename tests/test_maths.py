"""Unit tests for quaternion/rotation math (SURVEY.md §4: quaternion/spatial
algebra under fixed keys)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pybullet_multigoal_gym_tpu.maths import quat as Q


def rand_quats(key, n=32):
    q = jax.random.normal(key, (n, 4))
    return Q.normalize(q)


def test_mul_identity():
    q = rand_quats(jax.random.PRNGKey(0))
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (q.shape[0], 1))
    np.testing.assert_allclose(Q.mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(Q.mul(ident, q), q, atol=1e-6)


def test_conj_inverse():
    q = rand_quats(jax.random.PRNGKey(1))
    qq = Q.mul(q, Q.conj(q))
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (q.shape[0], 1))
    np.testing.assert_allclose(qq, ident, atol=1e-5)


def test_rotate_matches_matrix():
    q = rand_quats(jax.random.PRNGKey(2))
    v = jax.random.normal(jax.random.PRNGKey(3), (q.shape[0], 3))
    r1 = Q.rotate(q, v)
    r2 = jnp.einsum('nij,nj->ni', Q.to_matrix(q), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_rotate_preserves_norm():
    q = rand_quats(jax.random.PRNGKey(4))
    v = jax.random.normal(jax.random.PRNGKey(5), (q.shape[0], 3))
    np.testing.assert_allclose(jnp.linalg.norm(Q.rotate(q, v), axis=-1),
                               jnp.linalg.norm(v, axis=-1), rtol=1e-5)


def test_from_matrix_roundtrip():
    q = rand_quats(jax.random.PRNGKey(6))
    q = q * jnp.sign(q[:, :1])          # canonical hemisphere
    q2 = Q.from_matrix(Q.to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_euler_xyz_roundtrip():
    rpy = jax.random.uniform(jax.random.PRNGKey(7), (64, 3), minval=-1.2,
                             maxval=1.2)
    np.testing.assert_allclose(Q.quat_to_euler_xyz(Q.euler_xyz_to_quat(rpy)),
                               rpy, atol=1e-5)


def test_euler_xyz_matches_pybullet_convention():
    # pybullet.getQuaternionFromEuler([0.3, -0.2, 0.5]) reference values
    # (xyzw): computed with the extrinsic XYZ convention
    rpy = jnp.array([0.3, -0.2, 0.5])
    q = Q.euler_xyz_to_quat(rpy)
    # independent construction: Rz(y) @ Ry(p) @ Rx(r)
    qx = Q.from_axis_angle(jnp.array([1.0, 0, 0]), rpy[0:1] * 1.0)
    qy = Q.from_axis_angle(jnp.array([0.0, 1, 0]), rpy[1:2] * 1.0)
    qz = Q.from_axis_angle(jnp.array([0.0, 0, 1]), rpy[2:3] * 1.0)
    q_ref = Q.mul(qz.reshape(4)[None], Q.mul(qy.reshape(4)[None],
                                             qx.reshape(4)[None]))[0]
    np.testing.assert_allclose(q, q_ref, atol=1e-6)


def test_euler_zyz_roundtrip():
    abc = jax.random.uniform(jax.random.PRNGKey(8), (64, 3),
                             minval=jnp.array([-2.0, 0.1, -2.0]),
                             maxval=jnp.array([2.0, 3.0, 2.0]))
    q = Q.euler_zyz_to_quat(abc)
    abc2 = Q.quat_to_euler_zyz(q)
    np.testing.assert_allclose(Q.euler_zyz_to_quat(abc2), q * jnp.sign(q[:, :1])
                               * jnp.sign(Q.euler_zyz_to_quat(abc2)[:, :1]),
                               atol=1e-5)


def test_yaw_quat_is_z_rotation():
    yaw = jnp.array([0.7])
    q = Q.yaw_quat_zyz(yaw)[0]
    v = jnp.array([1.0, 0.0, 0.0])
    out = Q.rotate(q, v)
    np.testing.assert_allclose(out, jnp.array([jnp.cos(0.7), jnp.sin(0.7), 0.0]),
                               atol=1e-6)


def test_integrate_angvel_unit_norm():
    q = rand_quats(jax.random.PRNGKey(9))
    w = jax.random.normal(jax.random.PRNGKey(10), (q.shape[0], 3)) * 10.0
    q2 = Q.integrate_angvel(q, w, 0.002)
    np.testing.assert_allclose(jnp.linalg.norm(q2, axis=-1), 1.0, atol=1e-6)


def test_integrate_angvel_small_angle():
    q = jnp.array([1.0, 0, 0, 0])
    w = jnp.array([0.0, 0.0, 1.0])
    q2 = q
    for _ in range(100):
        q2 = Q.integrate_angvel(q2, w, 0.01)
    # 1 rad rotation about z
    v = Q.rotate(q2, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, jnp.array([jnp.cos(1.0), jnp.sin(1.0), 0.0]),
                               atol=1e-3)


def test_wxyz_xyzw_roundtrip():
    q = rand_quats(jax.random.PRNGKey(11))
    np.testing.assert_allclose(Q.xyzw_to_wxyz(Q.wxyz_to_xyzw(q)), q)
