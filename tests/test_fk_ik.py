"""FK/IK unit tests (SURVEY.md §4: FK vs closed-form poses, IK convergence,
Jacobian correctness)."""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as Q
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import fk, ik


def test_fk_zero_pose_is_straight_up():
    """At q=0 the iiwa14 is fully extended along +z: the tip sits on the base
    axis at the total chain height (sum of joint-origin offsets, all of which
    map onto world z at the zero pose) + the 0.12 tip offset."""
    q = jnp.zeros(7)
    tip, rot = fk.tip_pose(q)
    expected_z = (np.abs(np.asarray(KM.JOINT_ORIGIN_XYZ)).sum()
                  + KM.TIP_OFFSET[2])
    np.testing.assert_allclose(tip[0], 0.0, atol=1e-5)
    np.testing.assert_allclose(tip[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(tip[2], expected_z, atol=1e-4)


def test_fk_joint1_pure_base_rotation():
    """Rotating only joint 1 spins the whole arm about the base z-axis."""
    q0 = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
    tip0, _ = fk.tip_pose(q0)
    ang = 0.8
    q1 = q0.at[0].set(q0[0] + ang)
    tip1, _ = fk.tip_pose(q1)
    r1_expected = Q.rotate(Q.from_axis_angle(jnp.array([0.0, 0, 1.0]),
                                             jnp.array([ang]))[0], tip0)
    np.testing.assert_allclose(tip1, r1_expected, atol=1e-5)


def test_fk_tip_invariant_under_joint7():
    """The tip lies on joint 7's axis: spinning q7 must not move it."""
    q = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
    tip0, _ = fk.tip_pose(q)
    tip1, _ = fk.tip_pose(q.at[6].set(q[6] + 1.3))
    np.testing.assert_allclose(tip0, tip1, atol=1e-6)


def test_jacobian_matches_autodiff():
    q = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
    jac = fk.tip_jacobian(q)
    jac_pos_ad = jax.jacobian(lambda qq: fk.tip_pose(qq)[0])(q)
    np.testing.assert_allclose(jac[:3], jac_pos_ad, atol=1e-4)


def test_jacobian_angular_matches_autodiff():
    q = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)

    def rotvec(qq):
        _, rot = fk.tip_pose(qq)
        return rot

    dq_drot = jax.jacobian(rotvec)(q)          # (4, 7)
    rot = fk.tip_pose(q)[1]
    # omega = 2 * (dq/dt * q^-1)_vec
    omega_cols = []
    for j in range(7):
        dq = dq_drot[:, j]
        wq = Q.mul(dq, Q.conj(rot))
        omega_cols.append(2.0 * wq[1:])
    jac_ang_ad = jnp.stack(omega_cols, axis=-1)
    np.testing.assert_allclose(fk.tip_jacobian(q)[3:], jac_ang_ad, atol=1e-4)


def test_ik_reaches_workspace_targets():
    """DLS IK converges to <1mm for targets in the task workspace
    (kuka.py:40-41 bounds)."""
    key = jax.random.PRNGKey(0)
    targets = jax.random.uniform(
        key, (16, 3), minval=jnp.array([-0.62, -0.15, 0.25]),
        maxval=jnp.array([-0.42, 0.15, 0.5])).astype(jnp.float32)
    q = jax.vmap(lambda t: ik.solve(t))(targets)
    tips, rots = jax.vmap(fk.tip_pose)(q)
    err = jnp.linalg.norm(tips - targets, axis=-1)
    assert float(err.max()) < 1e-3, err
    # orientation: tip points down (fixed EE quat, kuka.py:42)
    down = jax.vmap(lambda r: Q.rotate(r, jnp.array([0.0, 0, 1.0])))(rots)
    np.testing.assert_allclose(down[:, 2], -1.0, atol=1e-2)


def test_ik_respects_joint_limits():
    q = ik.solve(jnp.array([-0.52, 0.0, 0.25], jnp.float32))
    assert jnp.all(q >= jnp.asarray(KM.JOINT_LIMIT_LOWER) - 1e-6)
    assert jnp.all(q <= jnp.asarray(KM.JOINT_LIMIT_UPPER) + 1e-6)


def test_ik_vmap_equals_loop():
    targets = jnp.array([[-0.5, 0.1, 0.3], [-0.6, -0.1, 0.4]], jnp.float32)
    qv = jax.vmap(lambda t: ik.solve(t))(targets)
    q0 = ik.solve(targets[0])
    q1 = ik.solve(targets[1])
    np.testing.assert_allclose(qv, jnp.stack([q0, q1]), atol=1e-6)
