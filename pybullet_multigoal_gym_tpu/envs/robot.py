"""Robot state extraction: the TPU analogue of `Kuka.calc_robot_state`
(`/root/reference/pybullet_multigoal_gym/robots/kuka.py:227-256`), computed
from one FK pass + the joint-space Jacobian instead of per-link Bullet
queries."""

import jax.numpy as jnp

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import fk


def robot_state(q, qd, fq, fqd, grasping: bool, ee_contact_force=None,
                gripper: str = 'parallel_jaw'):
    """Returns a dict mirroring calc_robot_state's tuple fields.

    gripper_xyz / rpy: tip pose (rpy in PyBullet euler convention,
    robot_bases.py:117-118); velocities from the analytic Jacobian;
    finger closeness = distance between the two finger-tab links (valid for
    both grippers, kuka.py:234-238);
    gripper_finger_vel = (base_vel - finger_tab_vel)[y] (kuka.py:240-242).
    """
    frames = fk.ee_frames(q, fq, gripper=gripper)
    pos, rot = fk.link_frames(q)
    p7, r7 = pos[..., 6, :], rot[..., 6, :]
    jac = fk.tip_jacobian(q, gripper)              # (...,6,7) at the tip point
    v_tip = jnp.einsum('...ij,...j->...i', jac[..., :3, :], qd)
    omega = jnp.einsum('...ij,...j->...i', jac[..., 3:, :], qd)

    tip = frames['tip']
    gripper_rpy = quatm.quat_to_euler_xyz(r7)

    if grasping:
        tab = frames['finger_tab']                 # (...,2,3)
        closeness = jnp.linalg.norm(tab[..., 0, :] - tab[..., 1, :],
                                    axis=-1, keepdims=True)
        # world velocity of a point rigidly attached at p: v_tip + omega x (p - tip)
        base_v = v_tip + jnp.cross(omega, frames['gripper_base'] - tip)
        axis_w = quatm.rotate(frames['finger_rot'],
                              frames['finger_axis_l7'])
        tab1_v = (v_tip + jnp.cross(omega, tab[..., 0, :] - tip)
                  + axis_w[..., 0, :] * fqd[..., 0:1])
        finger_vel = (base_v - tab1_v)[..., 1:2]
    else:
        closeness = jnp.zeros(q.shape[:-1] + (1,), q.dtype)
        finger_vel = jnp.zeros(q.shape[:-1] + (1,), q.dtype)

    out = {
        'gripper_xyz': tip,
        'gripper_rpy': gripper_rpy,
        'gripper_finger_closeness': closeness,
        'gripper_vel_xyz': v_tip,
        'gripper_vel_rpy': omega,
        'gripper_finger_vel': finger_vel,
        'joint_poses': q,
        'tip_rot': r7,
        'frames': frames,
    }
    if ee_contact_force is not None:
        # EE force sensor (kuka.py:250-254): contact force on the gripper plus
        # the sensed gravity load of the distal subtree (link_7 + gripper base
        # + fingers = KM.EE_SUBTREE_MASS; the reference's commented-out
        # compensation at kuka.py:252 is this mass x g=10). The load is a
        # constant world -z force; rotating it into the link-7 sensor frame
        # makes the reading orientation-dependent exactly as Bullet's
        # joint-frame sensor is, clipped to +-50 N at the consumer.
        subtree = (KM.ROBOTIQ_EE_SUBTREE_MASS if gripper == 'robotiq85'
                   else KM.EE_SUBTREE_MASS)
        g_load = subtree * 9.81
        f_world = ee_contact_force + jnp.asarray([0.0, 0.0, -g_load], q.dtype)
        f_local = quatm.rotate_inv(r7, f_world)
        out['ee_joint_force'] = jnp.clip(f_local, -50.0, 50.0)
    return out
