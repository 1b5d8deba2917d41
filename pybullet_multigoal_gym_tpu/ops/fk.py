"""Batched forward kinematics for the Kuka iiwa14 chain.

TPU-native replacement for PyBullet's ``getLinkState`` calls
(`/root/reference/pybullet_multigoal_gym/robots/robot_bases.py:110`,
`kuka.py:227-256`). Pure function of the joint vector; unrolled over the 7
joints (static chain) so XLA fuses the whole chain into one kernel; vmap
over the env axis batches it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM


def _np_euler_xyz_to_quat(rpy):
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr, cp, sp, cy, sy = np.cos(r), np.sin(r), np.cos(p), np.sin(p), np.cos(y), np.sin(y)
    return np.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)


# Static per-joint origin rotations (wxyz), computed host-side.
_ORIGIN_QUAT_NP = _np_euler_xyz_to_quat(KM.JOINT_ORIGIN_RPY)


def _origin_quats():
    return _ORIGIN_QUAT_NP


def link_frames(q):
    """World pose of the 7 joint frames.

    Args:
      q: (..., 7) arm joint angles.
    Returns:
      pos: (..., 7, 3) joint-frame origins, rot: (..., 7, 4) wxyz quaternions.
    """
    oq = _origin_quats()
    oxyz = np.asarray(KM.JOINT_ORIGIN_XYZ)
    batch = q.shape[:-1]
    p = jnp.zeros(batch + (3,), q.dtype)
    r = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0], q.dtype), batch + (4,))
    ps, rs = [], []
    for j in range(7):
        p = p + quatm.rotate(r, jnp.broadcast_to(jnp.asarray(oxyz[j], q.dtype), batch + (3,)))
        r = quatm.mul(r, jnp.broadcast_to(jnp.asarray(oq[j], q.dtype), batch + (4,)))
        # revolute joint about local z
        zero = jnp.zeros_like(q[..., j])
        jq = jnp.stack([jnp.cos(q[..., j] * 0.5), zero, zero,
                        jnp.sin(q[..., j] * 0.5)], axis=-1)
        r = quatm.mul(r, jq)
        ps.append(p)
        rs.append(r)
    return jnp.stack(ps, axis=-2), jnp.stack(rs, axis=-2)


def tip_pose(q, gripper: str = 'parallel_jaw'):
    """Gripper-tip world position and orientation (wxyz).

    Matches `parts['iiwa_gripper_tip']` poses (tip = link7 frame + 0.12 z for
    the parallel jaw, +0.18 z for the Robotiq-85; URDF:311-315 of each)."""
    pos, rot = link_frames(q)
    p7, r7 = pos[..., 6, :], rot[..., 6, :]
    tip = p7 + quatm.rotate(r7, jnp.asarray(KM.tip_offset_for(gripper),
                                            q.dtype))
    return tip, r7


def ee_frames(q, finger_q, gripper: str = 'parallel_jaw'):
    """All end-effector frames needed by the env layer in one FK pass.

    Args:
      q: (..., 7) arm joints.  finger_q: (..., 2) finger joint positions
        (prismatic metres for the parallel jaw; Robotiq closure radians).
      gripper: 'parallel_jaw' | 'robotiq85'.
    Returns dict with world positions (and tip rotation):
      tip, tip_rot, hand_cam, gripper_base, finger_pos (..2,3) [pad box
      centres], finger_rot, finger_tab (..2,3), finger_axis_l7 (..2,3)
      [link-7-frame pad velocity per unit finger_qd].
    """
    pos, rot = link_frames(q)
    p7, r7 = pos[..., 6, :], rot[..., 6, :]
    dt = q.dtype
    tip = p7 + quatm.rotate(r7, jnp.asarray(KM.tip_offset_for(gripper), dt))
    hand_cam = p7 + quatm.rotate(
        r7, jnp.asarray(KM.hand_cam_offset_for(gripper), dt))
    gbase = p7 + quatm.rotate(r7, jnp.asarray(KM.GRIPPER_BASE_OFFSET, dt))
    if gripper == 'robotiq85':
        # mimic-linkage pads (KM.robotiq_pad_kinematics, link-7 frame)
        k = KM.robotiq_pad_kinematics(finger_q, xp=jnp)
        fpos = p7[..., None, :] + quatm.rotate(r7[..., None, :], k['center'])
        ftab_pos = p7[..., None, :] + quatm.rotate(r7[..., None, :], k['tab'])
        faxis_l7 = k['vel']
    else:
        forigin = jnp.asarray(KM.FINGER_ORIGIN, dt)
        faxis = jnp.asarray(KM.FINGER_AXIS, dt)
        ftab = jnp.asarray(KM.FINGER_TAB_OFFSET, dt)
        # finger local offset = origin + axis * joint position
        floc = forigin + faxis * finger_q[..., :, None]
        fpos = gbase[..., None, :] + quatm.rotate(r7[..., None, :], floc)
        ftab_pos = fpos + quatm.rotate(r7[..., None, :], ftab)
        faxis_l7 = jnp.broadcast_to(faxis, fpos.shape)
    return {
        'tip': tip,
        'tip_rot': r7,
        'hand_cam': hand_cam,
        'gripper_base': gbase,
        'finger_pos': fpos,
        'finger_rot': jnp.broadcast_to(r7[..., None, :], fpos.shape[:-1] + (4,)),
        'finger_tab': ftab_pos,
        'finger_axis_l7': faxis_l7,
    }


def tip_jacobian(q, gripper: str = 'parallel_jaw'):
    """Analytic geometric Jacobian of the gripper tip: (..., 6, 7).

    Rows 0-2 linear, rows 3-5 angular. For a revolute joint about local z:
    Jv_i = z_i x (p_tip - p_i), Jw_i = z_i.
    """
    pos, rot = link_frames(q)
    tip = pos[..., 6, :] + quatm.rotate(
        rot[..., 6, :], jnp.asarray(KM.tip_offset_for(gripper), q.dtype))
    z = quatm.rotate(rot, jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], q.dtype), pos.shape))
    jv = jnp.cross(z, tip[..., None, :] - pos)          # (..., 7, 3)
    jw = z
    return jnp.concatenate([jv, jw], axis=-1).swapaxes(-1, -2)  # (..., 6, 7)
