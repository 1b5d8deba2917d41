"""Damped-least-squares inverse kinematics with null-space rest-pose bias.

TPU-native replacement for Bullet's ``calculateInverseKinematics`` as invoked
by the reference (`/root/reference/pybullet_multigoal_gym/robots/kuka.py:258-280`):
null-space limits/ranges/rest pose, maxNumIterations=40, residual 1e-5. Here
the iteration count is a fixed `lax.fori_loop` trip count (converged updates
become no-ops), so the op is jit/vmap-friendly with static shapes.
"""

import jax
import jax.numpy as jnp

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import fk

_DAMPING = 1e-3


def _orientation_error(r_cur, r_target):
    """Rotation vector taking r_cur to r_target (world frame)."""
    dq = quatm.mul(r_target, quatm.conj(r_cur))
    dq = dq * jnp.sign(dq[..., :1])
    angle = 2.0 * jnp.arctan2(jnp.linalg.norm(dq[..., 1:], axis=-1), dq[..., 0])
    axis = dq[..., 1:] / jnp.maximum(jnp.linalg.norm(dq[..., 1:], axis=-1, keepdims=True), 1e-12)
    return axis * angle[..., None]


def solve(target_pos, target_quat=None, rest_pose=None, q_init=None,
          num_iters=KM.IK_MAX_ITERS, position_only=False):
    """Solve IK for the gripper tip.

    Args:
      target_pos: (..., 3) desired tip position.
      target_quat: (..., 4) desired tip orientation wxyz; defaults to the fixed
        downward orientation (kuka.py:42, 261).
      rest_pose: (..., 7) null-space rest pose; defaults to KUKA_REST_POSE.
      q_init: (..., 7) starting configuration; defaults to rest_pose.
      position_only: solve 3-DoF position IK (orientation rows dropped).
    Returns:
      (..., 7) joint angles, limits-clamped.
    """
    dt = target_pos.dtype
    if target_quat is None:
        target_quat = jnp.broadcast_to(
            jnp.asarray(KM.EE_FIXED_QUAT_WXYZ, dt), target_pos.shape[:-1] + (4,))
    if rest_pose is None:
        rest_pose = jnp.broadcast_to(
            jnp.asarray(KM.KUKA_REST_POSE, dt), target_pos.shape[:-1] + (7,))
    if q_init is None:
        q_init = rest_pose
    lower = jnp.asarray(KM.IK_LOWER, dt)
    upper = jnp.asarray(KM.IK_UPPER, dt)
    jlower = jnp.asarray(KM.JOINT_LIMIT_LOWER, dt)
    jupper = jnp.asarray(KM.JOINT_LIMIT_UPPER, dt)

    def body(i, q):
        tip, rot = fk.tip_pose(q)
        jac = fk.tip_jacobian(q)                 # (..., 6, 7)
        perr = target_pos - tip
        if position_only:
            err = perr
            J = jac[..., :3, :]
        else:
            oerr = _orientation_error(rot, target_quat)
            err = jnp.concatenate([perr, oerr], axis=-1)
            J = jac
        # damped least squares: dq = J^T (J J^T + lambda I)^-1 err
        JJt = jnp.einsum('...ij,...kj->...ik', J, J)
        n = JJt.shape[-1]
        A = JJt + _DAMPING * jnp.eye(n, dtype=dt)
        y = jnp.linalg.solve(A, err[..., None])[..., 0]
        dq = jnp.einsum('...ij,...i->...j', J, y)
        # null-space bias toward the rest pose (Bullet's null-space method);
        # phased out over the second half of the iterations so the final
        # iterations are pure DLS polish (sub-mm convergence like Bullet's
        # residualThreshold=1e-5 behaviour)
        JtAinvJ = jnp.einsum('...ji,...jk,...kl->...il', J,
                             jnp.linalg.inv(A), J)
        ns = (rest_pose - q) - jnp.einsum('...ij,...j->...i', JtAinvJ, rest_pose - q)
        ns_w = jnp.where(i < num_iters // 2, 0.5, 0.0).astype(dt)
        q = q + dq + ns_w * ns
        q = jnp.clip(q, lower, upper)
        return q

    q = jax.lax.fori_loop(0, num_iters, body, q_init.astype(dt))
    return jnp.clip(q, jlower, jupper)
