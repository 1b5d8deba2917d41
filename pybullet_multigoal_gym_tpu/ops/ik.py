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


def _chol_solve(A, b, n):
    """Solve A x = b for a small SPD matrix by unrolled Cholesky.

    `jnp.linalg.solve`/`inv` lower to pivoted LU on TPU which is ~100x slower
    than this for tiny batched systems (the IK inner loop went from 283 ms to
    ~3 ms per 4096-env batch at n=6). Static python loops over n unroll into
    straight-line code XLA fuses completely."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _orientation_error(r_cur, r_target):
    """Rotation vector taking r_cur to r_target (world frame)."""
    dq = quatm.mul(r_target, quatm.conj(r_cur))
    dq = dq * jnp.sign(dq[..., :1])
    angle = 2.0 * jnp.arctan2(jnp.linalg.norm(dq[..., 1:], axis=-1), dq[..., 0])
    axis = dq[..., 1:] / jnp.maximum(jnp.linalg.norm(dq[..., 1:], axis=-1, keepdims=True), 1e-12)
    return axis * angle[..., None]


def solve(target_pos, target_quat=None, rest_pose=None, q_init=None,
          num_iters=KM.IK_MAX_ITERS, position_only=False,
          gripper: str = 'parallel_jaw'):
    """Solve IK for the gripper tip (the loaded gripper's own tip frame).

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
        # one link_frames pass per iteration (tip_pose + tip_jacobian would
        # each run the chain again — 3x the dispatch on the hot path)
        pos, rots = fk.link_frames(q)
        tip = pos[..., 6, :] + quatm.rotate(
            rots[..., 6, :], jnp.asarray(KM.tip_offset_for(gripper), dt))
        rot = rots[..., 6, :]
        z = quatm.rotate(rots, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dt), pos.shape))
        jv = jnp.cross(z, tip[..., None, :] - pos)
        jac = jnp.concatenate([jv, z], axis=-1).swapaxes(-1, -2)
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
        y = _chol_solve(A, err, n)
        dq = jnp.einsum('...ij,...i->...j', J, y)
        # null-space bias toward the rest pose (Bullet's null-space method);
        # phased out over the second half of the iterations so the final
        # iterations are pure DLS polish (sub-mm convergence like Bullet's
        # residualThreshold=1e-5 behaviour). Projector applied matrix-free:
        # (I - J^T A^-1 J) e  via a second Cholesky solve.
        e = rest_pose - q
        Je = jnp.einsum('...ij,...j->...i', J, e)
        u = _chol_solve(A, Je, n)
        ns = e - jnp.einsum('...ij,...i->...j', J, u)
        ns_w = jnp.where(i < num_iters // 2, 0.5, 0.0).astype(dt)
        q = q + dq + ns_w * ns
        q = jnp.clip(q, lower, upper)
        return q

    q = jax.lax.fori_loop(0, num_iters, body, q_init.astype(dt))
    return jnp.clip(q, jlower, jupper)
