"""Pallas TPU kernel for batched damped-least-squares IK.

Same math as ops/ik.py:solve (40 DLS iterations, null-space rest-pose bias
phased out over the back half, joint-limit clamp) but fully fused: the
40-iteration loop, the FK chain, the 6x7 Jacobian, the 6x6 Cholesky solves
and the null-space projection all run inside one kernel over (8,128) env
tiles. The XLA version is dispatch-bound (~50 ms per 4096-env batch on v5e);
this kernel runs the same batch in well under a millisecond.

Parity with ops/ik.py is asserted in tests/test_pallas_engine.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops.pallas_engine import (
    F32, LANE, SUB, TILE, _OQ, _OXYZ, _c, _cq, _cv, qmul, qrotate, vcross,
    vdot)

_DAMPING = 1e-3


def _atan_pos(x):
    """arctan for x >= 0 via a degree-9 odd minimax polynomial (~1e-5 rad).

    Mosaic has no atan/atan2 lowering; this is accurate far beyond what the
    damped IK iteration needs."""
    inv = x > 1.0
    t = jnp.where(inv, 1.0 / jnp.maximum(x, 1e-12), x)
    t2 = t * t
    p = t * (0.99986600
             + t2 * (-0.33029950
                     + t2 * (0.18014100
                             + t2 * (-0.08513300
                                     + t2 * 0.02083510))))
    return jnp.where(inv, (np.pi / 2) - p, p)


def _chol_solve_tiles(A, b, n):
    """Unrolled Cholesky on an n x n system of (8,128) tiles.

    A: python 2D list (n x n), b: python list (n). Returns list (n)."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _link_frames_tiles(q_rows):
    """FK chain on tiles: returns (positions list of 7 (3,8,128),
    rotations list of 7 (4,8,128))."""
    p = _cv([0.0, 0.0, 0.0])
    r = _cq([1.0, 0.0, 0.0, 0.0])
    ps, rs = [], []
    for j in range(7):
        p = p + qrotate(r, _cv(_OXYZ[j]))
        r = qmul(r, _cq(_OQ[j]))
        half = q_rows[j] * 0.5
        jq = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                        jnp.zeros_like(half), jnp.sin(half)])
        r = qmul(r, jq)
        ps.append(p)
        rs.append(r)
    return ps, rs


def _build_ik_kernel(num_iters: int, gripper: str = 'parallel_jaw'):
    jl_lo = np.asarray(KM.JOINT_LIMIT_LOWER, np.float32)
    jl_hi = np.asarray(KM.JOINT_LIMIT_UPPER, np.float32)
    ik_lo = np.asarray(KM.IK_LOWER, np.float32)
    ik_hi = np.asarray(KM.IK_UPPER, np.float32)
    tip_off = np.asarray(KM.tip_offset_for(gripper), np.float32)

    def kernel(tgt_ref, tq_ref, rest_ref, q0_ref, out_ref):
        tgt = tgt_ref[:]          # (3,8,128)
        tq = tq_ref[:]            # (4,8,128)
        rest = rest_ref[:]        # (7,8,128)
        q = q0_ref[:]             # (7,8,128)

        def body(i, q):
            ps, rs = _link_frames_tiles(q)
            r7 = rs[6]
            tip = ps[6] + qrotate(r7, _cv(tip_off))
            perr = tgt - tip
            # orientation error: rotation vector of tq * conj(r7)
            r7c = jnp.concatenate([r7[0:1], -r7[1:4]])
            dq_ = qmul(tq, r7c)
            sign = jnp.where(dq_[0] >= 0, 1.0, -1.0)
            dq_ = dq_ * sign[None]
            vnorm = jnp.sqrt(jnp.maximum(
                dq_[1] ** 2 + dq_[2] ** 2 + dq_[3] ** 2, 1e-18))
            # w >= 0 after the sign flip, so atan2(v, w) = atan(v/w) in
            # [0, pi/2] (the v/w > 1 branch handles w -> 0)
            ang = 2.0 * _atan_pos(vnorm / jnp.maximum(dq_[0], 1e-12))
            oerr = dq_[1:4] * (ang / vnorm)[None]
            err = [perr[0], perr[1], perr[2], oerr[0], oerr[1], oerr[2]]

            # jacobian columns: z_j = rotate(r_j, ez); Jv = z x (tip - p_j)
            Jcols = []
            for j in range(7):
                z = qrotate(rs[j], _cv([0.0, 0.0, 1.0]))
                jv = vcross(z, tip - ps[j])
                Jcols.append([jv[0], jv[1], jv[2], z[0], z[1], z[2]])
            # A = J J^T + damping I (6x6 of tiles)
            A = [[sum(Jcols[k][i] * Jcols[k][j] for k in range(7))
                  + (_DAMPING if i == j else 0.0)
                  for j in range(6)] for i in range(6)]
            y = _chol_solve_tiles(A, err, 6)
            dq = [sum(Jcols[j][i] * y[i] for i in range(6)) for j in range(7)]
            # null-space bias, phased out over the back half
            e = [rest[j] - q[j] for j in range(7)]
            Je = [sum(Jcols[j][i] * e[j] for j in range(7)) for i in range(6)]
            u = _chol_solve_tiles(A, Je, 6)
            JTu = [sum(Jcols[j][i] * u[i] for i in range(6)) for j in range(7)]
            ns_w = jnp.where(i < num_iters // 2, 0.5, 0.0).astype(F32)
            newq = [jnp.clip(q[j] + dq[j] + ns_w * (e[j] - JTu[j]),
                             ik_lo[j], ik_hi[j]) for j in range(7)]
            return jnp.stack(newq)

        q = jax.lax.fori_loop(0, num_iters, body, q)
        out_ref[:] = jnp.stack([jnp.clip(q[j], jl_lo[j], jl_hi[j])
                                for j in range(7)])

    return kernel


class PallasIK:
    """Batched IK front-end. Inputs have a leading env axis (N % 1024 == 0)."""

    def __init__(self, num_iters: int = KM.IK_MAX_ITERS, interpret=None,
                 gripper: str = 'parallel_jaw'):
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        self.interpret = interpret
        self.num_iters = num_iters
        self._kernel = _build_ik_kernel(num_iters, gripper)

    def solve(self, target_pos, target_quat=None, rest_pose=None, q_init=None):
        N = target_pos.shape[0]
        assert N % TILE == 0, 'pallas IK needs num_envs %% 1024 == 0'
        G = N // TILE
        if target_quat is None:
            target_quat = jnp.broadcast_to(
                jnp.asarray(KM.EE_FIXED_QUAT_WXYZ, F32), (N, 4))
        if rest_pose is None:
            rest_pose = jnp.broadcast_to(
                jnp.asarray(KM.KUKA_REST_POSE, F32), (N, 7))
        if q_init is None:
            q_init = rest_pose

        def pack(x):
            k = x.shape[-1]
            return x.reshape(G, SUB, LANE, k).transpose(3, 0, 1, 2) \
                    .reshape(k, G * SUB, LANE)

        args = [pack(jnp.asarray(a, F32)) for a in
                (target_pos, target_quat, rest_pose, q_init)]
        out = pl.pallas_call(
            self._kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((k, SUB, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
                      for k in (3, 4, 7, 7)],
            out_specs=pl.BlockSpec((7, SUB, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((7, G * SUB, LANE), F32),
            interpret=self.interpret,
        )(*args)
        return out.reshape(7, G, SUB, LANE).transpose(1, 2, 3, 0).reshape(N, 7)
