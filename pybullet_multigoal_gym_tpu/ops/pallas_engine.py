"""Pallas TPU kernel: the full 100-substep control step fused into ONE kernel.

The XLA `Engine` (ops/dynamics.py) is dispatch-bound: each 2 ms substep
lowers to hundreds of tiny kernels over (N, ...) arrays and a control step
runs 100 of them (~150 ms at N=4096 on v5e). This module rebuilds the same
physics as a single `pallas_call`, with the env batch laid out as (8, 128)
VPU tiles: every per-env scalar is one tile, vectors are (3, 8, 128), and
contact lanes stack on a leading axis. All 100 substeps run inside the
kernel with state resident in VMEM — zero HBM round-trips, zero dispatch.

Physics semantics are identical to ops/dynamics.py (same velocity-level
substep, servo model, SAT box-box manifolds with the cross-piercing
fallback, arm sphere-chain collision with frozen-arm joint coupling,
mass-splitting fused Jacobi solver, Baumgarte bias, friction clamp) for the
single-free-body scenes of the single-step family — the headline benchmark
config (push, 4096 envs). Parity is asserted in tests/test_pallas_engine.py
against the XLA engine.

Scope: single_step scenes (1 box or cylinder object + plane + 2 fingers).
Other families run ops/pallas_multibody.py or fall back to the XLA engine.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import scene as S

F32 = jnp.float32
SUB, LANE = 8, 128
TILE = SUB * LANE                   # 1024 envs per grid program

# state row layout (ROWS, 8, 128)
_Q, _QD, _FQ, _FQD = slice(0, 7), slice(7, 14), slice(14, 16), slice(16, 18)
_BP, _BQ, _BV, _BW = slice(18, 21), slice(21, 25), slice(25, 28), slice(28, 31)
_EEF = slice(31, 34)
N_ROWS = 34
# controls rows
_CQT, _CFT = slice(0, 7), slice(7, 9)
N_CTRL = 9


# ---------------------------------------------------------------- tile algebra
def _c(v):
    """Constant broadcast to a tile."""
    return jnp.full((SUB, LANE), float(v), F32)


def _cv(xyz):
    return jnp.stack([_c(xyz[0]), _c(xyz[1]), _c(xyz[2])])


def _cq(wxyz):
    return jnp.stack([_c(wxyz[0]), _c(wxyz[1]), _c(wxyz[2]), _c(wxyz[3])])


def vdot(a, b):
    return jnp.sum(a * b, axis=0)                   # (...,8,128)


def vcross(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def qmul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def qrotate(q, v):
    w = q[0:1]
    u = q[1:4]
    uv = vcross(u, v)
    return v + 2.0 * (w * uv + vcross(u, uv))


def qrotate_inv(q, v):
    qc = jnp.concatenate([q[0:1], -q[1:4]])
    return qrotate(qc, v)


def qmat(q):
    """Rotation matrix rows from quaternion: returns (3,3,8,128)."""
    w, x, y, z = q
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)]),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)]),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)]),
    ])


def mat3vec(R, v):
    """R (3,3,...) @ v (3,...) -> (3,...) without dot_general (Mosaic can't
    lower batched dots)."""
    return jnp.stack([sum(R[i, j] * v[j] for j in range(3)) for i in range(3)])


def qnormalize(q):
    n = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, axis=0), 1e-12))
    return q * n


# --------------------------------------------------------------------- FK
from pybullet_multigoal_gym_tpu.ops import fk as _fk

_OQ = np.asarray(_fk._ORIGIN_QUAT_NP)
_OXYZ = np.asarray(KM.JOINT_ORIGIN_XYZ)


def fk_chain(q_rows, fq_rows, gripper: str = 'parallel_jaw'):
    """Tile FK of the whole arm chain (mirrors ops/fk.py:link_frames +
    the finger/sphere placement in ops/dynamics.py:substep).

    Returns dict with per-joint origin tiles ``o`` (list of 7 (3,T)), joint
    z axes ``z`` (list of 7 (3,T)), link-7 quat ``r7``, finger box centres
    ``fpos`` (list of 2 (3,T)), finger axes ``faxis`` (pad velocity per unit
    fqd — unit prismatic direction for the jaw, the Robotiq linkage Jacobian
    otherwise), and the arm collision sphere centres ``spheres``."""
    p = _cv([0.0, 0.0, 0.0])
    r = _cq([1.0, 0.0, 0.0, 0.0])
    origins, rots = [], []
    for j in range(7):
        p = p + qrotate(r, _cv(_OXYZ[j]))
        r = qmul(r, _cq(_OQ[j]))
        half = q_rows[j] * 0.5
        jq = jnp.stack([jnp.cos(half), jnp.zeros_like(half),
                        jnp.zeros_like(half), jnp.sin(half)])
        r = qmul(r, jq)
        origins.append(p)
        rots.append(r)
    z = [qrotate(rots[j], _cv([0.0, 0.0, 1.0])) for j in range(7)]
    r7 = rots[6]
    gbase = origins[6] + qrotate(r7, _cv(KM.GRIPPER_BASE_OFFSET))
    fpos, faxis = [], []
    if gripper == 'robotiq85':
        # Robotiq-85 parallelogram pads (KM.robotiq_pad_kinematics scalars)
        for f in range(2):
            s = 1.0 if f == 0 else -1.0
            ct, st = jnp.cos(fq_rows[f]), jnp.sin(fq_rows[f])
            pad_x = (KM.ROBOTIQ_INNER_X + KM.ROBOTIQ_ARM_TX * ct
                     + KM.ROBOTIQ_ARM_TY * st + KM.ROBOTIQ_TAB_X
                     + KM.ROBOTIQ_BASE_OFFSET[2])
            pad_y = s * (KM.ROBOTIQ_INNER_Y + KM.ROBOTIQ_ARM_TY * ct
                         - KM.ROBOTIQ_ARM_TX * st - KM.ROBOTIQ_TAB_Y
                         + KM.ROBOTIQ_PAD_HALF[1])
            dx = -KM.ROBOTIQ_ARM_TX * st + KM.ROBOTIQ_ARM_TY * ct
            dy = -s * (KM.ROBOTIQ_ARM_TX * ct + KM.ROBOTIQ_ARM_TY * st)
            zero = jnp.zeros_like(ct)
            fpos.append(origins[6]
                        + qrotate(r7, jnp.stack([zero, pad_y, pad_x])))
            faxis.append(qrotate(r7, jnp.stack([zero, dy, dx])))
    else:
        for f in range(2):
            loc = (_cv(KM.FINGER_ORIGIN[f])
                   + _cv(KM.FINGER_AXIS[f]) * fq_rows[f][None])
            fpos.append(gbase + qrotate(r7, loc))
            faxis.append(qrotate(r7, _cv(KM.FINGER_AXIS[f])))
    spheres = []
    for sp in range(len(KM.ARM_SPHERE_RADIUS)):
        li = int(KM.ARM_SPHERE_LINK[sp])
        spheres.append(origins[li]
                       + qrotate(rots[li], _cv(KM.ARM_SPHERE_OFFSET[sp])))
    return dict(o=origins, z=z, r7=r7, gbase=gbase, fpos=fpos, faxis=faxis,
                spheres=spheres)


def fk_fingers(q_rows, fq_rows):
    """Back-compat helper: (r7, fpos, faxis)."""
    ch = fk_chain(q_rows, fq_rows)
    return ch['r7'], ch['fpos'], ch['faxis']


_CORNER_SIGNS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
                 for sz in (-1.0, 1.0)]


class _Lane(NamedTuple):
    """One contact lane plus its STATIC solver metadata.

    body_sgn: +-1 when the free body is on side A/B, 0 when uninvolved.
    finger_idx / fin_sgn: finger DOF coupling (sign = side of the finger).
    link: arm velocity-Jacobian mask — joints 0..link contribute the arm
    point velocity (−1 = no arm part), the same convention as
    Engine.lane_link (dynamics.py).
    arm_sgn: sign of the arm-side coupling (dynamics.py arm_sgn).
    couple: 1.0 when the lane lets the arm YIELD (k_arm term + qd impulse
    back-reaction; dynamics.py lane_couple) — arm spheres and finger-vs-world
    lanes only. Finger-vs-movable lanes keep a kinematically stiff arm.
    ee_sgn: contribution sign to the EE force sensor (finger side, or the
    link-7/palm spheres)."""
    pt: jnp.ndarray        # (3,8,128)
    nrm: jnp.ndarray       # (3,8,128)
    pen: jnp.ndarray       # (8,128)
    active: jnp.ndarray    # (8,128) f32 0/1
    mu: float
    body_sgn: float
    finger_idx: int
    fin_sgn: float
    link: int
    arm_sgn: float
    couple: float
    ee_sgn: float


def _mk_lane(pt, nrm, pen, active, mu, body_sgn=0.0, finger_idx=-1,
             fin_sgn=0.0, link=-1, arm_sgn=0.0, couple=0.0, ee_sgn=0.0):
    return _Lane(pt, nrm, pen, active, mu, body_sgn, finger_idx, fin_sgn,
                 link, arm_sgn, couple, ee_sgn)


def _box_plane_lanes(bp, bq, half, plane_z, mu, **meta):
    """4-lane box vs plane: bottom-face incident corners
    (contact.py:box_plane)."""
    R = qmat(bq)
    lanes = []
    for corner in incident_corner_tiles(bp, R, half, _cv([0.0, 0.0, -1.0])):
        pen = _c(plane_z) - corner[2]
        lanes.append(_mk_lane(corner, _cv([0.0, 0.0, 1.0]), pen,
                              (pen > -1e-4).astype(F32), mu, **meta))
    return lanes


def _cyl_plane_lanes(bp, bq, radius, half_len, plane_z, mu, **meta):
    lanes = []
    for k in range(4):
        ang = 2.0 * np.pi * k / 4
        loc = _cv([radius * np.cos(ang), radius * np.sin(ang), -half_len])
        pt = bp + qrotate(bq, loc)
        pen = _c(plane_z) - pt[2]
        lanes.append(_mk_lane(pt, _cv([0.0, 0.0, 1.0]), pen,
                              (pen > -1e-4).astype(F32), mu, **meta))
    return lanes


# -- shared SAT tile geometry (also used by ops/pallas_multibody.py) --------
def sat_face_normal(ca, Ra, ha, cb, Rb, hb):
    """Minimum-penetration face axis over the 6 face axes of two OBBs.

    Returns (n pointing B->A, sat_ok mask, ra_n, rb_n, min_overlap) where
    r*_n are the boxes' projected half-extents along n. Axes are the COLUMN
    vectors of R (world direction of each local axis) = R[:, k]."""
    axes = [Ra[:, k] for k in range(3)] + [Rb[:, k] for k in range(3)]
    t = ca - cb

    def proj(R, h, L):
        # sum_i h_i |(R col_i) . L|
        return sum(abs(vdot(R[:, i], L)) * h[i] for i in range(3))

    best_overlap, best_axis, sat_ok = None, None, None
    for L in axes:
        overlap = proj(Ra, ha, L) + proj(Rb, hb, L) - jnp.abs(vdot(t, L))
        ok = (overlap > -1e-4).astype(F32)
        sat_ok = ok if sat_ok is None else sat_ok * ok
        signed = jnp.where(vdot(t, L) >= 0, 1.0, -1.0)
        if best_overlap is None:
            best_overlap, best_axis = overlap, L * signed[None]
        else:
            better = overlap < best_overlap
            best_axis = jnp.where(better[None], L * signed[None], best_axis)
            best_overlap = jnp.where(better, overlap, best_overlap)
    n = best_axis
    return n, sat_ok, proj(Ra, ha, n), proj(Rb, hb, n), best_overlap


def box_corner_tiles(c, R, h):
    """World positions of a box's 8 corners, as a list of (3,8,128) tiles."""
    out = []
    for s in _CORNER_SIGNS:
        loc = _cv([s[0] * h[0], s[1] * h[1], s[2] * h[2]])
        out.append(c + mat3vec(R, loc))
    return out


def incident_corner_tiles(c, R, h, d):
    """The 4 corners of the box face most facing direction d: tile port of
    contact.py:incident_face_corners. Returns a list of 4 (3,8,128) tiles."""
    dots = [vdot(d, R[:, k]) for k in range(3)]
    ad = [jnp.abs(x) for x in dots]
    m0 = ((ad[0] >= ad[1]) & (ad[0] >= ad[2])).astype(F32)
    m1 = (1.0 - m0) * (ad[1] >= ad[2]).astype(F32)
    m2 = 1.0 - m0 - m1
    m = [m0, m1, m2]
    sgn = [jnp.where(dots[k] >= 0, 1.0, -1.0) for k in range(3)]
    f = sum(m[k][None] * sgn[k][None] * h[k] * R[:, k] for k in range(3))
    u = sum(m[k][None] * h[(k + 1) % 3] * R[:, (k + 1) % 3] for k in range(3))
    v = sum(m[k][None] * h[(k + 2) % 3] * R[:, (k + 2) % 3] for k in range(3))
    base = c + f
    return [base - u - v, base - u + v, base + u - v, base + u + v]


def point_in_box_tiles(p, c, R, h):
    """0/1 mask of points inside an OBB (with the contact margin)."""
    rel = p - c
    pl_ = [vdot(R[:, i], rel) for i in range(3)]
    return ((h[0] - jnp.abs(pl_[0]) > -1e-4).astype(F32)
            * (h[1] - jnp.abs(pl_[1]) > -1e-4).astype(F32)
            * (h[2] - jnp.abs(pl_[2]) > -1e-4).astype(F32))


def clamp_into_box_tiles(p, c, R, h):
    """Closest point of an OBB to p (world): c + R clip(R^T(p-c), +-h)."""
    rel = p - c
    loc = jnp.stack([jnp.clip(vdot(R[:, i], rel), -h[i], h[i])
                     for i in range(3)])
    return c + mat3vec(R, loc)


def sat_box_box_lanes(ca, Ra, ha, cb, Rb, hb, mu, **meta):
    """9-lane SAT box-box manifold, port of ops/contact.py:box_box onto
    tiles: 4 incident-face corners of A in B, 4 of B in A, 1 cross-piercing
    fallback."""
    n, sat_ok, ra_n, rb_n, min_overlap = sat_face_normal(ca, Ra, ha,
                                                         cb, Rb, hb)
    lanes = []
    inside_any = None
    for p in incident_corner_tiles(ca, Ra, ha, -n):   # A corners toward B
        pen = rb_n - vdot(n, p - cb)
        inside = point_in_box_tiles(p, cb, Rb, hb)
        inside_any = inside if inside_any is None \
            else jnp.maximum(inside_any, inside)
        lanes.append(_mk_lane(p, n, pen, inside * sat_ok, mu, **meta))
    for p in incident_corner_tiles(cb, Rb, hb, n):    # B corners toward A
        pen = vdot(n, p - ca) + ra_n
        inside = point_in_box_tiles(p, ca, Ra, ha)
        inside_any = jnp.maximum(inside_any, inside)
        lanes.append(_mk_lane(p, n, pen, inside * sat_ok, mu, **meta))
    # cross-piercing fallback (contact.py:box_box): SAT overlap but no
    # corner of either box inside the other
    p_cross = 0.5 * (clamp_into_box_tiles(ca, cb, Rb, hb)
                     + clamp_into_box_tiles(cb, ca, Ra, ha))
    act_cross = sat_ok * (1.0 - inside_any)
    lanes.append(_mk_lane(p_cross, n, min_overlap, act_cross, mu, **meta))
    return lanes


def edge_lane_tiles(ca, Ra, ha, cb, Rb, hb):
    """Edge-edge candidate: tile port of contact.py:box_box_edge.

    Returns (pt, n, pen, active01); active when an edge-cross axis is the
    15-axis SAT minimum (with the same 20% + 1 mm face bias)."""
    t = ca - cb

    def proj(R, h, L):
        return sum(abs(vdot(R[:, i], L)) * h[i] for i in range(3))

    face_axes = [Ra[:, k] for k in range(3)] + [Rb[:, k] for k in range(3)]
    min_f, sat_ok = None, None
    for L in face_axes:
        ov = proj(Ra, ha, L) + proj(Rb, hb, L) - jnp.abs(vdot(t, L))
        ok = (ov > -1e-4).astype(F32)
        sat_ok = ok if sat_ok is None else sat_ok * ok
        min_f = ov if min_f is None else jnp.minimum(min_f, ov)
    best = None
    for i in range(3):
        for j in range(3):
            L = vcross(Ra[:, i], Rb[:, j])
            Ln = jnp.sqrt(jnp.maximum(vdot(L, L), 1e-18))
            okL = (Ln > 1e-6).astype(F32)
            Lu = L / Ln[None]
            ov = proj(Ra, ha, Lu) + proj(Rb, hb, Lu) - jnp.abs(vdot(t, Lu))
            ov = ov * okL + (1.0 - okL) * 1e9
            sat_ok = sat_ok * (ov > -1e-4).astype(F32)
            sgn = jnp.where(vdot(t, Lu) >= 0, 1.0, -1.0)
            n_ij = Lu * sgn[None]
            pa = ca
            for k in range(3):
                if k != i:
                    s = jnp.where(vdot(-n_ij, Ra[:, k]) >= 0, 1.0, -1.0)
                    pa = pa + s[None] * ha[k] * Ra[:, k]
            pb = cb
            for k in range(3):
                if k != j:
                    s = jnp.where(vdot(n_ij, Rb[:, k]) >= 0, 1.0, -1.0)
                    pb = pb + s[None] * hb[k] * Rb[:, k]
            ea, eb = Ra[:, i], Rb[:, j]
            r = pa - pb
            b_ = vdot(ea, eb)
            c_ = vdot(ea, r)
            d_ = vdot(eb, r)
            den = jnp.maximum(1.0 - b_ * b_, 1e-9)
            s_ = (b_ * d_ - c_) / den
            u_ = d_ + b_ * s_
            s_ = jnp.clip(s_, -ha[i], ha[i])
            u_ = jnp.clip(u_, -hb[j], hb[j])
            pt = 0.5 * (pa + s_[None] * ea + pb + u_[None] * eb)
            if best is None:
                best = (ov, n_ij, pt)
            else:
                better = ov < best[0]
                best = (jnp.where(better, ov, best[0]),
                        jnp.where(better[None], n_ij, best[1]),
                        jnp.where(better[None], pt, best[2]))
    min_e, n, pt = best
    edge_wins = (min_e < jnp.minimum(min_f * 0.8, min_f) - 1e-3).astype(F32)
    active = sat_ok * edge_wins * (min_e > -1e-4).astype(F32)
    return pt, n, min_e, active


def sphere_plane_lane(c, radius, plane_z, mu, **meta):
    """Sphere vs support plane: 1 lane (contact.py:sphere_plane)."""
    pen = _c(plane_z + radius) - c[2]
    p = c - _cv([0.0, 0.0, 1.0]) * radius
    return [_mk_lane(p, _cv([0.0, 0.0, 1.0]), pen,
                     (pen > -1e-4).astype(F32), mu, **meta)]


def sphere_box_lane(c, radius, cb, Rb, hb, mu, **meta):
    """Sphere (A) vs box (B): 1 lane (contact.py:sphere_box). Normal pushes
    the sphere out of the box."""
    rel = c - cb
    cl = jnp.stack([vdot(Rb[:, i], rel) for i in range(3)])
    clamped = jnp.stack([jnp.clip(cl[i], -hb[i], hb[i]) for i in range(3)])
    delta = cl - clamped
    d = jnp.sqrt(jnp.maximum(vdot(delta, delta), 1e-18))
    outside = (jnp.sum(delta * delta, 0) > 1e-18).astype(F32)
    n_out = delta / d[None]
    e0, e1, e2 = hb[0] - jnp.abs(cl[0]), hb[1] - jnp.abs(cl[1]), \
        hb[2] - jnp.abs(cl[2])
    emin = jnp.minimum(e0, jnp.minimum(e1, e2))
    is0 = ((e0 <= e1) & (e0 <= e2)).astype(F32)
    is1 = (1.0 - is0) * ((e1 <= e2).astype(F32))
    is2 = 1.0 - is0 - is1
    sgn = [jnp.where(cl[i] >= 0, 1.0, -1.0) for i in range(3)]
    n_in = jnp.stack([is0 * sgn[0], is1 * sgn[1], is2 * sgn[2]])
    n_local = n_out * outside[None] + n_in * (1.0 - outside[None])
    pen = (radius - d) * outside + (radius + emin) * (1.0 - outside)
    n = mat3vec(Rb, n_local)
    p = c - n * radius
    return [_mk_lane(p, n, pen, (pen > -1e-4).astype(F32), mu, **meta)]


def box_cyl_lanes(cb, Rb, hb, cc, radius, half_len, mu, **meta):
    """Box (B side) vs upright cylinder (A side): 2 lanes
    (port of ops/contact.py:box_cylinder_upright)."""
    rel = cc - cb
    c_local = jnp.stack([vdot(Rb[:, i], rel) for i in range(3)])
    clamped = jnp.stack([jnp.clip(c_local[i], -hb[i], hb[i]) for i in range(3)])
    delta = c_local - clamped
    d_xy = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2)
    outside = (d_xy > 1e-6).astype(F32)
    # axis-inside-box fallback: nearest exit face in XY, with the extra
    # exit depth added to the penetration (contact.py:box_cylinder_upright)
    e0 = hb[0] - jnp.abs(c_local[0])
    e1 = hb[1] - jnp.abs(c_local[1])
    is0 = (e0 <= e1).astype(F32)
    sgn0 = jnp.where(c_local[0] >= 0, 1.0, -1.0)
    sgn1 = jnp.where(c_local[1] >= 0, 1.0, -1.0)
    emin = jnp.minimum(e0, e1)
    lat_pen = (_c(radius) - d_xy) * outside \
        + (_c(radius) + emin) * (1.0 - outside)
    inv = 1.0 / jnp.maximum(d_xy, 1e-6)
    nx = delta[0] * inv * outside + is0 * sgn0 * (1.0 - outside)
    ny = delta[1] * inv * outside + (1.0 - is0) * sgn1 * (1.0 - outside)
    n_loc = jnp.stack([nx, ny, jnp.zeros_like(nx)])
    n_lat = mat3vec(Rb, n_loc)
    p_lat = cc - n_lat * radius
    vert_pen = _c(hb[2] + half_len) - jnp.abs(c_local[2])
    in_xy = ((jnp.abs(c_local[0]) < hb[0] + radius)
             & (jnp.abs(c_local[1]) < hb[1] + radius)).astype(F32)
    # exclusive candidates keyed on the SAT minimum direction
    # (contact.py:box_cylinder_upright side_is_min)
    side_is_min = (lat_pen <= vert_pen).astype(F32)
    lat_act = ((lat_pen > -1e-4)
               & (jnp.abs(c_local[2]) < hb[2] + half_len)).astype(F32) \
        * side_is_min
    vert_act = (vert_pen > -1e-4).astype(F32) * in_xy * (1.0 - side_is_min)
    sz = jnp.where(c_local[2] >= 0, 1.0, -1.0)
    n_vert = mat3vec(Rb, jnp.stack([jnp.zeros_like(sz),
                                      jnp.zeros_like(sz), sz]))
    p_vert = cc - n_vert * half_len
    return [
        _mk_lane(p_lat, n_lat, lat_pen, lat_act, mu, **meta),
        _mk_lane(p_vert, n_vert, vert_pen, vert_act, mu, **meta),
    ]


# legacy aliases used by pallas_multibody (pre-port); the meta kwargs default
# to "no coupling" so the geometry output is unchanged
_box_cyl_lanes = box_cyl_lanes


# ------------------------------------------------------------------ the kernel
def _build_kernel(spec: S.SceneSpec, solver_iters: int, erp: float,
                  slop: float, n_substeps: int, arm_collision: bool,
                  gripper: str = 'parallel_jaw', ik_workspace: bool = True):
    assert spec.n_bodies <= 1 and spec.ns_static == 0 and spec.door is None, \
        'pallas engine v1 supports single-free-body scenes only'
    from pybullet_multigoal_gym_tpu.ops import lane_cull as LC
    reach_m = LC.arm_lane_mask(spec, ik_workspace)
    has_body = spec.n_bodies == 1
    if has_body:
        a = spec.np_arrays()
        geom_type = int(a['geom_type'][0])
        half = tuple(float(x) for x in a['geom_half'][0])
        mass = float(a['body_mass'][0])
        inv_mass = 1.0 / mass
        fric = float(a['body_friction'][0])
        inertia = S.body_inertia_diag(mass, half, geom_type)
        inv_inertia = (1.0 / inertia).astype(np.float32)
        plane_mu = fric * spec.plane_friction
        finger_mu = fric * 1.0
    if gripper == 'robotiq85':
        fhalf = tuple(float(x) for x in KM.ROBOTIQ_PAD_HALF)
        finger_mass = KM.ROBOTIQ_FINGER_INERTIA
        finger_force = KM.ROBOTIQ_PD_FORCE
        finger_vlim = KM.ROBOTIQ_VEL_LIMIT
        fq_lo, fq_hi = 0.0, KM.ROBOTIQ_JOINT_LIMIT
    else:
        fhalf = tuple(float(x) for x in KM.FINGER_HALF_EXTENTS)
        finger_mass = KM.FINGER_MASS * KM.FINGER_INERTIA_SCALING
        finger_force = KM.FINGER_PD_FORCE
        finger_vlim = D.FINGER_VEL_LIMIT
        fq_lo, fq_hi = -KM.FINGER_LIMIT, KM.FINGER_LIMIT
    dt = D.DT_SUB
    jl_lo = np.asarray(KM.JOINT_LIMIT_LOWER, np.float32)
    jl_hi = np.asarray(KM.JOINT_LIMIT_UPPER, np.float32)
    arm_inertia = np.asarray(KM.ARM_EFFECTIVE_INERTIA, np.float32)
    inv_arm_inertia = (1.0 / arm_inertia).astype(np.float32)
    sph_radii = np.asarray(KM.ARM_SPHERE_RADIUS, np.float32)
    sph_links = np.asarray(KM.ARM_SPHERE_LINK, np.int32)

    def substep(carry, qt_rows, ft_rows):
        """One velocity-level 2 ms substep — mirrors dynamics.Engine.substep:
        servos + gravity propose velocities, contacts generated at the
        CURRENT coordinates correct them (with frozen-arm joint coupling),
        then all coordinates integrate together."""
        (q, qd, fq, fqd, bp, bq, bv, bw) = carry

        # 1. arm servo -> proposed qd (q integrates after the solve)
        new_qd = []
        for j in range(7):
            err = qt_rows[j] - q[j]
            v_des = jnp.clip(D.ARM_SERVO_RATE * err, -D.ARM_VEL_LIMIT,
                             D.ARM_VEL_LIMIT)
            dv = KM.ARM_PD_FORCE * dt / arm_inertia[j]
            new_qd.append(qd[j] + jnp.clip(v_des - qd[j], -dv, dv))
        qd = jnp.stack(new_qd)

        # 2. FK at the current configuration
        ch = fk_chain(q, fq, gripper)
        fpos, faxis = ch['fpos'], ch['faxis']
        Rb7 = qmat(ch['r7'])

        # 3. finger servo
        new_fqd = []
        for f in range(2):
            err = ft_rows[f] - fq[f]
            v_des = jnp.clip(D.ARM_SERVO_RATE * err, -finger_vlim,
                             finger_vlim)
            dv = finger_force * dt / finger_mass
            new_fqd.append(fqd[f] + jnp.clip(v_des - fqd[f], -dv, dv))
        fqd = jnp.stack(new_fqd)

        # 4. gravity (no .at[] — scatter is unsupported in Mosaic)
        if has_body:
            bv = jnp.stack([bv[0], bv[1], bv[2] - D.GRAVITY * dt])
            Ra = qmat(bq)

        # 5. contacts (lane order mirrors dynamics._build_contact_plan)
        lanes = []
        if has_body and geom_type == S.BOX:
            lanes += _box_plane_lanes(bp, bq, half, spec.plane_z, plane_mu,
                                      body_sgn=1.0)
            for f in range(2):
                lanes += sat_box_box_lanes(
                    bp, Ra, half, fpos[f], Rb7, fhalf, finger_mu,
                    body_sgn=1.0, finger_idx=f, fin_sgn=-1.0, link=6,
                    arm_sgn=-1.0, ee_sgn=-1.0)
        elif has_body:
            lanes += _cyl_plane_lanes(bp, bq, half[0], half[2], spec.plane_z,
                                      plane_mu, body_sgn=1.0)
            for f in range(2):
                lanes += box_cyl_lanes(
                    fpos[f], Rb7, fhalf, bp, half[0], half[2], finger_mu,
                    body_sgn=1.0, finger_idx=f, fin_sgn=-1.0, link=6,
                    arm_sgn=-1.0, ee_sgn=-1.0)
        if arm_collision:
            for f in range(2):
                lanes += _box_plane_lanes(
                    fpos[f], ch['r7'], fhalf, spec.plane_z,
                    1.0 * spec.plane_friction, finger_idx=f, fin_sgn=1.0,
                    link=6, arm_sgn=1.0, couple=1.0, ee_sgn=1.0)
            # statically unreachable sphere/partner pairs are culled
            # (ops/lane_cull.py: workspace envelope)
            for sp in range(len(sph_radii)):
                link = int(sph_links[sp])
                ee = 1.0 if link == 6 else 0.0
                if reach_m['plane'][sp]:
                    lanes += sphere_plane_lane(
                        ch['spheres'][sp], float(sph_radii[sp]), spec.plane_z,
                        0.5 * spec.plane_friction, link=link, arm_sgn=1.0,
                        couple=1.0, ee_sgn=ee)
                if has_body and reach_m['geom'][sp][0]:
                    lanes += sphere_box_lane(
                        ch['spheres'][sp], float(sph_radii[sp]), bp, Ra,
                        half, 0.5 * fric, body_sgn=-1.0, link=link,
                        arm_sgn=1.0, couple=1.0, ee_sgn=ee)

        # stack lanes: (L,...). Lane constants (mu, masks) must be built
        # from SCALAR literals — pallas kernels may not capture materialised
        # numpy/jnp constant arrays.
        L = len(lanes)
        pts = jnp.stack([l.pt for l in lanes])          # (L,3,8,128)
        nrm = jnp.stack([l.nrm for l in lanes])
        pen = jnp.stack([l.pen for l in lanes])         # (L,8,128)
        act = jnp.stack([l.active for l in lanes])

        def lane_const(vals, extra_dim=False):
            # full (8,128) tiles per lane: Mosaic cannot broadcast a
            # (L,1,1) vector onto (L,8,128) tiled registers
            shape = (1, SUB, LANE) if extra_dim else (SUB, LANE)
            return jnp.stack([jnp.full(shape, float(v), F32) for v in vals])

        mu = lane_const([l.mu for l in lanes])
        body_sgn = lane_const([l.body_sgn for l in lanes])
        body_sgn_v = lane_const([l.body_sgn for l in lanes], extra_dim=True)
        body_in = lane_const([abs(l.body_sgn) for l in lanes])
        fin_id = [l.finger_idx for l in lanes]
        is_fin = [lane_const([1.0 if fi == f else 0.0 for fi in fin_id])
                  for f in range(2)]
        is_fin_v = [lane_const([1.0 if fi == f else 0.0 for fi in fin_id],
                               extra_dim=True) for f in range(2)]
        fin_sgn = lane_const([l.fin_sgn for l in lanes])
        fin_sgn_v = lane_const([l.fin_sgn for l in lanes], extra_dim=True)
        arm_sgn_v = lane_const([l.arm_sgn for l in lanes], extra_dim=True)
        ee_sgn_v = lane_const([l.ee_sgn for l in lanes], extra_dim=True)

        # static lane-group boundaries: body-only lanes first, then lanes
        # with an arm point velocity (link>=0), with the arm-YIELDING
        # (couple=1) lanes contiguous at the tail — the expensive arm terms
        # run on static slices instead of masked full-size arrays
        n_link = next((i for i, l in enumerate(lanes) if l.link >= 0), L)
        n_cpl = next((i for i, l in enumerate(lanes) if l.couple > 0), L)
        assert all(l.link >= 0 for l in lanes[n_link:])
        assert all(l.couple > 0 and l.arm_sgn == 1.0 for l in lanes[n_cpl:])
        assert all(l.couple == 0 for l in lanes[:n_cpl])
        jmask_l = [lane_const([1.0 if l.link >= j else 0.0
                               for l in lanes[n_link:]], extra_dim=True)
                   for j in range(7)]
        jmask_c = [lane_const([1.0 if l.link >= j else 0.0
                               for l in lanes[n_cpl:]]) for j in range(7)]
        arm_sgn_l = lane_const([l.arm_sgn for l in lanes[n_link:]],
                               extra_dim=True)

        # 6. solve (fused Jacobi, mass splitting — mirrors dynamics._solve)
        # inv_I_w[i,k] = sum_j Ra[i,j] * invI_j * Ra[k,j] (python-scalar invI)
        if has_body:
            inv_I_w = jnp.stack([
                jnp.stack([
                    sum(Ra[i, j] * float(inv_inertia[j]) * Ra[k, j]
                        for j in range(3))
                    for k in range(3)])
                for i in range(3)])                          # (3,3,8,128)
            r_a = pts - bp[None]
        # tangent frame
        up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                       jnp.stack([jnp.zeros_like(pen), jnp.zeros_like(pen),
                                  jnp.ones_like(pen)], 1),
                       jnp.stack([jnp.ones_like(pen), jnp.zeros_like(pen),
                                  jnp.zeros_like(pen)], 1))
        t1 = jnp.stack([nrm[:, 1] * up[:, 2] - nrm[:, 2] * up[:, 1],
                        nrm[:, 2] * up[:, 0] - nrm[:, 0] * up[:, 2],
                        nrm[:, 0] * up[:, 1] - nrm[:, 1] * up[:, 0]], 1)
        t1 = t1 * jax.lax.rsqrt(jnp.maximum(jnp.sum(t1 * t1, 1, keepdims=True),
                                            1e-18))
        t2 = jnp.stack([nrm[:, 1] * t1[:, 2] - nrm[:, 2] * t1[:, 1],
                        nrm[:, 2] * t1[:, 0] - nrm[:, 0] * t1[:, 2],
                        nrm[:, 0] * t1[:, 1] - nrm[:, 1] * t1[:, 0]], 1)

        body_count = jnp.maximum(jnp.sum(act * body_in, 0), 1.0)
        fin_count = [jnp.maximum(jnp.sum(act * is_fin[f], 0), 1.0)
                     for f in range(2)]
        arm_count = (jnp.maximum(jnp.sum(act[n_cpl:], 0), 1.0)
                     if n_cpl < L else None)

        faxis_l = jnp.stack([faxis[0], faxis[1]])        # (2,3,8,128)
        lane_axis = (faxis_l[0][None] * is_fin_v[0]
                     + faxis_l[1][None] * is_fin_v[1])   # (L,3,8,128)
        lane_fin_count = (fin_count[0][None] * is_fin[0]
                          + fin_count[1][None] * is_fin[1]
                          + (1.0 - is_fin[0] - is_fin[1]))

        # arm point Jacobians per lane: J_j(p) = z_j x (p - o_j), masked to
        # joints <= link (dynamics._solve arm_jac). J_j . d is computed as
        # z_j . ((p - o_j) x d) to avoid storing (L,7,3) tiles.
        def lane_cross(u, v):
            return jnp.stack([u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                              u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                              u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]], 1)

        # frozen arm point velocity (constant through the iterations):
        # v_arm(p) = sum_j qd_j * (z_j x (p - o_j)), only for the link>=0
        # lane tail; body-only lanes get a static zero prefix
        if n_link < L:
            pts_l = pts[n_link:]
            v_tail = 0.0
            for j in range(7):
                zx = lane_cross(
                    jnp.broadcast_to(ch['z'][j][None], pts_l.shape),
                    pts_l - ch['o'][j][None])
                v_tail = v_tail + zx * qd[j][None, None] * jmask_l[j]
            v_arm = (jnp.concatenate(
                [jnp.zeros((n_link,) + pts.shape[1:], F32), v_tail])
                if n_link else v_tail)
        else:
            v_arm = jnp.zeros_like(pts)

        def k_arm(d):
            """Arm effective inverse mass along d — computed only on the
            couple=1 lane tail (dynamics._solve k_arm); zero elsewhere."""
            if n_cpl >= L:
                return 0.0
            pts_c = pts[n_cpl:]
            dc = d[n_cpl:]
            k = 0.0
            for j in range(7):
                # J_j . d = z_j . ((p - o_j) x d)
                pd = lane_cross(pts_c - ch['o'][j][None], dc)
                jd = jnp.sum(pd * ch['z'][j][None], 1)
                k = k + jd * jd * float(inv_arm_inertia[j]) * jmask_c[j]
            k = k * arm_count[None]
            return (jnp.concatenate(
                [jnp.zeros((n_cpl,) + k.shape[1:], F32), k])
                if n_cpl else k)

        def k_dir(d):
            da = jnp.sum(d * lane_axis, 1)
            k_fin = (da * da / finger_mass) * lane_fin_count \
                * (is_fin[0] + is_fin[1])
            k = k_fin + k_arm(d)
            if has_body:
                rxd = jnp.stack([r_a[:, 1] * d[:, 2] - r_a[:, 2] * d[:, 1],
                                 r_a[:, 2] * d[:, 0] - r_a[:, 0] * d[:, 2],
                                 r_a[:, 0] * d[:, 1] - r_a[:, 1] * d[:, 0]], 1)
                Iw_rxd = jnp.stack(
                    [sum(inv_I_w[i, j] * rxd[:, j] for j in range(3))
                     for i in range(3)], axis=1)
                k = k + ((inv_mass + jnp.sum(rxd * Iw_rxd, 1))
                         * body_count[None] * body_in)
            return k

        kn_raw = k_dir(nrm)
        solvable = act * (kn_raw > 1e-8).astype(F32)
        kn = jnp.maximum(kn_raw, 1e-8)
        kt1 = jnp.maximum(k_dir(t1), 1e-8)
        kt2 = jnp.maximum(k_dir(t2), 1e-8)
        # capped recovery velocity (dynamics._solve BIAS_CAP)
        bias = -jnp.minimum((erp / dt) * jnp.maximum(pen - slop, 0.0),
                            D.BIAS_CAP)

        def point_vel(bv_, bw_, fqd_):
            v_fin_dof = (faxis_l[0][None] * fqd_[0][None, None] * is_fin_v[0]
                         + faxis_l[1][None] * fqd_[1][None, None]
                         * is_fin_v[1])
            # signed relative velocity va - vb per lane:
            #   body side * body_sgn + (arm point + finger DOF) * their signs
            v = v_arm * arm_sgn_v + v_fin_dof * fin_sgn_v
            if has_body:
                v_body = bv_[None] + jnp.stack(
                    [bw_[1][None] * r_a[:, 2] - bw_[2][None] * r_a[:, 1],
                     bw_[2][None] * r_a[:, 0] - bw_[0][None] * r_a[:, 2],
                     bw_[0][None] * r_a[:, 1] - bw_[1][None] * r_a[:, 0]], 1)
                v = v + v_body * body_sgn_v
            return v

        def iteration(_, scarry):
            bv_, bw_, fqd_, ln, lt1, lt2 = scarry
            vrel = point_vel(bv_, bw_, fqd_)
            vn = jnp.sum(vrel * nrm, 1)
            dln = jnp.where(solvable > 0, -(vn + bias) / kn, 0.0)
            nln = jnp.maximum(ln + dln, 0.0)
            dln = nln - ln
            lim = mu * nln
            vt1 = jnp.sum(vrel * t1, 1)
            dlt1 = jnp.where(solvable > 0, -vt1 / kt1, 0.0)
            nlt1 = jnp.clip(lt1 + dlt1, -lim, lim)
            dlt1 = nlt1 - lt1
            vt2 = jnp.sum(vrel * t2, 1)
            dlt2 = jnp.where(solvable > 0, -vt2 / kt2, 0.0)
            nlt2 = jnp.clip(lt2 + dlt2, -lim, lim)
            dlt2 = nlt2 - lt2
            imp = nrm * dln[:, None] + t1 * dlt1[:, None] + t2 * dlt2[:, None]
            if has_body:
                # apply to the body (signed by side)
                imp_b = imp * body_sgn_v
                bv_ = bv_ + jnp.sum(imp_b, 0) * inv_mass
                ang = jnp.stack(
                    [r_a[:, 1] * imp_b[:, 2] - r_a[:, 2] * imp_b[:, 1],
                     r_a[:, 2] * imp_b[:, 0] - r_a[:, 0] * imp_b[:, 2],
                     r_a[:, 0] * imp_b[:, 1] - r_a[:, 1] * imp_b[:, 0]], 1)
                bw_ = bw_ + mat3vec(inv_I_w, jnp.sum(ang, 0))
            # apply to the finger DOFs (signed by side)
            dfq = jnp.sum(imp * lane_axis, 1) * fin_sgn / finger_mass
            fqd_ = jnp.stack([
                fqd_[0] + jnp.sum(dfq * is_fin[0], 0),
                fqd_[1] + jnp.sum(dfq * is_fin[1], 0)])
            return bv_, bw_, fqd_, nln, nlt1, nlt2

        zeros_l = jnp.zeros_like(pen)
        bv_, bw_, fqd_, ln, lt1, lt2 = jax.lax.fori_loop(
            0, solver_iters, iteration,
            (bv, bw, fqd, zeros_l, zeros_l, zeros_l))

        tot_imp = (nrm * ln[:, None] + t1 * lt1[:, None] + t2 * lt2[:, None])

        # arm coupling: accumulated impulses -> joint velocities, applied
        # once after the loop (frozen-arm scheme, dynamics._solve). EVERY
        # arm-velocity lane contributes (qd-couple, dynamics lane_qd_couple)
        # — including finger-vs-movable lanes signed arm_sgn=-1, so the arm
        # stalls against trapped objects instead of grinding through them.
        if n_link < L:
            imp_arm = tot_imp[n_link:] * arm_sgn_l
            pts_t = pts[n_link:]
            new_qd = []
            for j in range(7):
                pd = lane_cross(pts_t - ch['o'][j][None], imp_arm)
                jd = jnp.sum(jnp.sum(pd * ch['z'][j][None], 1)
                             * jmask_l[j][:, 0], 0)
                # capped at the motor's per-substep authority
                cap = float(KM.ARM_PD_FORCE * dt * inv_arm_inertia[j])
                new_qd.append(qd[j] + jnp.clip(jd * float(inv_arm_inertia[j]),
                                               -cap, cap))
            qd = jnp.stack(new_qd)

        # EE force sensor: impulse applied onto the gripper
        # (fingers + palm/link-7 spheres) / dt
        fin_imp = jnp.sum(tot_imp * ee_sgn_v, 0)
        ee_force = fin_imp / dt

        # 7. integrate everything with the corrected velocities; joints at a
        # hard stop lose the velocity INTO the stop (dynamics.substep: a
        # phantom limit-pinned velocity reads as real surface speed to the
        # contact solver)
        new_q, new_qd = [], []
        for j in range(7):
            qj = jnp.clip(q[j] + qd[j] * dt, jl_lo[j], jl_hi[j])
            new_q.append(qj)
            new_qd.append(jnp.where((qj >= jl_hi[j]) & (qd[j] > 0), 0.0,
                                    jnp.where((qj <= jl_lo[j]) & (qd[j] < 0),
                                              0.0, qd[j])))
        q = jnp.stack(new_q)
        qd = jnp.stack(new_qd)
        if has_body:
            bp = bp + bv_ * dt
            w_norm = jnp.sqrt(jnp.maximum(jnp.sum(bw_ * bw_, 0), 1e-18))
            half_ang = w_norm * dt * 0.5
            s = jnp.where(w_norm > 1e-9, jnp.sin(half_ang) / w_norm, 0.0)
            dq_rot = jnp.concatenate([jnp.cos(half_ang)[None], bw_ * s[None]])
            bq = qnormalize(qmul(dq_rot, bq))
        fq = jnp.clip(fq + fqd_ * dt, fq_lo, fq_hi)
        fqd_ = jnp.where((fq >= fq_hi) & (fqd_ > 0), 0.0,
                         jnp.where((fq <= fq_lo) & (fqd_ < 0), 0.0, fqd_))

        return (q, qd, fq, fqd_, bp, bq, bv_, bw_), ee_force

    def kernel(state_ref, ctrl_ref, out_ref):
        s = state_ref[:]
        ctl = ctrl_ref[:]
        qt = ctl[_CQT]
        ft = ctl[_CFT]
        q, qd, fq, fqd = s[_Q], s[_QD], s[_FQ], s[_FQD]
        bp, bq, bv, bw = s[_BP], s[_BQ], s[_BV], s[_BW]

        def body(i, carry):
            new_carry, ee = substep(carry[0], qt, ft)
            return (new_carry, ee)

        carry = ((q, qd, fq, fqd, bp, bq, bv, bw),
                 jnp.zeros((3, SUB, LANE), F32))
        carry = jax.lax.fori_loop(0, n_substeps, body, carry)
        (q, qd, fq, fqd, bp, bq, bv, bw), ee = carry
        out_ref[:] = jnp.concatenate([q, qd, fq, fqd, bp, bq, bv, bw, ee])

    return kernel


class PallasEngine:
    """Batched drop-in for Engine.control_step on single-free-body scenes.

    Operates on BATCHED PhysicsState pytrees (leading env axis), unlike the
    per-env `Engine` which is vmapped outside. The env batch must be a
    multiple of 1024 (one (8,128) VPU tile per grid program)."""

    def __init__(self, spec: S.SceneSpec, solver_iters: int = 8,
                 erp: float = 0.2, slop: float = 5e-4,
                 interpret: bool = None, arm_collision: bool = True,
                 gripper: str = 'parallel_jaw', ik_workspace: bool = True):
        self.spec = spec
        self.gripper = gripper
        self.solver_iters = solver_iters
        self.erp = erp
        self.slop = slop
        self.arm_collision = arm_collision
        self.ik_workspace = ik_workspace
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        self.interpret = interpret
        self._kernels = {}

    def _get_kernel(self, n_substeps):
        if n_substeps not in self._kernels:
            self._kernels[n_substeps] = _build_kernel(
                self.spec, self.solver_iters, self.erp, self.slop, n_substeps,
                self.arm_collision, self.gripper, self.ik_workspace)
        return self._kernels[n_substeps]

    def control_step(self, state: D.PhysicsState, controls: D.Controls,
                     n_sim_calls: int = D.SIM_CALLS_PER_STEP,
                     n_substeps: int = None) -> D.PhysicsState:
        n_sub = (n_substeps if n_substeps is not None
                 else n_sim_calls * D.SUBSTEPS_PER_SIM)
        N = state.q.shape[0]
        assert N % TILE == 0, 'pallas engine needs num_envs %% 1024 == 0'
        G = N // TILE

        def pack(rows):
            # (N, k) -> (k, G*8, 128)
            x = jnp.concatenate([r.reshape(N, -1) for r in rows], axis=-1)
            return x.reshape(G, SUB, LANE, x.shape[-1]).transpose(3, 0, 1, 2) \
                    .reshape(-1, G * SUB, LANE)

        sin = pack([state.q, state.qd, state.fq, state.fqd, state.body_pos[:, 0],
                    state.body_quat[:, 0], state.body_linvel[:, 0],
                    state.body_angvel[:, 0], state.ee_contact_force])
        cin = pack([controls.q_target, controls.f_target])

        kernel = self._get_kernel(n_sub)
        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((N_ROWS, SUB, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N_CTRL, SUB, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N_ROWS, SUB, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_ROWS, G * SUB, LANE), F32),
            # arm-collision lanes push peak VMEM slightly past the 16 MB
            # default scoped limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=self.interpret,
        )(sin, cin)

        # unpack (34, G*8, 128) -> per-field (N, ...)
        flat = out.reshape(N_ROWS, G, SUB, LANE).transpose(1, 2, 3, 0) \
                  .reshape(N, N_ROWS)
        return D.PhysicsState(
            q=flat[:, 0:7], qd=flat[:, 7:14],
            fq=flat[:, 14:16], fqd=flat[:, 16:18],
            body_pos=flat[:, 18:21][:, None],
            body_quat=flat[:, 21:25][:, None],
            body_linvel=flat[:, 25:28][:, None],
            body_angvel=flat[:, 28:31][:, None],
            door_q=state.door_q, door_qd=state.door_qd,
            ee_contact_force=flat[:, 31:34])
