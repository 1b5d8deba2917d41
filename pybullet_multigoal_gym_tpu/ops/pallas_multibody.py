"""General multi-body Pallas physics kernel.

Extends the single-free-body kernel (ops/pallas_engine.py) to the full scene
vocabulary of the suite: N free bodies (multi-geom), static boxes, the
1-DoF chest door, and the two fingers — the whole 100-substep control step
still fused into ONE kernel over (8,128) env tiles.

Contact manifold policy (VMEM is the binding constraint — every live lane
array costs ~4 KB per (8,128) tile regardless of batch size):
  * finger vs free geom          16 lanes (two-sided SAT — grasp quality)
  * free geom vs free geom       16 lanes (two-sided SAT)
  * free geom vs static/pinned/door  8 lanes (one-sided: free-geom corners,
    SAT face normal — the free body is the smaller object in this suite)
  * finger vs door               16 lanes (door-handle pushing quality)
  * geom vs support plane        8 (box) / 4 (cylinder)
Scenes whose lane count exceeds LANE_BUDGET fall back to the XLA engine
(vec_env checks `supports_scene`).

Semantics mirror ops/dynamics.py (same servo constants, Baumgarte bias,
mass-splitting fused Jacobi solver, friction clamp); parity is asserted in
tests/test_pallas_multibody.py.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.ops.pallas_engine import (
    F32, LANE, SUB, TILE, _c, _cq, _cv, box_corner_tiles, fk_fingers,
    mat3vec, point_in_box_tiles, qmat, qmul, qnormalize, qrotate,
    sat_face_normal, vcross, vdot, _CORNER_SIGNS)

# Lane ceiling with the segment-sliced solver and the raised scoped-VMEM
# limit (CompilerParams below; the 16 MB default rejected >~240 lanes).
# v5e throughput by lane count: <=480 lanes runs at full speed (block nb=5
# -> 52k steps/s, chest nb=4 -> 42k); chest nb=5 spills to HBM and drops to
# ~0.5k — still at least XLA-fallback speed, so every reference
# configuration stays on the kernel.
LANE_BUDGET = 640


DOOR_A = -1      # side A is the chest door
PINNED_A = -2    # side A is a pinned (zero-mass, immovable) geom


class _Lane(NamedTuple):
    pt: jnp.ndarray
    nrm: jnp.ndarray       # points from side B toward side A
    pen: jnp.ndarray
    active: jnp.ndarray    # f32 0/1
    mu: float
    body_a: int            # free-body index, or DOOR_A / PINNED_A
    side_b: tuple          # ('world',), ('finger', f), ('body', b), ('door',)


# SAT geometry shared with the single-body kernel (pallas_engine.py) — one
# copy of the tested math, both kernels' parity suites cover it
_sat_normal = sat_face_normal
_corners = box_corner_tiles
_inside = point_in_box_tiles


def _two_sided(ca, Ra, ha, cb, Rb, hb, mu, body_a, side_b):
    """16-lane two-sided SAT manifold; A must be a free body."""
    n, sat_ok, ra_n, rb_n = _sat_normal(ca, Ra, ha, cb, Rb, hb)
    lanes = []
    for p in _corners(ca, Ra, ha):              # A corners past B's +n face
        pen = rb_n - vdot(n, p - cb)
        lanes.append(_Lane(p, n, pen, _inside(p, cb, Rb, hb) * sat_ok, mu,
                           body_a, side_b))
    for p in _corners(cb, Rb, hb):              # B corners past A's -n face
        pen = vdot(n, p - ca) + ra_n
        lanes.append(_Lane(p, n, pen, _inside(p, ca, Ra, ha) * sat_ok, mu,
                           body_a, side_b))
    return lanes


def _one_sided(ca, Ra, ha, cb, Rb, hb, mu, body_a, side_b):
    """8-lane manifold: only A's corners tested inside B (A = the free,
    smaller geom; B = static wall / pinned body / door panel)."""
    n, sat_ok, ra_n, rb_n = _sat_normal(ca, Ra, ha, cb, Rb, hb)
    lanes = []
    for p in _corners(ca, Ra, ha):
        pen = rb_n - vdot(n, p - cb)
        lanes.append(_Lane(p, n, pen, _inside(p, cb, Rb, hb) * sat_ok, mu,
                           body_a, side_b))
    return lanes


def _plane_lanes(c, R, q, geom_type, half, plane_z, mu, body_a):
    lanes = []
    if geom_type == S.BOX:
        for p in _corners(c, R, half):
            pen = _c(plane_z) - p[2]
            lanes.append(_Lane(p, _cv([0.0, 0.0, 1.0]), pen,
                               (pen > -1e-4).astype(F32), mu, body_a,
                               ('world',)))
    else:
        for k in range(4):
            ang = 2.0 * np.pi * k / 4
            loc = _cv([half[0] * np.cos(ang), half[0] * np.sin(ang), -half[2]])
            p = c + qrotate(q, loc)
            pen = _c(plane_z) - p[2]
            lanes.append(_Lane(p, _cv([0.0, 0.0, 1.0]), pen,
                               (pen > -1e-4).astype(F32), mu, body_a,
                               ('world',)))
    return lanes


def count_lanes(spec: S.SceneSpec) -> int:
    """Host-side lane count for the budget check."""
    a = spec.np_arrays() if spec.n_bodies else None
    n = 0
    free, pinned = [], []
    for b in range(spec.n_bodies):
        (free if a['body_mass'][b] > 0 else pinned).append(b)
    geoms_of = {b: [g for g in range(len(a['geom_body']))
                    if a['geom_body'][g] == b] for b in range(spec.n_bodies)} \
        if spec.n_bodies else {}
    for b in free:
        for g in geoms_of[b]:
            n += 8 if a['geom_type'][g] == S.BOX else 4      # plane
            n += 2 * (16 if a['geom_type'][g] == S.BOX else 2)  # fingers
            n += 8 * len(spec.static_half)                   # statics
            for b2 in pinned:
                n += 8 * len(geoms_of[b2])
            if spec.door is not None:
                n += 8 * len(np.asarray(spec.door.geom_half).reshape(-1, 3))
    for b2 in pinned:
        n += 2 * 16 * len(geoms_of[b2])          # finger vs pinned geoms
    for i, b in enumerate(free):
        for b2 in free[i + 1:]:
            n += 16 * len(geoms_of[b]) * len(geoms_of[b2])
    if spec.door is not None:
        n += 2 * 16 * len(np.asarray(spec.door.geom_half).reshape(-1, 3))
    return n


def supports_scene(spec: S.SceneSpec) -> bool:
    if spec.n_bodies < 1:
        return False
    if not any(m > 0 for m in spec.np_arrays()['body_mass']):
        return False                    # all-pinned scene: no lanes to solve
    return count_lanes(spec) <= LANE_BUDGET


def _build_kernel(spec: S.SceneSpec, solver_iters: int, erp: float,
                  slop: float, n_substeps: int):
    a = spec.np_arrays()
    B = spec.n_bodies
    masses = a['body_mass']
    inv_mass = [0.0 if m <= 0 else 1.0 / m for m in masses]
    frictions = a['body_friction']
    geoms_of = {b: [g for g in range(len(a['geom_body']))
                    if a['geom_body'][g] == b] for b in range(B)}
    free = [b for b in range(B) if masses[b] > 0]
    pinned = [b for b in range(B) if masses[b] <= 0]
    # per-body inertia from the geom centred at the origin (Engine convention)
    inv_inertia = []
    for b in range(B):
        diag = np.ones(3) * 1e-3
        for g in geoms_of[b]:
            if (a['geom_pos'][g] == 0).all():
                diag = S.body_inertia_diag(max(masses[b], 1e-6),
                                           a['geom_half'][g], a['geom_type'][g])
        inv_inertia.append((1.0 / diag if masses[b] > 0 else np.zeros(3)))
    fhalf = tuple(float(x) for x in KM.FINGER_HALF_EXTENTS)
    finger_mass = KM.FINGER_MASS * KM.FINGER_INERTIA_SCALING
    dt = D.DT_SUB
    jl_lo = np.asarray(KM.JOINT_LIMIT_LOWER, np.float32)
    jl_hi = np.asarray(KM.JOINT_LIMIT_UPPER, np.float32)
    arm_inertia = np.asarray(KM.ARM_EFFECTIVE_INERTIA, np.float32)

    door = spec.door
    if door is not None:
        door_anchor = (np.asarray(spec.chest_base, np.float64)
                       + np.asarray(door.anchor, np.float64))
        door_axis = np.asarray(door.axis, np.float64)
        door_geoms = list(zip(np.asarray(door.geom_half).reshape(-1, 3),
                              np.asarray(door.geom_pos).reshape(-1, 3)))
        door_inv_mass = 1.0 / max(door.mass, 0.25)
        door_prismatic = door.kind == S.DOOR_PRISMATIC

    # state rows: q7 qd7 fq2 fqd2 | per-body pos3 quat4 v3 w3 | door 2 | eeF3
    NB_OFF = 18
    N_ROWS = NB_OFF + 13 * B + 2 + 3
    DOOR_OFF = NB_OFF + 13 * B
    EEF_OFF = DOOR_OFF + 2
    N_CTRL = 11    # qt7 ft2 door_on1 door_tgt1

    def door_frame(door_q):
        """(pos (3,T), quat (4,T)) of the door joint frame."""
        if door_prismatic:
            pos = _cv(door_anchor) + _cv(door_axis) * door_q[None]
            rot = _cq([1.0, 0.0, 0.0, 0.0])
        else:
            half = door_q * 0.5
            ax = door_axis / np.linalg.norm(door_axis)
            rot = jnp.stack([jnp.cos(half), jnp.sin(half) * ax[0],
                             jnp.sin(half) * ax[1], jnp.sin(half) * ax[2]])
            pos = _cv(door_anchor)
        return pos, rot

    def door_jac(p, door_q):
        """Velocity of a door point per unit door_qd: (3,T)."""
        if door_prismatic:
            return _cv(door_axis)
        return vcross(_cv(door_axis), p - _cv(door_anchor))

    def substep(carry, qt, ft, door_on, door_tgt):
        (q, qd, fq, fqd, bodies, door_q, door_qd, prev_f0, prev_f1) = carry
        # bodies: list of (bp, bq, bv, bw)

        # 1. arm servo
        new_q, new_qd = [], []
        for j in range(7):
            err = qt[j] - q[j]
            v_des = jnp.clip(D.ARM_SERVO_RATE * err, -D.ARM_VEL_LIMIT,
                             D.ARM_VEL_LIMIT)
            dv = KM.ARM_PD_FORCE * dt / arm_inertia[j]
            qdj = qd[j] + jnp.clip(v_des - qd[j], -dv, dv)
            new_q.append(jnp.clip(q[j] + qdj * dt, jl_lo[j], jl_hi[j]))
            new_qd.append(qdj)
        q = jnp.stack(new_q)
        qd = jnp.stack(new_qd)

        # 2. FK
        r7, fpos, faxis = fk_fingers(q, fq)
        fkin = [(fpos[0] - prev_f0) / dt, (fpos[1] - prev_f1) / dt]
        Rb7 = qmat(r7)

        # 3. finger servo
        new_fqd = []
        for f in range(2):
            err = ft[f] - fq[f]
            v_des = jnp.clip(D.ARM_SERVO_RATE * err, -D.FINGER_VEL_LIMIT,
                             D.FINGER_VEL_LIMIT)
            dv = KM.FINGER_PD_FORCE * dt / finger_mass
            new_fqd.append(fqd[f] + jnp.clip(v_des - fqd[f], -dv, dv))
        fqd = jnp.stack(new_fqd)

        # 4. gravity on free bodies
        bodies = [(bp, bq,
                   (jnp.stack([bv[0], bv[1], bv[2] - D.GRAVITY * dt])
                    if masses[b] > 0 else bv),
                   bw)
                  for b, (bp, bq, bv, bw) in enumerate(bodies)]

        # 5. door servo / free coast (dynamics.py:510-522)
        if door is not None:
            d_err = door_tgt - door_q
            dv_des = jnp.clip(D.ARM_SERVO_RATE * d_err, -1.0, 1.0)
            ddv = 500.0 * dt * door_inv_mass
            qd_driven = door_qd + jnp.clip(dv_des - door_qd, -ddv, ddv)
            qd_free = door_qd * (1.0 - 2.0 * dt)
            door_qd = jnp.where(door_on > 0, qd_driven, qd_free)
            dpos, drot = door_frame(door_q)
            Rd = qmat(drot)
            door_geom_cr = [(dpos + mat3vec(Rd, _cv(off)), Rd, tuple(h))
                            for h, off in door_geoms]

        # 6. lane generation
        R_of = {b: qmat(bodies[b][1]) for b in range(B)}
        centers = {}
        for b in range(B):
            for g in geoms_of[b]:
                off = a['geom_pos'][g]
                c = bodies[b][0] if (off == 0).all() else \
                    bodies[b][0] + mat3vec(R_of[b], _cv(off))
                centers[g] = c
        lanes = []
        for b in free:
            for g in geoms_of[b]:
                gtype = int(a['geom_type'][g])
                half = tuple(float(x) for x in a['geom_half'][g])
                mu_p = float(frictions[b] * spec.plane_friction)
                lanes += _plane_lanes(centers[g], R_of[b], bodies[b][1],
                                      gtype, half, spec.plane_z, mu_p, b)
                for f in range(2):
                    if gtype == S.BOX:
                        lanes += _two_sided(centers[g], R_of[b], half,
                                            fpos[f], Rb7, fhalf,
                                            float(frictions[b]), b,
                                            ('finger', f))
                    else:
                        from pybullet_multigoal_gym_tpu.ops.pallas_engine \
                            import _box_cyl_lanes
                        for l in _box_cyl_lanes(fpos[f], Rb7, fhalf,
                                                centers[g], half[0], half[2],
                                                float(frictions[b]), f):
                            lanes.append(_Lane(l.pt, l.nrm, l.pen, l.active,
                                               l.mu, b, ('finger', f)))
                for si in range(len(spec.static_half)):
                    sh = tuple(float(x) for x in a['static_half'][si])
                    sc = _cv(a['static_pos'][si])
                    sR = qmat(_cq([1.0, 0.0, 0.0, 0.0]))
                    mu_s = float(frictions[b] * a['static_friction'][si])
                    lanes += _one_sided(centers[g], R_of[b], half, sc, sR, sh,
                                        mu_s, b, ('world',))
                for b2 in pinned:
                    for g2 in geoms_of[b2]:
                        h2 = tuple(float(x) for x in a['geom_half'][g2])
                        lanes += _one_sided(
                            centers[g], R_of[b], half, centers[g2], R_of[b2],
                            h2, float(frictions[b] * frictions[b2]), b,
                            ('world',))
                if door is not None:
                    for dc, dR, dh in door_geom_cr:
                        lanes += _one_sided(centers[g], R_of[b], half, dc, dR,
                                            dh, float(frictions[b] * 0.5), b,
                                            ('door',))
        # finger vs PINNED geoms (e.g. the insertion slot): the XLA engine
        # builds finger lanes for all geoms (dynamics.py:171-177); these feed
        # the EE force sensor and stop the fingers at slot walls. Pinned
        # side A = immovable: body_a = PINNED_A, zero velocity, no apply.
        for b2 in pinned:
            for g2 in geoms_of[b2]:
                h2 = tuple(float(x) for x in a['geom_half'][g2])
                for f in range(2):
                    lanes += _two_sided(centers[g2], R_of[b2], h2,
                                        fpos[f], Rb7, fhalf,
                                        float(frictions[b2]), PINNED_A,
                                        ('finger', f))
        for i, b in enumerate(free):
            for b2 in free[i + 1:]:
                for g in geoms_of[b]:
                    for g2 in geoms_of[b2]:
                        lanes += _two_sided(
                            centers[g], R_of[b],
                            tuple(float(x) for x in a['geom_half'][g]),
                            centers[g2], R_of[b2],
                            tuple(float(x) for x in a['geom_half'][g2]),
                            float(frictions[b] * frictions[b2]), b,
                            ('body', b2))
        if door is not None:
            for f in range(2):
                for dc, dR, dh in door_geom_cr:
                    # door is side A, finger side B (dynamics.py:197-199)
                    lanes += _two_sided(dc, dR, dh, fpos[f], Rb7, fhalf,
                                        1.0, DOOR_A, ('finger', f))

        # 7. segmentation: the generators above emit lanes grouped by
        # (body_a, side, mu); contiguous runs become SEGMENTS addressed with
        # static slices. No per-lane constant (mask/mu) tile arrays — the
        # masked formulation materialised O(B * L) constant tiles and blew
        # VMEM beyond ~2 free bodies.
        L = len(lanes)
        segs = []        # (start, end, body_a, side, mu)
        for i, l in enumerate(lanes):
            key_ = (l.body_a, l.side_b, l.mu)
            if segs and (segs[-1][2], segs[-1][3], segs[-1][4]) == key_:
                segs[-1] = (segs[-1][0], i + 1, *key_)
            else:
                segs.append((i, i + 1, *key_))

        pts = jnp.stack([l.pt for l in lanes])
        nrm = jnp.stack([l.nrm for l in lanes])
        pen = jnp.stack([l.pen for l in lanes])
        act = jnp.stack([l.active for l in lanes])

        inv_I_w = {}
        for b in free:
            Ra = R_of[b]
            inv_I_w[b] = [[sum(Ra[i][j] * float(inv_inertia[b][j]) * Ra[k][j]
                               for j in range(3)) for k in range(3)]
                          for i in range(3)]

        def lcross(u, v):
            return jnp.stack([u[:, 1] * v[:, 2] - u[:, 2] * v[:, 1],
                              u[:, 2] * v[:, 0] - u[:, 0] * v[:, 2],
                              u[:, 0] * v[:, 1] - u[:, 1] * v[:, 0]], 1)

        # per-segment arms / jacobians (stored only where needed)
        r_a_parts, r_b_seg, djac_seg = [], {}, {}
        for si, (s0, s1, ba, side, _) in enumerate(segs):
            sl = slice(s0, s1)
            if ba >= 0:
                r_a_parts.append(pts[sl] - bodies[ba][0][None])
            else:
                r_a_parts.append(pts[sl] * 0.0)   # door/pinned A: no arm
                if ba == DOOR_A:
                    djac_seg[si] = jnp.stack(
                        [door_jac(pts[i], door_q) for i in range(s0, s1)])
            if side[0] == 'body':
                r_b_seg[si] = pts[sl] - bodies[side[1]][0][None]
            if side == ('door',):
                djac_seg[si] = jnp.stack(
                    [door_jac(pts[i], door_q) for i in range(s0, s1)])
        r_a = jnp.concatenate(r_a_parts)

        up = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                       jnp.stack([jnp.zeros_like(pen), jnp.zeros_like(pen),
                                  jnp.ones_like(pen)], 1),
                       jnp.stack([jnp.ones_like(pen), jnp.zeros_like(pen),
                                  jnp.zeros_like(pen)], 1))

        def tangents():
            t1_ = lcross(nrm, up)
            t1_ = t1_ * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(t1_ * t1_, 1, keepdims=True), 1e-18))
            return t1_, lcross(nrm, t1_)

        # mass-splitting counts
        counts = {}
        for b in free:
            c = 0.0
            for (s0, s1, ba, side, _) in segs:
                if ba == b or side == ('body', b):
                    c = c + jnp.sum(act[s0:s1], 0)
            counts[b] = jnp.maximum(c, 1.0)
        fin_counts = []
        for f in range(2):
            c = 0.0
            for (s0, s1, ba, side, _) in segs:
                if side == ('finger', f):
                    c = c + jnp.sum(act[s0:s1], 0)
            fin_counts.append(jnp.maximum(c, 1.0))
        if door is not None:
            c = 0.0
            for (s0, s1, ba, side, _) in segs:
                if ba == DOOR_A or side == ('door',):
                    c = c + jnp.sum(act[s0:s1], 0)
            door_count = jnp.maximum(c, 1.0)

        def k_of(d):
            """Effective inverse mass per lane along direction d (L,...)."""
            parts = []
            for si, (s0, s1, ba, side, _) in enumerate(segs):
                sl = slice(s0, s1)
                ds = d[sl]
                k = 0.0
                if ba >= 0:
                    rxd = lcross(r_a[sl], ds)
                    Iw = inv_I_w[ba]
                    Iw_rxd = jnp.stack(
                        [sum(Iw[i][j] * rxd[:, j] for j in range(3))
                         for i in range(3)], 1)
                    k = k + (inv_mass[ba] + jnp.sum(rxd * Iw_rxd, 1)) \
                        * counts[ba][None]
                elif ba == DOOR_A:
                    dj = jnp.sum(ds * djac_seg[si], 1)
                    k = k + (dj * dj * door_inv_mass) * door_count[None]
                # PINNED_A contributes nothing (immovable)
                if side[0] == 'finger':
                    da = jnp.sum(ds * faxis[side[1]][None], 1)
                    k = k + (da * da / finger_mass) * fin_counts[side[1]][None]
                elif side[0] == 'body':
                    b2 = side[1]
                    rxd = lcross(r_b_seg[si], ds)
                    Iw = inv_I_w[b2]
                    Iw_rxd = jnp.stack(
                        [sum(Iw[i][j] * rxd[:, j] for j in range(3))
                         for i in range(3)], 1)
                    k = k + (inv_mass[b2] + jnp.sum(rxd * Iw_rxd, 1)) \
                        * counts[b2][None]
                elif side == ('door',):
                    dj = jnp.sum(ds * djac_seg[si], 1)
                    k = k + (dj * dj * door_inv_mass) * door_count[None]
                parts.append(k)
            return jnp.concatenate(parts)

        t1_init, t2_init = tangents()
        kn_raw = k_of(nrm)
        # degenerate lanes (direction orthogonal to every DOF) must be
        # EXCLUDED, not floored: dividing by the 1e-8 floor accumulates
        # garbage lambdas that pollute the EE force sensor
        # (dynamics._solve's `solvable` gate)
        solvable = act * (kn_raw > 1e-8).astype(F32)
        kn = jnp.maximum(kn_raw, 1e-8)
        kt1 = jnp.maximum(k_of(t1_init), 1e-8)
        kt2 = jnp.maximum(k_of(t2_init), 1e-8)
        bias = -(erp / dt) * jnp.maximum(pen - slop, 0.0)

        def iteration(_, sc):
            vels, fqd_, door_qd_, ln, lt1, lt2 = sc
            t1, t2 = tangents()              # recomputed: not stored in carry
            vrel_parts = []
            for si, (s0, s1, ba, side, _) in enumerate(segs):
                sl = slice(s0, s1)
                if ba >= 0:
                    bv_, bw_ = vels[ba]
                    va = bv_[None] + lcross(
                        jnp.broadcast_to(bw_[None], r_a[sl].shape), r_a[sl])
                elif ba == DOOR_A:
                    va = djac_seg[si] * door_qd_
                else:                    # PINNED_A: immovable
                    va = 0.0
                if side == ('world',):
                    vb = 0.0
                elif side[0] == 'finger':
                    f = side[1]
                    vb = (fkin[f] + faxis[f] * fqd_[f][None])[None]
                elif side[0] == 'body':
                    bv2, bw2 = vels[side[1]]
                    vb = bv2[None] + lcross(
                        jnp.broadcast_to(bw2[None], r_b_seg[si].shape),
                        r_b_seg[si])
                else:                        # door as side B
                    vb = djac_seg[si] * door_qd_
                vrel_parts.append(va - vb)
            vrel = jnp.concatenate(vrel_parts)
            vn = jnp.sum(vrel * nrm, 1)
            dln = jnp.where(solvable > 0, -(vn + bias) / kn, 0.0)
            nln = jnp.maximum(ln + dln, 0.0)
            dln = nln - ln
            lim = jnp.concatenate([m * nln[s0:s1]
                                   for (s0, s1, _, _, m) in segs])
            vt1_ = jnp.sum(vrel * t1, 1)
            dlt1 = jnp.where(solvable > 0, -vt1_ / kt1, 0.0)
            nlt1 = jnp.clip(lt1 + dlt1, -lim, lim)
            dlt1 = nlt1 - lt1
            vt2_ = jnp.sum(vrel * t2, 1)
            dlt2 = jnp.where(solvable > 0, -vt2_ / kt2, 0.0)
            nlt2 = jnp.clip(lt2 + dlt2, -lim, lim)
            dlt2 = nlt2 - lt2
            imp = nrm * dln[:, None] + t1 * dlt1[:, None] + t2 * dlt2[:, None]

            dv = {b: 0.0 for b in free}
            dw = {b: 0.0 for b in free}
            dfq = [0.0, 0.0]
            ddoor = 0.0
            for si, (s0, s1, ba, side, _) in enumerate(segs):
                sl = slice(s0, s1)
                imp_s = imp[sl]
                if ba >= 0:
                    dv[ba] = dv[ba] + jnp.sum(imp_s, 0)
                    dw[ba] = dw[ba] + jnp.sum(lcross(r_a[sl], imp_s), 0)
                elif ba == DOOR_A:
                    ddoor = ddoor + jnp.sum(
                        jnp.sum(imp_s * djac_seg[si], 1), 0)
                # PINNED_A: no application
                if side[0] == 'finger':
                    dfq[side[1]] = dfq[side[1]] + jnp.sum(
                        jnp.sum(imp_s * faxis[side[1]][None], 1), 0)
                elif side[0] == 'body':
                    b2 = side[1]
                    dv[b2] = dv[b2] - jnp.sum(imp_s, 0)
                    dw[b2] = dw[b2] - jnp.sum(lcross(r_b_seg[si], imp_s), 0)
                elif side == ('door',):
                    ddoor = ddoor - jnp.sum(
                        jnp.sum(imp_s * djac_seg[si], 1), 0)
            new_vels = list(vels)
            for b in free:
                bv_, bw_ = vels[b]
                Iw = inv_I_w[b]
                ang = dw[b]
                new_vels[b] = (
                    bv_ + dv[b] * inv_mass[b],
                    bw_ + jnp.stack([sum(Iw[i][j] * ang[j] for j in range(3))
                                     for i in range(3)]))
            fqd_ = jnp.stack([fqd_[0] - dfq[0] / finger_mass,
                              fqd_[1] - dfq[1] / finger_mass])
            if door is not None:
                door_qd_ = door_qd_ + ddoor * door_inv_mass
            return new_vels, fqd_, door_qd_, nln, nlt1, nlt2

        zeros_l = jnp.zeros_like(pen)
        vels0 = [(bodies[b][2], bodies[b][3]) for b in range(B)]
        vels, fqd_, door_qd, ln, lt1, lt2 = jax.lax.fori_loop(
            0, solver_iters, iteration,
            (vels0, fqd, door_qd, zeros_l, zeros_l, zeros_l))

        t1_f, t2_f = tangents()
        tot_imp = (nrm * ln[:, None] + t1_f * lt1[:, None]
                   + t2_f * lt2[:, None])
        ee_force = 0.0
        for (s0, s1, ba, side, _) in segs:
            if side[0] == 'finger':
                ee_force = ee_force - jnp.sum(tot_imp[s0:s1], 0)
        ee_force = (ee_force / dt if not isinstance(ee_force, float)
                    else jnp.zeros((3, SUB, LANE), F32))

        # 8. integrate
        new_bodies = []
        for b in range(B):
            bp, bq, _, _ = bodies[b]
            bv_, bw_ = vels[b]
            if masses[b] > 0:
                bp = bp + bv_ * dt
                w_norm = jnp.sqrt(jnp.maximum(jnp.sum(bw_ * bw_, 0), 1e-18))
                half_ang = w_norm * dt * 0.5
                s_ = jnp.where(w_norm > 1e-9, jnp.sin(half_ang) / w_norm, 0.0)
                dq_rot = jnp.concatenate([jnp.cos(half_ang)[None],
                                          bw_ * s_[None]])
                bq = qnormalize(qmul(dq_rot, bq))
            new_bodies.append((bp, bq, bv_, bw_))
        fq = jnp.clip(fq + fqd_ * dt, -KM.FINGER_LIMIT, KM.FINGER_LIMIT)
        if door is not None:
            door_q = jnp.clip(door_q + door_qd * dt, 0.0, float(door.limit))

        return ((q, qd, fq, fqd_, new_bodies, door_q, door_qd,
                 fpos[0], fpos[1]), ee_force)

    def kernel(state_ref, ctrl_ref, out_ref):
        s = state_ref[:]
        ctl = ctrl_ref[:]
        qt, ft = ctl[0:7], ctl[7:9]
        door_on, door_tgt = ctl[9], ctl[10]
        q, qd, fq, fqd = s[0:7], s[7:14], s[14:16], s[16:18]
        bodies = []
        for b in range(B):
            o = NB_OFF + 13 * b
            bodies.append((s[o:o + 3], s[o + 3:o + 7], s[o + 7:o + 10],
                           s[o + 10:o + 13]))
        door_q, door_qd = s[DOOR_OFF], s[DOOR_OFF + 1]
        _, fpos0, _ = fk_fingers(q, fq)

        def body_fn(i, carry):
            new_carry, ee = substep(carry[0], qt, ft, door_on, door_tgt)
            return (new_carry, ee)

        carry = ((q, qd, fq, fqd, bodies, door_q, door_qd,
                  fpos0[0], fpos0[1]),
                 jnp.zeros((3, SUB, LANE), F32))
        carry = jax.lax.fori_loop(0, n_substeps, body_fn, carry)
        (q, qd, fq, fqd, bodies, door_q, door_qd, _, _), ee = carry
        rows = [q, qd, fq, fqd]
        for b in range(B):
            rows += [bodies[b][0], bodies[b][1], bodies[b][2], bodies[b][3]]
        rows += [door_q[None], door_qd[None], ee]
        out_ref[:] = jnp.concatenate(rows)

    return kernel, N_ROWS, N_CTRL


class PallasMultiBodyEngine:
    """Batched control_step for general scenes (multi-body / chest / pinned)."""

    def __init__(self, spec: S.SceneSpec, solver_iters: int = 8,
                 erp: float = 0.2, slop: float = 5e-4, interpret=None):
        assert supports_scene(spec), \
            'scene exceeds the pallas lane budget (%d > %d)' % (
                count_lanes(spec), LANE_BUDGET)
        self.spec = spec
        self.solver_iters = solver_iters
        self.erp = erp
        self.slop = slop
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        self.interpret = interpret
        self._kernels = {}

    def _get(self, n_sub):
        if n_sub not in self._kernels:
            self._kernels[n_sub] = _build_kernel(
                self.spec, self.solver_iters, self.erp, self.slop, n_sub)
        return self._kernels[n_sub]

    def control_step(self, state: D.PhysicsState, controls: D.Controls,
                     n_sim_calls: int = D.SIM_CALLS_PER_STEP,
                     n_substeps: int = None) -> D.PhysicsState:
        n_sub = (n_substeps if n_substeps is not None
                 else n_sim_calls * D.SUBSTEPS_PER_SIM)
        N = state.q.shape[0]
        assert N % TILE == 0, 'pallas engine needs num_envs %% 1024 == 0'
        G = N // TILE
        B = self.spec.n_bodies
        kernel, n_rows, n_ctrl = self._get(n_sub)

        def pack(arrs):
            x = jnp.concatenate([r.reshape(N, -1) for r in arrs], axis=-1)
            return x.reshape(G, SUB, LANE, x.shape[-1]).transpose(3, 0, 1, 2) \
                    .reshape(-1, G * SUB, LANE)

        srows = [state.q, state.qd, state.fq, state.fqd]
        for b in range(B):
            srows += [state.body_pos[:, b], state.body_quat[:, b],
                      state.body_linvel[:, b], state.body_angvel[:, b]]
        srows += [state.door_q[:, None], state.door_qd[:, None],
                  state.ee_contact_force]
        sin = pack(srows)
        cin = pack([controls.q_target, controls.f_target,
                    controls.door_motor_on.astype(F32)[:, None],
                    controls.door_target[:, None]])

        out = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((n_rows, SUB, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_ctrl, SUB, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, SUB, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_rows, G * SUB, LANE), F32),
            # the default scoped-vmem limit is 16 MB; the largest supported
            # scenes peak slightly above it (nb=4: 16.7 MB measured)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=self.interpret,
        )(sin, cin)

        flat = out.reshape(n_rows, G, SUB, LANE).transpose(1, 2, 3, 0) \
                  .reshape(N, n_rows)
        o = 18
        bp, bq, bv, bw = [], [], [], []
        for b in range(B):
            bp.append(flat[:, o:o + 3]); bq.append(flat[:, o + 3:o + 7])
            bv.append(flat[:, o + 7:o + 10]); bw.append(flat[:, o + 10:o + 13])
            o += 13
        return D.PhysicsState(
            q=flat[:, 0:7], qd=flat[:, 7:14],
            fq=flat[:, 14:16], fqd=flat[:, 16:18],
            body_pos=jnp.stack(bp, 1), body_quat=jnp.stack(bq, 1),
            body_linvel=jnp.stack(bv, 1), body_angvel=jnp.stack(bw, 1),
            door_q=flat[:, o], door_qd=flat[:, o + 1],
            ee_contact_force=flat[:, o + 2:o + 5])
