"""General multi-body Pallas physics kernel.

Extends the single-free-body kernel (ops/pallas_engine.py) to the full scene
vocabulary of the suite: N free bodies (multi-geom), static boxes, the
1-DoF chest door, the two fingers AND the arm collision-sphere chain — the
whole 100-substep control step still fused into ONE kernel over (8,128) env
tiles.

Contact manifold policy (VMEM is the binding constraint — every live lane
array costs ~4 KB per (8,128) tile regardless of batch size). All box-box
manifolds use INCIDENT-FACE corners (the 4 corners of the face toward the
opponent, contact.py:incident_face_corners) instead of all 8:
  * finger vs free geom          9 lanes (two-sided SAT + cross fallback)
  * free geom vs free geom       9 lanes
  * free geom vs static/pinned/door  5 lanes (one-sided: free-geom incident
    corners + cross fallback)
  * finger vs door               9 lanes (door-handle pushing quality)
  * finger vs static             5 lanes, finger vs plane 4
  * geom vs support plane        4 (box bottom face) / 4 (cylinder rim)
  * arm sphere vs plane/geom/static/door  1 lane each
Scenes whose lane count exceeds LANE_BUDGET fall back to the XLA engine
(vec_env checks `supports_scene`).

Semantics mirror ops/dynamics.py (velocity-level substep, same servo
constants, Baumgarte bias, mass-splitting fused Jacobi solver, friction
clamp, frozen-arm joint coupling of all gripper/arm contacts); parity is
asserted in tests/test_pallas_multibody.py.
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
    F32, LANE, SUB, TILE, _c, _cq, _cv, box_cyl_lanes, edge_lane_tiles,
    fk_chain, incident_corner_tiles, clamp_into_box_tiles, mat3vec,
    point_in_box_tiles, qmat, qmul, qnormalize, qrotate, sat_face_normal,
    vcross, vdot)

# Lane ceiling with the segment-sliced solver and the raised scoped-VMEM
# limit. v5e throughput by lane count (round-1 measurements with the 16-lane
# manifolds): <=480 lanes runs at full VMEM speed; beyond that the compiler
# spills lane arrays to HBM and throughput collapses ~100x. The incident-face
# manifolds keep every reference configuration (worst: chest nb=5, 476
# lanes incl. arm collision) under that bound.
LANE_BUDGET = 640

N_SPH = len(KM.ARM_SPHERE_RADIUS)


class _Lane(NamedTuple):
    pt: jnp.ndarray
    nrm: jnp.ndarray       # points from side B toward side A
    pen: jnp.ndarray
    active: jnp.ndarray    # f32 0/1
    mu: float
    side_a: tuple          # ('body',b) ('pinned',) ('door',) ('arm',sp) ('finger',f)
    side_b: tuple          # ('world',) ('finger',f) ('body',b) ('door',)


def _lane_link(side_a, side_b):
    """Arm-coupling mask per dynamics.Engine lane_link: joints 0..link."""
    if side_a[0] == 'arm':
        return int(KM.ARM_SPHERE_LINK[side_a[1]])
    if side_a[0] == 'finger' or side_b == ('finger', 0) or side_b == ('finger', 1):
        return 6
    if side_b[0] == 'finger':
        return 6
    return -1


def _arm_sgn(side_a, side_b):
    if side_a[0] in ('arm', 'finger'):
        return 1.0
    if side_b[0] == 'finger':
        return -1.0
    return 0.0


def _couple(side_a, side_b):
    """Arm-yield flag per dynamics.Engine lane_couple: arm spheres and
    finger-vs-world lanes let contacts decelerate the arm; finger-vs-movable
    lanes keep the arm kinematically stiff (Bullet's 200 N motor holds the
    trajectory; the frozen-arm scheme would overshoot into backward kicks)."""
    if side_a[0] == 'arm':
        return 1.0
    if side_a[0] == 'finger' and side_b == ('world',):
        return 1.0
    return 0.0


def _ee_sgn(side_a, side_b):
    """EE force-sensor contribution (dynamics._solve on_hand_a)."""
    if side_a[0] == 'finger':
        return 1.0
    if side_a[0] == 'arm' and int(KM.ARM_SPHERE_LINK[side_a[1]]) == 6:
        return 1.0
    if side_b[0] == 'finger':
        return -1.0
    return 0.0


def _two_sided(ca, Ra, ha, cb, Rb, hb, mu, side_a, side_b, edge=False):
    """9-lane two-sided SAT manifold (4+4 incident corners + cross);
    ``edge`` appends the edge-edge candidate (contact.py:box_box_edge) —
    requested for geom-geom pairs, matching the XLA engine's plan."""
    n, sat_ok, ra_n, rb_n, min_ov = sat_face_normal(ca, Ra, ha, cb, Rb, hb)
    lanes, inside_any = [], None
    for p in incident_corner_tiles(ca, Ra, ha, -n):   # A corners toward B
        pen = rb_n - vdot(n, p - cb)
        ins = point_in_box_tiles(p, cb, Rb, hb)
        inside_any = ins if inside_any is None else jnp.maximum(inside_any, ins)
        lanes.append(_Lane(p, n, pen, ins * sat_ok, mu, side_a, side_b))
    for p in incident_corner_tiles(cb, Rb, hb, n):    # B corners toward A
        pen = vdot(n, p - ca) + ra_n
        ins = point_in_box_tiles(p, ca, Ra, ha)
        inside_any = jnp.maximum(inside_any, ins)
        lanes.append(_Lane(p, n, pen, ins * sat_ok, mu, side_a, side_b))
    p_cross = 0.5 * (clamp_into_box_tiles(ca, cb, Rb, hb)
                     + clamp_into_box_tiles(cb, ca, Ra, ha))
    lanes.append(_Lane(p_cross, n, min_ov, sat_ok * (1.0 - inside_any), mu,
                       side_a, side_b))
    if edge:
        pt, ne, pe, ae = edge_lane_tiles(ca, Ra, ha, cb, Rb, hb)
        lanes.append(_Lane(pt, ne, pe, ae, mu, side_a, side_b))
    return lanes


def _one_sided(ca, Ra, ha, cb, Rb, hb, mu, side_a, side_b, edge=False):
    """5-lane manifold: A's incident corners tested inside B + cross
    fallback (A = the free, smaller geom; B = static wall / pinned / door);
    ``edge`` appends the edge-edge candidate."""
    n, sat_ok, ra_n, rb_n, min_ov = sat_face_normal(ca, Ra, ha, cb, Rb, hb)
    lanes, inside_any = [], None
    for p in incident_corner_tiles(ca, Ra, ha, -n):
        pen = rb_n - vdot(n, p - cb)
        ins = point_in_box_tiles(p, cb, Rb, hb)
        inside_any = ins if inside_any is None else jnp.maximum(inside_any, ins)
        lanes.append(_Lane(p, n, pen, ins * sat_ok, mu, side_a, side_b))
    p_cross = 0.5 * (clamp_into_box_tiles(ca, cb, Rb, hb)
                     + clamp_into_box_tiles(cb, ca, Ra, ha))
    lanes.append(_Lane(p_cross, n, min_ov, sat_ok * (1.0 - inside_any), mu,
                       side_a, side_b))
    if edge:
        pt, ne, pe, ae = edge_lane_tiles(ca, Ra, ha, cb, Rb, hb)
        lanes.append(_Lane(pt, ne, pe, ae, mu, side_a, side_b))
    return lanes


def _plane_lanes(c, R, q, geom_type, half, plane_z, mu, side_a):
    """4-lane geom vs support plane (bottom incident face / bottom rim)."""
    lanes = []
    if geom_type == S.BOX:
        pts = incident_corner_tiles(c, R, half, _cv([0.0, 0.0, -1.0]))
    else:
        pts = []
        for k in range(4):
            ang = 2.0 * np.pi * k / 4
            loc = _cv([half[0] * np.cos(ang), half[0] * np.sin(ang),
                       -half[2]])
            pts.append(c + qrotate(q, loc))
    for p in pts:
        pen = _c(plane_z) - p[2]
        lanes.append(_Lane(p, _cv([0.0, 0.0, 1.0]), pen,
                           (pen > -1e-4).astype(F32), mu, side_a, ('world',)))
    return lanes


def _sphere_plane(c, radius, plane_z, mu, side_a):
    pen = _c(plane_z + radius) - c[2]
    p = c - _cv([0.0, 0.0, 1.0]) * radius
    return [_Lane(p, _cv([0.0, 0.0, 1.0]), pen, (pen > -1e-4).astype(F32),
                  mu, side_a, ('world',))]


def _sphere_box(c, radius, cb, Rb, hb, mu, side_a, side_b):
    """Sphere (A) vs box (B): 1 lane (contact.py:sphere_box)."""
    rel = c - cb
    cl = jnp.stack([vdot(Rb[:, i], rel) for i in range(3)])
    clamped = jnp.stack([jnp.clip(cl[i], -hb[i], hb[i]) for i in range(3)])
    delta = cl - clamped
    d = jnp.sqrt(jnp.maximum(vdot(delta, delta), 1e-18))
    outside = (jnp.sum(delta * delta, 0) > 1e-18).astype(F32)
    n_out = delta / d[None]
    e = [hb[i] - jnp.abs(cl[i]) for i in range(3)]
    emin = jnp.minimum(e[0], jnp.minimum(e[1], e[2]))
    is0 = ((e[0] <= e[1]) & (e[0] <= e[2])).astype(F32)
    is1 = (1.0 - is0) * ((e[1] <= e[2]).astype(F32))
    is2 = 1.0 - is0 - is1
    sgn = [jnp.where(cl[i] >= 0, 1.0, -1.0) for i in range(3)]
    n_local = (n_out * outside[None]
               + jnp.stack([is0 * sgn[0], is1 * sgn[1], is2 * sgn[2]])
               * (1.0 - outside[None]))
    pen = (radius - d) * outside + (radius + emin) * (1.0 - outside)
    n = mat3vec(Rb, n_local)
    p = c - n * radius
    return [_Lane(p, n, pen, (pen > -1e-4).astype(F32), mu, side_a, side_b)]


def count_lanes(spec: S.SceneSpec, arm_collision: bool = True,
                ik_workspace: bool = True) -> int:
    """Host-side lane count for the budget check (must mirror the lane
    generation in _build_kernel, including the lane_cull sphere culling)."""
    from pybullet_multigoal_gym_tpu.ops import lane_cull as LC
    a = spec.np_arrays() if spec.n_bodies else None
    n = 0
    free, pinned = [], []
    for b in range(spec.n_bodies):
        (free if a['body_mass'][b] > 0 else pinned).append(b)
    geoms_of = {b: [g for g in range(len(a['geom_body']))
                    if a['geom_body'][g] == b] for b in range(spec.n_bodies)} \
        if spec.n_bodies else {}
    nd = len(np.asarray(spec.door.geom_half).reshape(-1, 3)) \
        if spec.door is not None else 0
    ns = len(spec.static_half)
    ng_all = len(a['geom_body']) if spec.n_bodies else 0
    for b in free:
        for g in geoms_of[b]:
            n += 4                                           # plane
            n += 2 * (9 if a['geom_type'][g] == S.BOX else 2)   # fingers
            n += 6 * ns                                      # statics (+edge)
            for b2 in pinned:
                n += 6 * len(geoms_of[b2])                   # (+edge)
            n += 6 * nd                                      # (+edge)
    for b2 in pinned:
        n += 2 * 9 * len(geoms_of[b2])           # finger vs pinned geoms
    for i, b in enumerate(free):
        for b2 in free[i + 1:]:
            n += 10 * len(geoms_of[b]) * len(geoms_of[b2])   # (+edge)
    n += 2 * 9 * nd                              # finger vs door
    if arm_collision:
        n += 2 * 4                               # finger vs plane
        n += 2 * 5 * ns                          # finger vs statics
        reach = LC.arm_lane_mask(spec, ik_workspace)
        for sp in range(N_SPH):
            n += int(reach['plane'][sp])
            n += sum(int(x) for x in reach['geom'][sp])
            n += sum(int(x) for x in reach['static'][sp])
            n += nd * int(reach['door'][sp])
    return n


def supports_scene(spec: S.SceneSpec, arm_collision: bool = True,
                   ik_workspace: bool = True) -> bool:
    if spec.n_bodies < 1:
        return False
    if not any(m > 0 for m in spec.np_arrays()['body_mass']):
        return False                    # all-pinned scene: no lanes to solve
    return count_lanes(spec, arm_collision, ik_workspace) <= LANE_BUDGET


def _build_kernel(spec: S.SceneSpec, solver_iters: int, erp: float,
                  slop: float, n_substeps: int, arm_collision: bool,
                  gripper: str = 'parallel_jaw', ik_workspace: bool = True):
    from pybullet_multigoal_gym_tpu.ops import lane_cull as LC
    reach = LC.arm_lane_mask(spec, ik_workspace)
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
    inv_arm = (1.0 / arm_inertia).astype(np.float32)
    sph_radii = np.asarray(KM.ARM_SPHERE_RADIUS, np.float32)

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
        """One velocity-level 2 ms substep (mirrors dynamics.Engine.substep):
        servos + gravity propose velocities, contacts at the CURRENT
        coordinates correct them (frozen-arm joint coupling), then all
        coordinates integrate together."""
        (q, qd, fq, fqd, bodies, door_q, door_qd) = carry
        # bodies: list of (bp, bq, bv, bw)

        # 1. arm servo -> proposed qd
        new_qd = []
        for j in range(7):
            err = qt[j] - q[j]
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
            err = ft[f] - fq[f]
            v_des = jnp.clip(D.ARM_SERVO_RATE * err, -finger_vlim,
                             finger_vlim)
            dv = finger_force * dt / finger_mass
            new_fqd.append(fqd[f] + jnp.clip(v_des - fqd[f], -dv, dv))
        fqd = jnp.stack(new_fqd)

        # 4. gravity on free bodies
        bodies = [(bp, bq,
                   (jnp.stack([bv[0], bv[1], bv[2] - D.GRAVITY * dt])
                    if masses[b] > 0 else bv),
                   bw)
                  for b, (bp, bq, bv, bw) in enumerate(bodies)]

        # 5. door servo / free coast (dynamics.py door block)
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

        # 6. lane generation (all at the current coordinates)
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
                                      gtype, half, spec.plane_z, mu_p,
                                      ('body', b))
                for f in range(2):
                    if gtype == S.BOX:
                        lanes += _two_sided(centers[g], R_of[b], half,
                                            fpos[f], Rb7, fhalf,
                                            float(frictions[b]),
                                            ('body', b), ('finger', f))
                    else:
                        for l in box_cyl_lanes(fpos[f], Rb7, fhalf,
                                               centers[g], half[0], half[2],
                                               float(frictions[b])):
                            lanes.append(_Lane(l.pt, l.nrm, l.pen, l.active,
                                               l.mu, ('body', b),
                                               ('finger', f)))
                for si in range(len(spec.static_half)):
                    sh = tuple(float(x) for x in a['static_half'][si])
                    sc = _cv(a['static_pos'][si])
                    sR = qmat(_cq([1.0, 0.0, 0.0, 0.0]))
                    mu_s = float(frictions[b] * a['static_friction'][si])
                    lanes += _one_sided(centers[g], R_of[b], half, sc, sR, sh,
                                        mu_s, ('body', b), ('world',),
                                        edge=True)
                for b2 in pinned:
                    for g2 in geoms_of[b2]:
                        h2 = tuple(float(x) for x in a['geom_half'][g2])
                        lanes += _one_sided(
                            centers[g], R_of[b], half, centers[g2], R_of[b2],
                            h2, float(frictions[b] * frictions[b2]),
                            ('body', b), ('world',), edge=True)
                if door is not None:
                    for dc, dR, dh in door_geom_cr:
                        lanes += _one_sided(centers[g], R_of[b], half, dc, dR,
                                            dh, float(frictions[b] * 0.5),
                                            ('body', b), ('door',),
                                            edge=True)
        # finger vs PINNED geoms (e.g. the insertion slot): feed the EE force
        # sensor and stop the fingers at slot walls. Pinned side A =
        # immovable: zero velocity, no application.
        for b2 in pinned:
            for g2 in geoms_of[b2]:
                h2 = tuple(float(x) for x in a['geom_half'][g2])
                for f in range(2):
                    lanes += _two_sided(centers[g2], R_of[b2], h2,
                                        fpos[f], Rb7, fhalf,
                                        float(frictions[b2]),
                                        ('pinned',), ('finger', f))
        for i, b in enumerate(free):
            for b2 in free[i + 1:]:
                for g in geoms_of[b]:
                    for g2 in geoms_of[b2]:
                        lanes += _two_sided(
                            centers[g], R_of[b],
                            tuple(float(x) for x in a['geom_half'][g]),
                            centers[g2], R_of[b2],
                            tuple(float(x) for x in a['geom_half'][g2]),
                            float(frictions[b] * frictions[b2]),
                            ('body', b), ('body', b2), edge=True)
        if door is not None:
            for f in range(2):
                for dc, dR, dh in door_geom_cr:
                    # door is side A, finger side B (dynamics.py plan)
                    lanes += _two_sided(dc, dR, dh, fpos[f], Rb7, fhalf,
                                        1.0, ('door',), ('finger', f))
        if arm_collision:
            for f in range(2):
                # finger pads vs plane / static walls (normal pushes finger)
                for p in incident_corner_tiles(fpos[f], Rb7,
                                               fhalf, _cv([0.0, 0.0, -1.0])):
                    pen = _c(spec.plane_z) - p[2]
                    lanes.append(_Lane(p, _cv([0.0, 0.0, 1.0]), pen,
                                       (pen > -1e-4).astype(F32),
                                       float(spec.plane_friction),
                                       ('finger', f), ('world',)))
                for si in range(len(spec.static_half)):
                    sh = tuple(float(x) for x in a['static_half'][si])
                    sc = _cv(a['static_pos'][si])
                    sR = qmat(_cq([1.0, 0.0, 0.0, 0.0]))
                    lanes += _one_sided(fpos[f], Rb7, fhalf, sc, sR, sh,
                                        float(a['static_friction'][si]),
                                        ('finger', f), ('world',))
            # statically unreachable sphere/partner pairs are culled
            # (ops/lane_cull.py workspace envelope; count_lanes mirrors this)
            for sp in range(N_SPH):
                r_s = float(sph_radii[sp])
                if reach['plane'][sp]:
                    lanes += _sphere_plane(ch['spheres'][sp], r_s,
                                           spec.plane_z,
                                           0.5 * float(spec.plane_friction),
                                           ('arm', sp))
                for b in range(B):
                    for g in geoms_of[b]:
                        if not reach['geom'][sp][g]:
                            continue
                        h_g = tuple(float(x) for x in a['geom_half'][g])
                        side_b = ('body', b) if masses[b] > 0 else ('world',)
                        lanes += _sphere_box(
                            ch['spheres'][sp], r_s, centers[g], R_of[b], h_g,
                            0.5 * float(frictions[b]), ('arm', sp), side_b)
                for si in range(len(spec.static_half)):
                    if not reach['static'][sp][si]:
                        continue
                    sh = tuple(float(x) for x in a['static_half'][si])
                    lanes += _sphere_box(
                        ch['spheres'][sp], r_s, _cv(a['static_pos'][si]),
                        qmat(_cq([1.0, 0.0, 0.0, 0.0])), sh,
                        0.5 * float(a['static_friction'][si]),
                        ('arm', sp), ('world',))
                if door is not None and reach['door'][sp]:
                    for dc, dR, dh in door_geom_cr:
                        lanes += _sphere_box(ch['spheres'][sp], r_s, dc, dR,
                                             tuple(float(x) for x in dh), 0.5,
                                             ('arm', sp), ('door',))

        # 7. segmentation: contiguous lane runs sharing (side_a, side_b, mu)
        # become SEGMENTS addressed with static slices. No per-lane constant
        # tile arrays — the masked formulation materialised O(B * L) constant
        # tiles and blew VMEM beyond ~2 free bodies.
        L = len(lanes)
        segs = []        # (start, end, side_a, side_b, mu)
        for i, l in enumerate(lanes):
            key_ = (l.side_a, l.side_b, l.mu)
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

        # per-segment arms / jacobians / frozen arm point velocities
        # (stored only where needed)
        r_a_parts, r_b_seg, djac_seg, varm_seg = [], {}, {}, {}
        seg_link = [_lane_link(sa, sb) for (_, _, sa, sb, _) in segs]
        seg_asgn = [_arm_sgn(sa, sb) for (_, _, sa, sb, _) in segs]
        seg_cpl = [_couple(sa, sb) for (_, _, sa, sb, _) in segs]
        seg_esgn = [_ee_sgn(sa, sb) for (_, _, sa, sb, _) in segs]
        for si, (s0, s1, sa, sb, _) in enumerate(segs):
            sl = slice(s0, s1)
            if sa[0] == 'body':
                r_a_parts.append(pts[sl] - bodies[sa[1]][0][None])
            else:
                r_a_parts.append(pts[sl] * 0.0)   # door/pinned/arm/finger A
                if sa == ('door',):
                    djac_seg[si] = jnp.stack(
                        [door_jac(pts[i], door_q) for i in range(s0, s1)])
            if sb[0] == 'body':
                r_b_seg[si] = pts[sl] - bodies[sb[1]][0][None]
            if sb == ('door',):
                djac_seg[si] = jnp.stack(
                    [door_jac(pts[i], door_q) for i in range(s0, s1)])
            if seg_link[si] >= 0:
                # frozen arm point velocity: v_arm(p) = sum_j<=link qd_j *
                # (z_j x (p - o_j)) — constant through the solver iterations
                v = 0.0
                for j in range(seg_link[si] + 1):
                    zb = jnp.broadcast_to(ch['z'][j][None], pts[sl].shape)
                    v = v + lcross(zb, pts[sl] - ch['o'][j][None]) \
                        * qd[j][None, None]
                varm_seg[si] = v
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
            for (s0, s1, sa, sb, _) in segs:
                if sa == ('body', b) or sb == ('body', b):
                    c = c + jnp.sum(act[s0:s1], 0)
            counts[b] = jnp.maximum(c, 1.0)
        fin_counts = []
        for f in range(2):
            c = 0.0
            for (s0, s1, sa, sb, _) in segs:
                if sb == ('finger', f) or sa == ('finger', f):
                    c = c + jnp.sum(act[s0:s1], 0)
            fin_counts.append(jnp.maximum(c, 1.0))
        if door is not None:
            c = 0.0
            for (s0, s1, sa, sb, _) in segs:
                if sa == ('door',) or sb == ('door',):
                    c = c + jnp.sum(act[s0:s1], 0)
            door_count = jnp.maximum(c, 1.0)
        arm_count = 0.0
        for si, (s0, s1, _, _, _) in enumerate(segs):
            if seg_cpl[si] > 0:
                arm_count = arm_count + jnp.sum(act[s0:s1], 0)
        if not isinstance(arm_count, float):
            arm_count = jnp.maximum(arm_count, 1.0)

        def k_of(d):
            """Effective inverse mass per lane along direction d (L,...)."""
            parts = []
            for si, (s0, s1, sa, sb, _) in enumerate(segs):
                sl = slice(s0, s1)
                ds = d[sl]
                k = 0.0
                if sa[0] == 'body':
                    rxd = lcross(r_a[sl], ds)
                    Iw = inv_I_w[sa[1]]
                    Iw_rxd = jnp.stack(
                        [sum(Iw[i][j] * rxd[:, j] for j in range(3))
                         for i in range(3)], 1)
                    k = k + (inv_mass[sa[1]] + jnp.sum(rxd * Iw_rxd, 1)) \
                        * counts[sa[1]][None]
                elif sa == ('door',):
                    dj = jnp.sum(ds * djac_seg[si], 1)
                    k = k + (dj * dj * door_inv_mass) * door_count[None]
                elif sa[0] == 'finger':
                    da = jnp.sum(ds * faxis[sa[1]][None], 1)
                    k = k + (da * da / finger_mass) * fin_counts[sa[1]][None]
                # ('pinned',)/('arm',sp) contribute nothing here (the arm
                # term is added once per lane below)
                if sb[0] == 'finger':
                    da = jnp.sum(ds * faxis[sb[1]][None], 1)
                    k = k + (da * da / finger_mass) * fin_counts[sb[1]][None]
                elif sb[0] == 'body':
                    b2 = sb[1]
                    rxd = lcross(r_b_seg[si], ds)
                    Iw = inv_I_w[b2]
                    Iw_rxd = jnp.stack(
                        [sum(Iw[i][j] * rxd[:, j] for j in range(3))
                         for i in range(3)], 1)
                    k = k + (inv_mass[b2] + jnp.sum(rxd * Iw_rxd, 1)) \
                        * counts[b2][None]
                elif sb == ('door',):
                    dj = jnp.sum(ds * djac_seg[si], 1)
                    k = k + (dj * dj * door_inv_mass) * door_count[None]
                if seg_cpl[si] > 0:
                    # arm coupling: k_arm = arm_count * sum_j (J_j.d)^2/I_j,
                    # J_j.d = z_j . ((p - o_j) x d)
                    ka = 0.0
                    for j in range(seg_link[si] + 1):
                        pd_ = lcross(pts[sl] - ch['o'][j][None], ds)
                        jd = jnp.sum(pd_ * ch['z'][j][None], 1)
                        ka = ka + jd * jd * float(inv_arm[j])
                    k = k + ka * arm_count[None]
                parts.append(k)
            return jnp.concatenate(parts)

        t1_init, t2_init = tangents()
        kn_raw = k_of(nrm)
        # degenerate lanes (direction orthogonal to every DOF) must be
        # EXCLUDED, not floored: dividing by the 1e-8 floor accumulates
        # garbage lambdas that pollute the EE force sensor
        solvable = act * (kn_raw > 1e-8).astype(F32)
        kn = jnp.maximum(kn_raw, 1e-8)
        kt1 = jnp.maximum(k_of(t1_init), 1e-8)
        kt2 = jnp.maximum(k_of(t2_init), 1e-8)
        # capped recovery velocity (dynamics._solve BIAS_CAP)
        bias = -jnp.minimum((erp / dt) * jnp.maximum(pen - slop, 0.0),
                            D.BIAS_CAP)

        def iteration(_, sc):
            vels, fqd_, door_qd_, ln, lt1, lt2 = sc
            t1, t2 = tangents()              # recomputed: not stored in carry
            vrel_parts = []
            for si, (s0, s1, sa, sb, _) in enumerate(segs):
                sl = slice(s0, s1)
                if sa[0] == 'body':
                    bv_, bw_ = vels[sa[1]]
                    va = bv_[None] + lcross(
                        jnp.broadcast_to(bw_[None], r_a[sl].shape), r_a[sl])
                elif sa == ('door',):
                    va = djac_seg[si] * door_qd_
                elif sa[0] == 'finger':
                    va = varm_seg[si] + faxis[sa[1]][None] * fqd_[sa[1]][None, None]
                elif sa[0] == 'arm':
                    va = varm_seg[si]
                else:                    # ('pinned',): immovable
                    va = 0.0
                if sb == ('world',):
                    vb = 0.0
                elif sb[0] == 'finger':
                    f = sb[1]
                    vb = varm_seg[si] + faxis[f][None] * fqd_[f][None, None]
                elif sb[0] == 'body':
                    bv2, bw2 = vels[sb[1]]
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
            for si, (s0, s1, sa, sb, _) in enumerate(segs):
                sl = slice(s0, s1)
                imp_s = imp[sl]
                if sa[0] == 'body':
                    dv[sa[1]] = dv[sa[1]] + jnp.sum(imp_s, 0)
                    dw[sa[1]] = dw[sa[1]] + jnp.sum(lcross(r_a[sl], imp_s), 0)
                elif sa == ('door',):
                    ddoor = ddoor + jnp.sum(
                        jnp.sum(imp_s * djac_seg[si], 1), 0)
                elif sa[0] == 'finger':
                    dfq[sa[1]] = dfq[sa[1]] + jnp.sum(
                        jnp.sum(imp_s * faxis[sa[1]][None], 1), 0)
                # ('pinned',)/('arm',sp): no in-loop application (frozen arm)
                if sb[0] == 'finger':
                    dfq[sb[1]] = dfq[sb[1]] - jnp.sum(
                        jnp.sum(imp_s * faxis[sb[1]][None], 1), 0)
                elif sb[0] == 'body':
                    b2 = sb[1]
                    dv[b2] = dv[b2] - jnp.sum(imp_s, 0)
                    dw[b2] = dw[b2] - jnp.sum(lcross(r_b_seg[si], imp_s), 0)
                elif sb == ('door',):
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
            fqd_ = jnp.stack([fqd_[0] + dfq[0] / finger_mass,
                              fqd_[1] + dfq[1] / finger_mass])
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

        # arm coupling: accumulated impulses -> joint velocities, applied
        # once after the loop (frozen-arm scheme, dynamics._solve). Every
        # arm-velocity segment contributes (qd-couple, dynamics
        # lane_qd_couple) — including finger-vs-movable lanes, so the arm
        # stalls against trapped objects instead of grinding through them.
        dqd = [0.0] * 7
        for si, (s0, s1, sa, sb, _) in enumerate(segs):
            if seg_asgn[si] == 0.0:
                continue
            sl = slice(s0, s1)
            imp_s = tot_imp[sl] * seg_asgn[si]
            for j in range(seg_link[si] + 1):
                pd_ = lcross(pts[sl] - ch['o'][j][None], imp_s)
                dqd[j] = dqd[j] + jnp.sum(
                    jnp.sum(pd_ * ch['z'][j][None], 1), 0)
        # capped at the motor's per-substep authority (see dynamics._solve)
        qd = jnp.stack([
            qd[j] + (jnp.clip(dqd[j] * float(inv_arm[j]),
                              -float(KM.ARM_PD_FORCE * dt * inv_arm[j]),
                              float(KM.ARM_PD_FORCE * dt * inv_arm[j]))
                     if not isinstance(dqd[j], float) else 0.0)
            for j in range(7)])

        # EE force sensor: impulse onto the gripper (fingers + palm spheres)
        ee_force = 0.0
        for si, (s0, s1, _, _, _) in enumerate(segs):
            if seg_esgn[si] != 0.0:
                ee_force = ee_force + seg_esgn[si] * jnp.sum(
                    tot_imp[s0:s1], 0)
        ee_force = (ee_force / dt if not isinstance(ee_force, float)
                    else jnp.zeros((3, SUB, LANE), F32))

        # 8. integrate everything with the corrected velocities; joints at a
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
        fq = jnp.clip(fq + fqd_ * dt, fq_lo, fq_hi)
        fqd_ = jnp.where((fq >= fq_hi) & (fqd_ > 0), 0.0,
                         jnp.where((fq <= fq_lo) & (fqd_ < 0), 0.0, fqd_))
        if door is not None:
            door_q = jnp.clip(door_q + door_qd * dt, 0.0, float(door.limit))
            door_qd = jnp.where((door_q >= float(door.limit))
                                & (door_qd > 0), 0.0,
                                jnp.where((door_q <= 0.0) & (door_qd < 0),
                                          0.0, door_qd))

        return ((q, qd, fq, fqd_, new_bodies, door_q, door_qd), ee_force)

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

        def body_fn(i, carry):
            new_carry, ee = substep(carry[0], qt, ft, door_on, door_tgt)
            return (new_carry, ee)

        carry = ((q, qd, fq, fqd, bodies, door_q, door_qd),
                 jnp.zeros((3, SUB, LANE), F32))
        carry = jax.lax.fori_loop(0, n_substeps, body_fn, carry)
        (q, qd, fq, fqd, bodies, door_q, door_qd), ee = carry
        rows = [q, qd, fq, fqd]
        for b in range(B):
            rows += [bodies[b][0], bodies[b][1], bodies[b][2], bodies[b][3]]
        rows += [door_q[None], door_qd[None], ee]
        out_ref[:] = jnp.concatenate(rows)

    return kernel, N_ROWS, N_CTRL


class PallasMultiBodyEngine:
    """Batched control_step for general scenes (multi-body / chest / pinned)."""

    def __init__(self, spec: S.SceneSpec, solver_iters: int = 8,
                 erp: float = 0.2, slop: float = 5e-4, interpret=None,
                 arm_collision: bool = True, gripper: str = 'parallel_jaw',
                 ik_workspace: bool = True):
        assert supports_scene(spec, arm_collision, ik_workspace), \
            'scene exceeds the pallas lane budget (%d > %d)' % (
                count_lanes(spec, arm_collision, ik_workspace), LANE_BUDGET)
        self.spec = spec
        self.solver_iters = solver_iters
        self.erp = erp
        self.slop = slop
        self.arm_collision = arm_collision
        self.gripper = gripper
        self.ik_workspace = ik_workspace
        if interpret is None:
            interpret = jax.default_backend() != 'tpu'
        self.interpret = interpret
        self._kernels = {}

    def _get(self, n_sub):
        if n_sub not in self._kernels:
            self._kernels[n_sub] = _build_kernel(
                self.spec, self.solver_iters, self.erp, self.slop, n_sub,
                self.arm_collision, self.gripper, self.ik_workspace)
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
            # scenes peak slightly above it
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
