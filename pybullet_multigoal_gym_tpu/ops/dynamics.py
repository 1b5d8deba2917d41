"""TPU-native rigid-body dynamics for the multigoal manipulation suite.

Replaces Bullet's ``stepSimulation`` + PD motors + sequential-impulse solver
(`/root/reference/pybullet_multigoal_gym/robots/kuka.py:223-225,282-301`,
`envs/base_envs/base_env.py:215-219`) with a pure-functional engine:

* **Arm**: decoupled joint servos reproducing Bullet POSITION_CONTROL
  semantics (v* = gain/dt * error, impulse capped at force*dt / I_eff) —
  AND a 7-DoF contact entity: collision impulses on the arm's sphere chain,
  the finger pads and the palm couple back into the joint velocities through
  per-contact point Jacobians with the effective joint inertias, so the table,
  blocks and chest physically stop the arm (the reference collides the whole
  arm via Bullet, `robots/robot_bases.py:62-84`).
* **Fingers**: 1-DoF prismatic states with PD drive; finger contacts couple
  both along the finger axis AND into the arm joints — grip force saturates
  at the PD force cap, which is what makes friction grasps behave like
  Bullet's.
* **Free bodies**: maximal-coordinate 6-DoF integration, semi-implicit Euler.
* **Contacts**: fixed-topology analytic colliders (ops/contact.py) solved with
  mass-splitting Jacobi iterations (Baumgarte stabilisation, friction-cone
  clamp) — fully vectorised over the contact lanes, vmappable over envs.
* **Chest door**: articulated 1-DoF entity, free (motor disabled,
  `robot_bases.py:230-238`) until the env's hold-open logic drives it
  (`kuka_multi_step_base_env.py:297-298`).

One control step = ``n_substeps`` scanned substeps of ``dt`` seconds
(reference: 5 stepSimulation x 20 numSubSteps x 0.002 s = 100 substeps).
Each substep is velocity-level: servos and gravity update velocities, the
contact solve corrects them, then ALL coordinates (q, fq, body poses, door)
integrate with the corrected velocities.
"""

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import contact as C
from pybullet_multigoal_gym_tpu.ops import fk
from pybullet_multigoal_gym_tpu.ops import scene as S

GRAVITY = 9.81
DT_SUB = 0.002                  # base_env.py:74 timestep=0.002
SUBSTEPS_PER_SIM = 20           # frame_skip / numSubSteps (base_env.py:217-219)
SIM_CALLS_PER_STEP = 5          # kuka.py:223-225
ARM_SERVO_RATE = KM.ARM_PD_POSITION_GAIN / DT_SUB     # 15 s^-1
FINGER_VEL_LIMIT = 0.2          # URDF finger joint <limit velocity>
ARM_VEL_LIMIT = 10.0
BIAS_CAP = 0.15                 # max penetration-recovery velocity (m/s):
# deep overlaps (a pad sweeping THROUGH a pushed object, spawn
# penetrations) recover at 0.3 mm per substep instead of ejecting bodies
# ballistically — a 0.5 cap watermelon-seeded the heavy shape-assemble
# objects whenever the slow push built a few mm of face penetration

# entity type codes for contact sides
T_BODY, T_FINGER, T_DOOR, T_WORLD, T_ARM = 0, 1, 2, 3, 4

N_ARM_SPHERES = len(KM.ARM_SPHERE_RADIUS)


class PhysicsState(NamedTuple):
    """Dynamic state of one environment instance (unbatched)."""
    q: jnp.ndarray            # (7,) arm joint positions
    qd: jnp.ndarray           # (7,)
    fq: jnp.ndarray           # (2,) finger prismatic positions
    fqd: jnp.ndarray          # (2,)
    body_pos: jnp.ndarray     # (NBp,3)
    body_quat: jnp.ndarray    # (NBp,4) wxyz
    body_linvel: jnp.ndarray  # (NBp,3)
    body_angvel: jnp.ndarray  # (NBp,3)
    door_q: jnp.ndarray       # ()
    door_qd: jnp.ndarray      # ()
    ee_contact_force: jnp.ndarray  # (3,) world-frame contact force on gripper


class Controls(NamedTuple):
    q_target: jnp.ndarray        # (7,)
    f_target: jnp.ndarray        # (2,) finger joint targets (signed, see mimic)
    door_motor_on: jnp.ndarray   # () bool
    door_target: jnp.ndarray     # ()


def _with_edge(fn, ca, qa, ha, cb, qb, hb):
    """box_box manifold + the appended edge-edge candidate (10 lanes)."""
    o = fn(ca, qa, ha, cb, qb, hb)
    oe = C.box_box_edge(ca, qa, ha, cb, qb, hb)
    return tuple(jnp.concatenate([a, b], axis=-2 if a.ndim >= 2 else -1)
                 for a, b in zip(o, oe))


def arm_sphere_positions(link_pos, link_rot, dtype=jnp.float32):
    """World centres of the arm collision spheres (KM.ARM_SPHERE_*)."""
    li = KM.ARM_SPHERE_LINK
    off = jnp.asarray(KM.ARM_SPHERE_OFFSET, dtype)
    return link_pos[..., li, :] + quatm.rotate(link_rot[..., li, :], off)


class Engine:
    """Compiled physics for one SceneSpec. All spec data are trace constants."""

    def __init__(self, spec: S.SceneSpec, solver_iters: int = 8,
                 erp: float = 0.2, slop: float = 5e-4,
                 arm_collision: bool = True, gripper: str = 'parallel_jaw',
                 ik_workspace: bool = True):
        # solver_iters: Bullet runs 5 Gauss-Seidel iterations
        # (base_env.py:216); this mass-splitting Jacobi solver converges a
        # little slower per iteration, 8 keeps grasp/tower parity with margin
        # (validated in tests/test_physics.py).
        self.spec = spec
        self.solver_iters = solver_iters
        self.erp = erp
        self.slop = slop
        self.arm_collision = arm_collision
        # ik_workspace: the arm only tracks IK targets inside the EE
        # workspace box, which lets _build_contact_plan drop statically
        # unreachable arm-sphere lanes (ops/lane_cull.py). Joint-space
        # control can reach any configuration: pass False to keep them all.
        self.ik_workspace = ik_workspace
        self.nb = max(spec.n_bodies, 1)
        a = spec.np_arrays() if spec.n_bodies > 0 else None

        # padded body arrays
        mass = np.ones((self.nb,), np.float32)
        fric = np.ones((self.nb,), np.float32)
        if spec.n_bodies:
            mass[:spec.n_bodies] = a['body_mass']
            fric[:spec.n_bodies] = a['body_friction']
        self.body_mass = mass
        self.body_inv_mass = np.where(mass > 0, 1.0 / np.maximum(mass, 1e-6), 0.0)
        self.body_friction = fric

        # geoms
        if spec.n_bodies:
            self.geom_body = a['geom_body']
            self.geom_type = a['geom_type']
            self.geom_half = a['geom_half']
            self.geom_pos = a['geom_pos']
        else:
            self.geom_body = np.zeros((0,), np.int32)
            self.geom_type = np.zeros((0,), np.int32)
            self.geom_half = np.zeros((0, 3), np.float32)
            self.geom_pos = np.zeros((0, 3), np.float32)
        self.ng = len(self.geom_body)

        # per-body inertia (use first geom of the body as the inertia shape)
        inertia = np.ones((self.nb, 3), np.float32) * 1e-3
        for g in range(self.ng):
            b = self.geom_body[g]
            if (self.geom_pos[g] == 0).all():
                inertia[b] = S.body_inertia_diag(
                    max(self.body_mass[b], 1e-6), self.geom_half[g],
                    self.geom_type[g])
        self.body_inv_inertia = np.where(
            self.body_inv_mass[:, None] > 0, 1.0 / inertia, 0.0).astype(np.float32)

        # statics
        if spec.ns_static:
            self.static_half = a['static_half']
            self.static_pos = a['static_pos']
            self.static_fric = a['static_friction']
        else:
            self.static_half = np.zeros((0, 3), np.float32)
            self.static_pos = np.zeros((0, 3), np.float32)
            self.static_fric = np.zeros((0,), np.float32)

        self.door = spec.door
        self.chest_base = np.asarray(spec.chest_base, np.float32)
        if self.door is not None:
            self.door_anchor = self.chest_base + np.asarray(self.door.anchor, np.float32)
            self.door_axis = np.asarray(self.door.axis, np.float32)
            self.door_geom_half = np.asarray(self.door.geom_half, np.float32).reshape(-1, 3)
            self.door_geom_pos = np.asarray(self.door.geom_pos, np.float32).reshape(-1, 3)
            self.door_inv_mass = 1.0 / max(self.door.mass, 0.25)
        # gripper model: prismatic jaw pads, or the Robotiq-85 mimic linkage
        # (pads on parallelogram four-bars; fq = closure angle). Both reduce
        # to "box pad + uniform velocity direction per unit fqd", so only the
        # constants and the pad FK differ (KM.robotiq_pad_kinematics).
        self.gripper = gripper
        if gripper == 'robotiq85':
            self.finger_mass = KM.ROBOTIQ_FINGER_INERTIA   # kg m^2 (about theta)
            self.finger_force = KM.ROBOTIQ_PD_FORCE        # N m
            self.finger_vel_limit = KM.ROBOTIQ_VEL_LIMIT   # rad/s
            self.finger_half = np.asarray(KM.ROBOTIQ_PAD_HALF, np.float32)
            self.fq_lo, self.fq_hi = 0.0, KM.ROBOTIQ_JOINT_LIMIT
        else:
            self.finger_mass = KM.FINGER_MASS * KM.FINGER_INERTIA_SCALING
            self.finger_force = KM.FINGER_PD_FORCE
            self.finger_vel_limit = FINGER_VEL_LIMIT
            self.finger_half = np.asarray(KM.FINGER_HALF_EXTENTS, np.float32)
            self.fq_lo, self.fq_hi = -KM.FINGER_LIMIT, KM.FINGER_LIMIT
        self.arm_inv_inertia = (1.0 / np.asarray(KM.ARM_EFFECTIVE_INERTIA)
                                ).astype(np.float32)

        self._build_contact_plan()

    # ------------------------------------------------------------------ plan
    def _build_contact_plan(self):
        """Precompute the static contact topology: for each contact lane, the
        generator module it comes from and the two entity descriptors.

        Entity side conventions: colliders return normals pushing side A away
        from side B, so A must be the entity the normal accelerates (+n)."""
        plan = []   # list of dicts per module; lanes concatenated at runtime
        BB = 9      # box_box manifold size (2x4 incident-face corners
                    # + 1 cross-piercing fallback, contact.py:box_box)
        BBE = BB + 1    # + edge-edge candidate (contact.py:box_box_edge)
        OS = 5      # one-sided manifold (contact.py:box_box_one_sided):
                    # free geom vs static wall / door panel / pinned body —
                    # the SAME manifold the multibody kernel uses for those
                    # pairs, so both engines solve identical lane sets
        OSE = OS + 1    # one-sided + edge candidate

        # geom vs support plane (pinned bodies never move: no lanes)
        for g in range(self.ng):
            if self.body_inv_mass[self.geom_body[g]] == 0:
                continue
            n_pts = 4   # 4 bottom-face corners (box) / 4 rim points (cyl)
            plan.append(dict(kind='plane', geom=g, n=n_pts,
                             ent_a=(T_BODY, self.geom_body[g]),
                             ent_b=(T_WORLD, 0),
                             friction=self.body_friction[self.geom_body[g]]
                             * self.spec.plane_friction))
        # geom vs geom (different bodies); when one body is PINNED (mass 0,
        # e.g. the insertion slot) the pair uses the one-sided manifold with
        # the FREE geom as side A, matching the kernel's free-vs-pinned path
        for i in range(self.ng):
            for j in range(i + 1, self.ng):
                bi, bj = self.geom_body[i], self.geom_body[j]
                if bi == bj:
                    continue
                if self.body_inv_mass[bi] == 0 and self.body_inv_mass[bj] == 0:
                    continue
                fr = self.body_friction[bi] * self.body_friction[bj]
                if self.body_inv_mass[bj] == 0:
                    plan.append(dict(kind='geom_pinned', geom=i, geom2=j,
                                     n=OSE, ent_a=(T_BODY, bi),
                                     ent_b=(T_BODY, bj), friction=fr))
                elif self.body_inv_mass[bi] == 0:
                    plan.append(dict(kind='geom_pinned', geom=j, geom2=i,
                                     n=OSE, ent_a=(T_BODY, bj),
                                     ent_b=(T_BODY, bi), friction=fr))
                else:
                    plan.append(dict(kind='geom_geom', geom=i, geom2=j, n=BBE,
                                     ent_a=(T_BODY, bi), ent_b=(T_BODY, bj),
                                     friction=fr))
        # finger vs geom
        for f in range(2):
            for g in range(self.ng):
                n_pts = BB if self.geom_type[g] == S.BOX else 2
                plan.append(dict(kind='finger_geom', finger=f, geom=g, n=n_pts,
                                 ent_a=(T_BODY, self.geom_body[g]),
                                 ent_b=(T_FINGER, f),
                                 friction=self.body_friction[self.geom_body[g]] * 1.0))
        # geom vs static boxes
        for g in range(self.ng):
            for s in range(len(self.static_half)):
                plan.append(dict(kind='geom_static', geom=g, static=s, n=OSE,
                                 ent_a=(T_BODY, self.geom_body[g]),
                                 ent_b=(T_WORLD, 0),
                                 friction=self.body_friction[self.geom_body[g]]
                                 * self.static_fric[s]))
        if self.door is not None:
            # geom vs door
            for g in range(self.ng):
                for d in range(len(self.door_geom_half)):
                    plan.append(dict(kind='geom_door', geom=g, dgeom=d, n=OSE,
                                     ent_a=(T_BODY, self.geom_body[g]),
                                     ent_b=(T_DOOR, 0),
                                     friction=self.body_friction[self.geom_body[g]] * 0.5))
            # finger vs door (normal pushes the door: door is side A)
            for f in range(2):
                for d in range(len(self.door_geom_half)):
                    plan.append(dict(kind='finger_door', finger=f, dgeom=d, n=BB,
                                     ent_a=(T_DOOR, 0), ent_b=(T_FINGER, f),
                                     friction=1.0))
        if self.arm_collision:
            # finger pads vs table plane / static walls (normal pushes finger)
            for f in range(2):
                plan.append(dict(kind='finger_plane', finger=f, n=4,
                                 ent_a=(T_FINGER, f), ent_b=(T_WORLD, 0),
                                 friction=1.0 * self.spec.plane_friction))
                for s in range(len(self.static_half)):
                    plan.append(dict(kind='finger_static', finger=f, static=s,
                                     n=OS, ent_a=(T_FINGER, f),
                                     ent_b=(T_WORLD, 0),
                                     friction=1.0 * self.static_fric[s]))
            # arm sphere chain vs plane / geoms / statics / door — lanes a
            # sphere can never reach (workspace envelope, ops/lane_cull.py)
            # are culled at build time
            from pybullet_multigoal_gym_tpu.ops import lane_cull as LC
            reach = LC.arm_lane_mask(self.spec, self.ik_workspace)
            for sp in range(N_ARM_SPHERES):
                if reach['plane'][sp]:
                    plan.append(dict(kind='arm_plane', sphere=sp, n=1,
                                     ent_a=(T_ARM, sp), ent_b=(T_WORLD, 0),
                                     friction=0.5 * self.spec.plane_friction))
                for g in range(self.ng):
                    if not reach['geom'][sp][g]:
                        continue
                    arm_fr = 0.5 * self.body_friction[self.geom_body[g]]
                    plan.append(dict(kind='arm_geom', sphere=sp, geom=g, n=1,
                                     ent_a=(T_ARM, sp),
                                     ent_b=(T_BODY, self.geom_body[g]),
                                     friction=arm_fr))
                for s in range(len(self.static_half)):
                    if not reach['static'][sp][s]:
                        continue
                    plan.append(dict(kind='arm_static', sphere=sp, static=s,
                                     n=1, ent_a=(T_ARM, sp), ent_b=(T_WORLD, 0),
                                     friction=0.5 * self.static_fric[s]))
                if self.door is not None and reach['door'][sp]:
                    for d in range(len(self.door_geom_half)):
                        plan.append(dict(kind='arm_door', sphere=sp, dgeom=d,
                                         n=1, ent_a=(T_ARM, sp),
                                         ent_b=(T_DOOR, 0), friction=0.5))
        self.plan = plan
        self.n_contacts = sum(p['n'] for p in plan)
        # flattened per-lane entity descriptors
        ta, ia, tb, ib, fr, ll, cp, qc = [], [], [], [], [], [], [], []
        for p in plan:
            ta += [p['ent_a'][0]] * p['n']
            ia += [p['ent_a'][1]] * p['n']
            tb += [p['ent_b'][0]] * p['n']
            ib += [p['ent_b'][1]] * p['n']
            fr += [p['friction']] * p['n']
            # arm parent joint for Jacobian masking: sphere lanes couple
            # joints 1..link+1; finger/palm lanes ride on link 7 (all joints)
            if p['ent_a'][0] == T_ARM:
                link = KM.ARM_SPHERE_LINK[p['ent_a'][1]]
            elif T_FINGER in (p['ent_a'][0], p['ent_b'][0]):
                link = 6
            else:
                link = -1
            ll += [link] * p['n']
            # compliance back-coupling into the arm joints, two flags:
            #
            # k-couple (lane_couple): the arm YIELDS in-solve (k_arm term).
            # ON for arm-sphere lanes and finger-vs-world lanes (the table
            # must be able to STOP the arm); OFF for finger-vs-movable lanes
            # (finger_geom / finger_door): there the finger stays laterally
            # kinematic during the solve — Bullet's 200 N motor constraints
            # hold the arm trajectory against a 2 kg block, and in-solve
            # yielding overshoots into backward arm kicks (seen as the slide
            # puck launched off the table).
            #
            # qd-couple (lane_qd_couple): the lane's ACCUMULATED impulse is
            # applied to the joint velocities after the loop (capped at the
            # motor's per-substep authority). ON for every arm-velocity lane
            # INCLUDING finger-vs-movable: without it the arm never feels an
            # object it pushes, so a block trapped against a wall/door gets
            # ground THROUGH the obstacle by the relentless servo instead of
            # stalling at force balance (seen as the chest_push block
            # launched to 10 m/s by the door sweep it was pushed into).
            couple = (p['ent_a'][0] == T_ARM
                      or p['kind'] in ('finger_plane', 'finger_static'))
            cp += [1.0 if couple else 0.0] * p['n']
            qd_couple = couple or T_FINGER in (p['ent_a'][0], p['ent_b'][0])
            qc += [1.0 if qd_couple else 0.0] * p['n']
        z = max(self.n_contacts, 1)
        self.lane_type_a = np.zeros((z,), np.int32)
        self.lane_idx_a = np.zeros((z,), np.int32)
        self.lane_type_b = np.full((z,), T_WORLD, np.int32)
        self.lane_idx_b = np.zeros((z,), np.int32)
        self.lane_friction = np.zeros((z,), np.float32)
        self.lane_link = np.full((z,), -1, np.int32)
        self.lane_couple = np.zeros((z,), np.float32)
        self.lane_qd_couple = np.zeros((z,), np.float32)
        if self.n_contacts:
            self.lane_type_a[:] = ta
            self.lane_idx_a[:] = ia
            self.lane_type_b[:] = tb
            self.lane_idx_b[:] = ib
            self.lane_friction[:] = fr
            self.lane_link[:] = ll
            self.lane_couple[:] = cp
            self.lane_qd_couple[:] = qc
        # does any lane touch the arm entity (spheres or fingers)?
        self.has_arm_lanes = bool(np.any(self.lane_link >= 0))

    # ------------------------------------------------------------ door frame
    def door_frame(self, door_q):
        """World pose of the door joint frame for a given joint value."""
        if self.door.kind == S.DOOR_PRISMATIC:
            pos = jnp.asarray(self.door_anchor) + jnp.asarray(self.door_axis) * door_q
            rot = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        else:
            rot = quatm.from_axis_angle(jnp.asarray(self.door_axis),
                                        door_q[None] if door_q.ndim == 0 else door_q)
            rot = rot.reshape(4)
            pos = jnp.asarray(self.door_anchor)
        return pos, rot

    def door_point_jac(self, points, door_q):
        """Velocity of a door surface point per unit door_qd: (...,3)."""
        axis = jnp.asarray(self.door_axis)
        if self.door.kind == S.DOOR_PRISMATIC:
            return jnp.broadcast_to(axis, points.shape)
        anchor = jnp.asarray(self.door_anchor)
        return jnp.cross(jnp.broadcast_to(axis, points.shape), points - anchor)

    # -------------------------------------------------------------- contacts
    def _gen_contacts(self, body_pos, body_quat, finger_pos, finger_rot,
                      door_q, sphere_pos):
        """Generate all contact lanes. Returns (pts, nrm, pen, active) with
        leading dim n_contacts."""
        if self.n_contacts == 0:
            z = jnp.zeros((1, 3), jnp.float32)
            return z, z, jnp.zeros((1,), jnp.float32), jnp.zeros((1,), bool)
        geom_c = body_pos[self.geom_body] + quatm.rotate(
            body_quat[self.geom_body], jnp.asarray(self.geom_pos))
        geom_q = body_quat[self.geom_body]
        fhalf = jnp.asarray(self.finger_half, jnp.float32)
        radii = KM.ARM_SPHERE_RADIUS
        id_q = jnp.array([1.0, 0, 0, 0], jnp.float32)
        if self.door is not None:
            dpos, drot = self.door_frame(door_q)
            dgeom_c = dpos + quatm.rotate(drot, jnp.asarray(self.door_geom_pos))
            dgeom_q = jnp.broadcast_to(drot, (len(self.door_geom_half), 4))
        pts, nrm, pen, act = [], [], [], []
        for p in self.plan:
            k = p['kind']
            if k == 'plane':
                g = p['geom']
                if self.geom_type[g] == S.BOX:
                    o = C.box_plane(geom_c[g], geom_q[g],
                                    jnp.asarray(self.geom_half[g]), self.spec.plane_z)
                else:
                    o = C.cylinder_plane(geom_c[g], geom_q[g],
                                         float(self.geom_half[g][0]),
                                         float(self.geom_half[g][2]),
                                         self.spec.plane_z)
            elif k == 'geom_geom':
                i, j = p['geom'], p['geom2']
                o = _with_edge(C.box_box, geom_c[i], geom_q[i],
                               jnp.asarray(self.geom_half[i]),
                               geom_c[j], geom_q[j],
                               jnp.asarray(self.geom_half[j]))
            elif k == 'geom_pinned':
                i, j = p['geom'], p['geom2']     # i = free geom (side A)
                o = _with_edge(C.box_box_one_sided, geom_c[i], geom_q[i],
                               jnp.asarray(self.geom_half[i]),
                               geom_c[j], geom_q[j],
                               jnp.asarray(self.geom_half[j]))
            elif k == 'finger_geom':
                f, g = p['finger'], p['geom']
                if self.geom_type[g] == S.BOX:
                    o = C.box_box(geom_c[g], geom_q[g], jnp.asarray(self.geom_half[g]),
                                  finger_pos[f], finger_rot[f], fhalf)
                else:
                    o = C.box_cylinder_upright(
                        finger_pos[f], finger_rot[f], fhalf,
                        geom_c[g], float(self.geom_half[g][0]),
                        float(self.geom_half[g][2]))
            elif k == 'geom_static':
                g, s = p['geom'], p['static']
                o = _with_edge(C.box_box_one_sided, geom_c[g], geom_q[g],
                               jnp.asarray(self.geom_half[g]),
                               jnp.asarray(self.static_pos[s]), id_q,
                               jnp.asarray(self.static_half[s]))
            elif k == 'geom_door':
                g, d = p['geom'], p['dgeom']
                o = _with_edge(C.box_box_one_sided, geom_c[g], geom_q[g],
                               jnp.asarray(self.geom_half[g]),
                               dgeom_c[d], dgeom_q[d],
                               jnp.asarray(self.door_geom_half[d]))
            elif k == 'finger_door':
                f, d = p['finger'], p['dgeom']
                o = C.box_box(dgeom_c[d], dgeom_q[d],
                              jnp.asarray(self.door_geom_half[d]),
                              finger_pos[f], finger_rot[f], fhalf)
            elif k == 'finger_plane':
                f = p['finger']
                o = C.box_plane(finger_pos[f], finger_rot[f], fhalf,
                                self.spec.plane_z)
            elif k == 'finger_static':
                f, s = p['finger'], p['static']
                o = C.box_box_one_sided(finger_pos[f], finger_rot[f], fhalf,
                                        jnp.asarray(self.static_pos[s]),
                                        id_q,
                                        jnp.asarray(self.static_half[s]))
            elif k == 'arm_plane':
                sp = p['sphere']
                o = C.sphere_plane(sphere_pos[sp], float(radii[sp]),
                                   self.spec.plane_z)
            elif k == 'arm_geom':
                sp, g = p['sphere'], p['geom']
                o = C.sphere_box(sphere_pos[sp], float(radii[sp]),
                                 geom_c[g], geom_q[g],
                                 jnp.asarray(self.geom_half[g]))
            elif k == 'arm_static':
                sp, s = p['sphere'], p['static']
                o = C.sphere_box(sphere_pos[sp], float(radii[sp]),
                                 jnp.asarray(self.static_pos[s]), id_q,
                                 jnp.asarray(self.static_half[s]))
            elif k == 'arm_door':
                sp, d = p['sphere'], p['dgeom']
                o = C.sphere_box(sphere_pos[sp], float(radii[sp]),
                                 dgeom_c[d], dgeom_q[d],
                                 jnp.asarray(self.door_geom_half[d]))
            else:
                raise ValueError(k)
            pts.append(o[0].reshape(-1, 3))
            nrm.append(o[1].reshape(-1, 3))
            pen.append(o[2].reshape(-1))
            act.append(o[3].reshape(-1))
        return (jnp.concatenate(pts), jnp.concatenate(nrm),
                jnp.concatenate(pen), jnp.concatenate(act))

    # ---------------------------------------------------------------- solver
    def _solve(self, state, pts, nrm, pen, active, finger_axis_w,
               door_q, link_pos, link_z):
        """Mass-splitting Jacobi contact solve. Velocity-level: takes the
        post-servo velocities in ``state`` and returns corrected
        (v_lin, v_ang, fqd, door_qd, qd) plus the total impulse applied onto
        the gripper (fingers + palm/link-7 spheres) for the EE force sensor.

        The arm is a 7-DoF entity: a contact at point p on a part attached to
        joint frame L couples joints 1..L+1 through the point Jacobian
        J_i(p) = z_i x (p - o_i), with per-joint effective inertias
        KM.ARM_EFFECTIVE_INERTIA (the same decoupled-inertia model the servo
        uses). Finger lanes couple the finger axis AND the arm.

        Arm-coupling scheme (chosen for an identical, VMEM-cheap Pallas
        port): the arm's effective inverse mass along each contact direction
        is EXACT and enters k, and the arm's point velocity enters the
        relative velocity as a constant offset — but the arm velocity is
        FROZEN during the solver iterations; the total contact impulse is
        applied to qd once after the loop. Within-substep the arm does not
        yield; across the 100 x 2 ms substeps the coupling is two-way."""
        nc = pts.shape[0]
        dt32 = jnp.float32
        type_a = jnp.asarray(self.lane_type_a)
        idx_a = jnp.asarray(self.lane_idx_a)
        type_b = jnp.asarray(self.lane_type_b)
        idx_b = jnp.asarray(self.lane_idx_b)
        mu = jnp.asarray(self.lane_friction)
        lane_link = jnp.asarray(self.lane_link)

        inv_mass = jnp.asarray(self.body_inv_mass)
        # world-frame inverse inertia per body
        R = quatm.to_matrix(state.body_quat)
        inv_I_w = jnp.einsum('bij,bj,bkj->bik', R,
                             jnp.asarray(self.body_inv_inertia), R)
        com = state.body_pos

        r_a = pts - com[idx_a]           # valid when type_a == T_BODY
        r_b = pts - com[idx_b]

        # tangent basis
        t1 = jnp.cross(nrm, jnp.where(
            jnp.abs(nrm[:, 2:3]) < 0.9,
            jnp.array([0.0, 0.0, 1.0], dt32), jnp.array([1.0, 0.0, 0.0], dt32)))
        t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
        t2 = jnp.cross(nrm, t1)

        door_jac = (self.door_point_jac(pts, door_q) if self.door is not None
                    else jnp.zeros_like(pts))

        # arm point Jacobians: (nc, 7, 3), masked to joints <= lane_link
        if self.has_arm_lanes:
            jmask = (jnp.arange(7)[None, :] <= lane_link[:, None]).astype(dt32)
            arm_jac = jnp.cross(link_z[None, :, :],
                                pts[:, None, :] - link_pos[None, :, :])
            arm_jac = arm_jac * jmask[:, :, None]
            inv_I_arm = jnp.asarray(self.arm_inv_inertia)
        else:
            arm_jac = None

        activef = active.astype(dt32)

        # number of active contacts per entity (mass splitting)
        def _count(etype, eidx, code, n):
            return jax.ops.segment_sum(
                activef * (etype == code), eidx, num_segments=n)
        nb_counts = (_count(type_a, idx_a, T_BODY, self.nb)
                     + _count(type_b, idx_b, T_BODY, self.nb))
        fin_counts = (_count(type_a, idx_a, T_FINGER, 2)
                      + _count(type_b, idx_b, T_FINGER, 2))
        door_count = jnp.sum(activef * ((type_a == T_DOOR) | (type_b == T_DOOR)))
        couple = jnp.asarray(self.lane_couple)
        arm_count = jnp.sum(activef * couple)
        nb_counts = jnp.maximum(nb_counts, 1.0)
        fin_counts = jnp.maximum(fin_counts, 1.0)
        door_count = jnp.maximum(door_count, 1.0)
        arm_count = jnp.maximum(arm_count, 1.0)

        def k_arm(d):
            """Arm-coupling effective inverse mass along d — only lanes with
            lane_couple=1 let the arm yield (arm spheres + finger-vs-world);
            finger-vs-movable lanes keep an infinitely stiff arm."""
            if arm_jac is None:
                return 0.0
            jd = jnp.einsum('cji,ci->cj', arm_jac, d)      # (nc,7)
            return (jnp.einsum('cj,j->c', jd * jd, inv_I_arm)
                    * couple * arm_count)

        def k_dir(d, etype, eidx, r):
            """Split-mass effective inverse mass of one side along direction d."""
            # body term
            rxd = jnp.cross(r, d)
            k_body = inv_mass[eidx] + jnp.einsum(
                'ci,cij,cj->c', rxd, inv_I_w[eidx], rxd)
            k_body = k_body * nb_counts[eidx]
            # finger term (axis only; the arm part is added once per lane)
            ax = finger_axis_w[jnp.clip(eidx, 0, 1)]
            k_fin = (jnp.einsum('ci,ci->c', d, ax) ** 2 / self.finger_mass
                     ) * fin_counts[jnp.clip(eidx, 0, 1)]
            # door term
            if self.door is not None:
                k_door = (jnp.einsum('ci,ci->c', d, door_jac) ** 2
                          * self.door_inv_mass) * door_count
            else:
                k_door = jnp.zeros_like(k_body)
            return jnp.where(etype == T_BODY, k_body,
                             jnp.where(etype == T_FINGER, k_fin,
                                       jnp.where(etype == T_DOOR, k_door, 0.0)))

        kn = k_dir(nrm, type_a, idx_a, r_a) + k_dir(nrm, type_b, idx_b, r_b) \
            + k_arm(nrm)
        kt1 = k_dir(t1, type_a, idx_a, r_a) + k_dir(t1, type_b, idx_b, r_b) \
            + k_arm(t1)
        kt2 = k_dir(t2, type_a, idx_a, r_a) + k_dir(t2, type_b, idx_b, r_b) \
            + k_arm(t2)
        solvable = active & (kn > 1e-8)
        kn = jnp.maximum(kn, 1e-8)
        kt1 = jnp.maximum(kt1, 1e-8)
        kt2 = jnp.maximum(kt2, 1e-8)

        # Baumgarte bias with a capped recovery velocity: the raw erp/dt gain
        # is 100/s, so a deep overlap (e.g. 5 mm at spawn or after a fast
        # sweep) would eject bodies at metres per second with kN force
        # spikes. Bullet avoids this with split-impulse position correction;
        # the cap is the cheap equivalent (still recovers 1 mm per substep).
        bias = -jnp.minimum(
            (self.erp / DT_SUB) * jnp.maximum(pen - self.slop, 0.0),
            BIAS_CAP)

        # sign of the arm-side coupling per lane: +1 when the arm part is
        # entity A (normal accelerates it), -1 when entity B
        arm_sgn = jnp.where((type_a == T_ARM) | (type_a == T_FINGER), 1.0,
                            jnp.where((type_b == T_FINGER), -1.0, 0.0))

        # frozen arm point velocity (per-lane world vector, constant through
        # the iteration loop): v_arm(p) = J(p) qd at the pre-solve qd
        if arm_jac is not None:
            v_arm_const = jnp.einsum('cji,j->ci', arm_jac, state.qd)
        else:
            v_arm_const = jnp.zeros_like(pts)


        def point_vel(etype, eidx, r, v_lin, v_ang, fqd, door_qd):
            v_body = v_lin[eidx] + jnp.cross(v_ang[eidx], r)
            fi = jnp.clip(eidx, 0, 1)
            v_fin = v_arm_const + finger_axis_w[fi] * fqd[fi][:, None]
            v_door = door_jac * door_qd
            return jnp.where((etype == T_BODY)[:, None], v_body,
                             jnp.where((etype == T_FINGER)[:, None], v_fin,
                                       jnp.where((etype == T_DOOR)[:, None],
                                                 v_door,
                                                 jnp.where((etype == T_ARM)[:, None],
                                                           v_arm_const, 0.0))))

        def apply_impulse(imp, etype, eidx, r, sgn, carry):
            v_lin, v_ang, fqd, door_qd = carry
            imp = imp * sgn
            is_body = (etype == T_BODY).astype(dt32)[:, None]
            dv = jax.ops.segment_sum(imp * is_body * inv_mass[eidx][:, None],
                                     eidx, num_segments=self.nb)
            ang_imp = jnp.cross(r, imp) * is_body
            dw = jax.ops.segment_sum(
                jnp.einsum('cij,cj->ci', inv_I_w[eidx], ang_imp),
                eidx, num_segments=self.nb)
            is_fin = (etype == T_FINGER).astype(dt32)
            fi = jnp.clip(eidx, 0, 1)
            dfqd = jax.ops.segment_sum(
                is_fin * jnp.einsum('ci,ci->c', imp, finger_axis_w[fi])
                / self.finger_mass, fi, num_segments=2)
            is_door = (etype == T_DOOR).astype(dt32)
            if self.door is not None:
                ddoor = jnp.sum(is_door * jnp.einsum('ci,ci->c', imp, door_jac)
                                * self.door_inv_mass)
            else:
                ddoor = 0.0
            return (v_lin + dv, v_ang + dw, fqd + dfqd, door_qd + ddoor)

        def iteration(_, carry):
            """Fused Jacobi iteration: one relative-velocity read, the normal
            and both friction increments computed from it, ONE combined
            impulse applied per side. 2.5x cheaper per iteration than the
            sequential normal-then-friction variant (the solver loop is the
            dispatch-bound hot path)."""
            v_lin, v_ang, fqd, door_qd, lam_n, lam_t1, lam_t2 = carry
            va = point_vel(type_a, idx_a, r_a, v_lin, v_ang, fqd, door_qd)
            vb = point_vel(type_b, idx_b, r_b, v_lin, v_ang, fqd, door_qd)
            # pure-arm lanes have the arm only on side A (T_ARM); finger lanes
            # carry the arm part inside their T_FINGER point_vel already
            vrel = va - vb
            vn = jnp.einsum('ci,ci->c', vrel, nrm)
            dln = jnp.where(solvable, -(vn + bias) / kn, 0.0)
            new_ln = jnp.maximum(lam_n + dln, 0.0)
            dln = new_ln - lam_n
            lam_n = new_ln
            lim = mu * lam_n
            vt1 = jnp.einsum('ci,ci->c', vrel, t1)
            dlt1 = jnp.where(solvable, -vt1 / kt1, 0.0)
            new_lt1 = jnp.clip(lam_t1 + dlt1, -lim, lim)
            dlt1 = new_lt1 - lam_t1
            lam_t1 = new_lt1
            vt2 = jnp.einsum('ci,ci->c', vrel, t2)
            dlt2 = jnp.where(solvable, -vt2 / kt2, 0.0)
            new_lt2 = jnp.clip(lam_t2 + dlt2, -lim, lim)
            dlt2 = new_lt2 - lam_t2
            lam_t2 = new_lt2
            imp = (nrm * dln[:, None] + t1 * dlt1[:, None]
                   + t2 * dlt2[:, None])
            st = (v_lin, v_ang, fqd, door_qd)
            st = apply_impulse(imp, type_a, idx_a, r_a, 1.0, st)
            st = apply_impulse(imp, type_b, idx_b, r_b, -1.0, st)
            v_lin, v_ang, fqd, door_qd = st
            return (v_lin, v_ang, fqd, door_qd, lam_n, lam_t1, lam_t2)

        zeros_c = jnp.zeros((nc,), dt32)
        carry = (state.body_linvel, state.body_angvel, state.fqd,
                 state.door_qd, zeros_c, zeros_c, zeros_c)
        carry = jax.lax.fori_loop(0, self.solver_iters, iteration, carry)
        v_lin, v_ang, fqd, door_qd, lam_n, lam_t1, lam_t2 = carry

        # total world impulse per lane
        total_imp = nrm * lam_n[:, None] + t1 * lam_t1[:, None] + t2 * lam_t2[:, None]

        # arm coupling: apply the accumulated impulses to the joint
        # velocities once (frozen-arm scheme, see docstring). Every
        # arm-velocity lane contributes (lane_qd_couple), including the
        # finger-vs-movable lanes that stay stiff in-solve — this is what
        # makes the arm STALL against a trapped object instead of grinding
        # it through obstacles.
        if arm_jac is not None:
            qd_cpl = jnp.asarray(self.lane_qd_couple)
            jd = jnp.einsum('cji,ci->cj', arm_jac,
                            total_imp * (arm_sgn * qd_cpl)[:, None])  # (nc,7)
            # contact-induced joint velocity change is capped at the motor's
            # own per-substep authority (force*dt/I): the servo can always
            # counteract it, so deep spawn penetrations (e.g. the on-table
            # start pose buries the finger boxes in the tabletop) cannot
            # pump unbounded energy through the frozen-arm coupling
            dv_cap = KM.ARM_PD_FORCE * DT_SUB * inv_I_arm
            qd = state.qd + jnp.clip(jnp.sum(jd, axis=0) * inv_I_arm,
                                     -dv_cap, dv_cap)
        else:
            qd = state.qd

        # total impulse applied *onto the gripper* (fingers + palm/link-7
        # spheres), for the EE force-torque sensor (kuka.py:250-254)
        on_hand_a = ((type_a == T_FINGER)
                     | ((type_a == T_ARM) & (lane_link == 6)))
        sgn_fin = jnp.where(type_b == T_FINGER, -1.0,
                            jnp.where(on_hand_a, 1.0, 0.0))
        fin_imp = jnp.sum(total_imp * sgn_fin[:, None], axis=0)
        return v_lin, v_ang, fqd, door_qd, qd, fin_imp

    # ---------------------------------------------------------------- substep
    def substep(self, state: PhysicsState, controls: Controls):
        """One 2 ms velocity-level substep: servos + gravity propose
        velocities, contacts (generated at the CURRENT coordinates) correct
        them, then all coordinates integrate together."""
        dt = DT_SUB
        # 1. arm servo (Bullet POSITION_CONTROL: velocity toward target,
        # impulse capped by force * dt / I_eff)
        q_err = controls.q_target - state.q
        v_des = jnp.clip(ARM_SERVO_RATE * q_err, -ARM_VEL_LIMIT, ARM_VEL_LIMIT)
        dv_max = KM.ARM_PD_FORCE * dt / jnp.asarray(KM.ARM_EFFECTIVE_INERTIA,
                                                    jnp.float32)
        qd = state.qd + jnp.clip(v_des - state.qd, -dv_max, dv_max)

        # 2. FK at the current configuration
        link_pos, link_rot = fk.link_frames(state.q)
        p7, r7 = link_pos[6], link_rot[6]
        dtp = state.q.dtype
        gbase = p7 + quatm.rotate(r7, jnp.asarray(KM.GRIPPER_BASE_OFFSET, dtp))
        finger_rot = jnp.broadcast_to(r7, (2, 4))
        if self.gripper == 'robotiq85':
            padk = KM.robotiq_pad_kinematics(state.fq, xp=jnp)
            finger_pos = p7[None] + quatm.rotate(r7[None], padk['center'])
            finger_axis_w = quatm.rotate(finger_rot, padk['vel'])
        else:
            floc = (jnp.asarray(KM.FINGER_ORIGIN, dtp)
                    + jnp.asarray(KM.FINGER_AXIS, dtp) * state.fq[:, None])
            finger_pos = gbase[None] + quatm.rotate(r7[None], floc)
            finger_axis_w = quatm.rotate(finger_rot,
                                         jnp.asarray(KM.FINGER_AXIS, jnp.float32))
        link_z = quatm.rotate(link_rot, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dtp), (7, 3)))
        sphere_pos = (arm_sphere_positions(link_pos, link_rot, dtp)
                      if self.arm_collision else None)

        # 3. finger servo (PD toward the mimic-multiplied grip target)
        f_err = controls.f_target - state.fq
        fv_des = jnp.clip(ARM_SERVO_RATE * f_err, -self.finger_vel_limit,
                          self.finger_vel_limit)
        fdv_max = self.finger_force * dt / self.finger_mass
        fqd = state.fqd + jnp.clip(fv_des - state.fqd, -fdv_max, fdv_max)

        # 4. free bodies: gravity
        g = jnp.array([0.0, 0.0, -GRAVITY], jnp.float32)
        grav_on = (jnp.asarray(self.body_inv_mass) > 0).astype(jnp.float32)
        v_lin = state.body_linvel + g * dt * grav_on[:, None]
        v_ang = state.body_angvel

        # 5. door servo (only when the hold-open logic enables the motor)
        if self.door is not None:
            d_err = controls.door_target - state.door_q
            dv_des = jnp.clip(ARM_SERVO_RATE * d_err, -1.0, 1.0)
            ddv_max = 500.0 * dt * self.door_inv_mass
            door_qd_driven = state.door_qd + jnp.clip(
                dv_des - state.door_qd, -ddv_max, ddv_max)
            # free door: light viscous damping so it doesn't coast forever
            door_qd_free = state.door_qd * (1.0 - 2.0 * dt)
            door_qd = jnp.where(controls.door_motor_on, door_qd_driven,
                                door_qd_free)
        else:
            door_qd = state.door_qd

        pre = state._replace(body_linvel=v_lin, body_angvel=v_ang, fqd=fqd,
                             qd=qd, door_qd=door_qd)

        # 6. contacts + solve
        pts, nrm, pen, active = self._gen_contacts(
            state.body_pos, state.body_quat, finger_pos, finger_rot,
            state.door_q, sphere_pos)
        if self.n_contacts:
            v_lin, v_ang, fqd, door_qd, qd, fin_imp = self._solve(
                pre, pts, nrm, pen, active, finger_axis_w,
                state.door_q, link_pos, link_z)
            ee_force = fin_imp / dt
        else:
            # derive from state (not a fresh constant) so the leaf keeps its
            # device-varying type under shard_map
            ee_force = state.ee_contact_force * 0.0

        # 7. integrate everything with the corrected velocities. Joints that
        # hit a hard stop LOSE the velocity component into the stop: the
        # position clip alone leaves a phantom joint velocity that the
        # contact solver reads as real surface speed — a finger pinned at
        # its limit by a contact "vibrated" at 0.28 m/s and velocity-matched
        # a pushed object to it (11 kN force spikes, objects ballistically
        # ejected by a 0.125 m/s sweep).
        jlo = jnp.asarray(KM.JOINT_LIMIT_LOWER, jnp.float32)
        jhi = jnp.asarray(KM.JOINT_LIMIT_UPPER, jnp.float32)
        q = jnp.clip(state.q + qd * dt, jlo, jhi)
        qd = jnp.where((q >= jhi) & (qd > 0), 0.0,
                       jnp.where((q <= jlo) & (qd < 0), 0.0, qd))
        body_pos = state.body_pos + v_lin * dt
        body_quat = quatm.integrate_angvel(state.body_quat, v_ang, dt)
        fq = jnp.clip(state.fq + fqd * dt, self.fq_lo, self.fq_hi)
        fqd = jnp.where((fq >= self.fq_hi) & (fqd > 0), 0.0,
                        jnp.where((fq <= self.fq_lo) & (fqd < 0), 0.0, fqd))
        if self.door is not None:
            door_q = jnp.clip(state.door_q + door_qd * dt, 0.0, self.door.limit)
            door_qd = jnp.where((door_q >= self.door.limit) & (door_qd > 0),
                                0.0,
                                jnp.where((door_q <= 0.0) & (door_qd < 0),
                                          0.0, door_qd))
        else:
            door_q = state.door_q

        return PhysicsState(
            q=q, qd=qd, fq=fq, fqd=fqd,
            body_pos=body_pos, body_quat=body_quat,
            body_linvel=v_lin, body_angvel=v_ang,
            door_q=door_q, door_qd=door_qd,
            ee_contact_force=ee_force)

    def control_step(self, state: PhysicsState, controls: Controls,
                     n_sim_calls: int = SIM_CALLS_PER_STEP) -> PhysicsState:
        """One env-level action: n_sim_calls x 20 substeps (kuka.py:223-225).

        The scan is unrolled so XLA fuses several substeps into one kernel
        dispatch group — the step is dispatch-bound, not FLOP-bound."""
        n = n_sim_calls * SUBSTEPS_PER_SIM

        def body(s, _):
            return self.substep(s, controls), None

        state, _ = jax.lax.scan(body, state, None, length=n, unroll=5)
        return state

    # ------------------------------------------------------------------ init
    def init_state(self, q=None, body_pos=None, body_quat=None,
                   fq=KM.FINGER_LIMIT, door_q=0.0) -> PhysicsState:
        if q is None:
            q = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
        if body_pos is None:
            body_pos = jnp.zeros((self.nb, 3), jnp.float32)
        if body_quat is None:
            body_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                                 (self.nb, 1))
        return PhysicsState(
            q=jnp.asarray(q, jnp.float32),
            qd=jnp.zeros(7, jnp.float32),
            fq=jnp.full((2,), fq, jnp.float32),
            fqd=jnp.zeros(2, jnp.float32),
            body_pos=jnp.asarray(body_pos, jnp.float32),
            body_quat=jnp.asarray(body_quat, jnp.float32),
            body_linvel=jnp.zeros((self.nb, 3), jnp.float32),
            body_angvel=jnp.zeros((self.nb, 3), jnp.float32),
            door_q=jnp.asarray(door_q, jnp.float32),
            door_qd=jnp.zeros((), jnp.float32),
            ee_contact_force=jnp.zeros(3, jnp.float32))
