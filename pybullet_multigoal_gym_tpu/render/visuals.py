"""Visual scene assembly: env state -> primitive soup for the ray-caster.

Replaces the Bullet visual shapes of the URDF assets with analytic
primitives. Notably, goal images (`kuka_single_step_base_env.py:150-188`,
`kuka_multi_step_base_env.py:397-446`) are produced by rendering a
*hypothetical* primitive configuration directly — no teleport/restore dance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import fk
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.render.raster import (Prims, SPHERE, BOX,
                                                      CYLINDER, CAPSULE)

F32 = jnp.float32
IDQ = np.array([1.0, 0, 0, 0], np.float32)

KUKA_ORANGE = np.array([1.0, 0.55, 0.1], np.float32)
KUKA_DARK = np.array([0.25, 0.25, 0.28], np.float32)
TABLE_COLOR = np.array([0.6, 0.55, 0.5], np.float32)
BLOCK_COLORS = {
    'blue': [0.1, 0.3, 0.9], 'green': [0.1, 0.8, 0.2],
    'purple': [0.6, 0.2, 0.8], 'red': [0.9, 0.15, 0.1],
    'yellow': [0.95, 0.85, 0.1],
}
BLOCK_ORDER = ['blue', 'green', 'purple', 'red', 'yellow']
TARGET_COLOR = np.array([0.9, 0.2, 0.2], np.float32)
CHEST_COLOR = np.array([0.45, 0.4, 0.35], np.float32)
OBJECT_COLOR = np.array([0.2, 0.5, 0.85], np.float32)


class _Builder:
    def __init__(self):
        self.kind, self.pos, self.rot, self.size, self.color, self.vis = \
            [], [], [], [], [], []

    def add(self, kind, pos, size, color, rot=None, visible=True):
        self.kind.append(jnp.asarray(kind, jnp.int32))
        self.pos.append(jnp.asarray(pos, F32))
        self.rot.append(jnp.asarray(IDQ if rot is None else rot, F32))
        s = jnp.zeros(3, F32)
        s = s.at[:jnp.asarray(size).shape[0]].set(jnp.asarray(size, F32))
        self.size.append(s)
        self.color.append(jnp.asarray(color, F32))
        self.vis.append(jnp.asarray(visible, bool))

    def build(self) -> Prims:
        return Prims(
            kind=jnp.stack(self.kind), pos=jnp.stack(self.pos),
            rot=jnp.stack(self.rot), size=jnp.stack(self.size),
            color=jnp.stack(self.color), visible=jnp.stack(self.vis))


def add_robot(b: _Builder, q, fq, finger_width_override=None):
    """Arm as capsules between joint-frame origins + gripper primitives."""
    pos, rot = fk.link_frames(q)
    frames = fk.ee_frames(q, fq)
    base = jnp.zeros(3, F32)
    pts = [base] + [pos[i] for i in range(7)] + [frames['gripper_base']]
    radii = [0.09, 0.08, 0.07, 0.07, 0.06, 0.06, 0.05, 0.04]
    for i in range(8):
        a, c = pts[i], pts[i + 1]
        mid = (a + c) / 2
        d = c - a
        ln = jnp.linalg.norm(d)
        # capsule oriented along d: rotation taking z to d
        dn = d / jnp.maximum(ln, 1e-6)
        axis = jnp.cross(jnp.array([0.0, 0, 1], F32), dn)
        s = jnp.linalg.norm(axis)
        ang = jnp.arctan2(s, dn[2])
        axis = jnp.where(s > 1e-6, axis / jnp.maximum(s, 1e-6),
                         jnp.array([1.0, 0, 0], F32))
        rq = quatm.from_axis_angle(axis, ang[None]).reshape(4)
        col = KUKA_ORANGE if i % 2 == 0 else np.array([0.9, 0.9, 0.9], np.float32)
        b.add(CAPSULE, mid, jnp.stack([jnp.asarray(radii[i], F32), ln / 2,
                                       jnp.zeros((), F32)]), col, rot=rq)
    # gripper base cylinder (URDF: r 0.05 l 0.04)
    b.add(CYLINDER, frames['gripper_base'], [0.05, 0.02, 0.0], KUKA_DARK,
          rot=rot[6])
    # fingers
    for i in range(2):
        b.add(BOX, frames['finger_pos'][i], KM.FINGER_HALF_EXTENTS,
              KUKA_DARK, rot=rot[6])


def add_scene_bodies(b: _Builder, env, body_pos, body_quat, colors=None):
    """Dynamic bodies from the engine's geom soup."""
    eng = env.engine
    for g in range(eng.ng):
        bi = int(eng.geom_body[g])
        p = body_pos[bi] + quatm.rotate(body_quat[bi],
                                        jnp.asarray(eng.geom_pos[g], F32))
        col = OBJECT_COLOR if colors is None else colors[bi]
        kind = BOX if eng.geom_type[g] == S.BOX else CYLINDER
        size = (eng.geom_half[g] if kind == BOX
                else [eng.geom_half[g][0], eng.geom_half[g][2], 0.0])
        b.add(kind, p, size, col, rot=body_quat[bi])


def add_statics(b: _Builder, env, door_q=None):
    eng = env.engine
    cfg = env.cfg
    # table / workspace plate
    if cfg.family in ('shape_assemble', 'insertion'):
        b.add(BOX, [-0.58, 0.0, 0.01], [0.25, 0.25, 0.01], TABLE_COLOR)
    elif cfg.table_type == 'long_table':
        b.add(BOX, [-0.70, 0.0, 0.08], [0.5, 0.45, 0.08], TABLE_COLOR)
    else:
        b.add(BOX, [-0.52, 0.0, 0.08], [0.25, 0.35, 0.08], TABLE_COLOR)
    # chest walls
    for s in range(len(eng.static_half)):
        b.add(BOX, eng.static_pos[s], eng.static_half[s], CHEST_COLOR)
    # chest door
    if eng.door is not None and door_q is not None:
        dpos, drot = eng.door_frame(door_q)
        for d in range(len(eng.door_geom_half)):
            p = dpos + quatm.rotate(drot, jnp.asarray(eng.door_geom_pos[d], F32))
            b.add(BOX, p, eng.door_geom_half[d], CHEST_COLOR * 0.8, rot=drot)


def build_prims(env, state, goal_config=None) -> Prims:
    """Primitive soup for one (unbatched) env state.

    goal_config: optional dict overriding poses to render a *goal* image:
      {'q': ..., 'fq': ..., 'body_pos': ..., 'body_quat': ..., 'hide_targets'}
    """
    cfg = env.cfg
    ph = state.phys
    q = ph.q
    fq = ph.fq
    body_pos, body_quat = ph.body_pos, ph.body_quat
    if goal_config is not None:
        q = goal_config.get('q', q)
        fq = goal_config.get('fq', fq)
        body_pos = goal_config.get('body_pos', body_pos)
        body_quat = goal_config.get('body_quat', body_quat)

    b = _Builder()
    add_statics(b, env, door_q=ph.door_q if cfg.has_chest else None)
    add_robot(b, q, fq)

    if cfg.family == 'multi_step':
        colors = [jnp.asarray(BLOCK_COLORS[BLOCK_ORDER[i]], F32)
                  for i in range(cfg.num_block)]
        add_scene_bodies(b, env, body_pos, body_quat, colors)
        # per-block targets (colored spheres r=0.015)
        off = 1 if cfg.has_chest else 0
        show = bool(cfg.visualize_target)
        for i in range(cfg.num_block):
            tpos = state.desired_goal[off + 3 * i: off + 3 * i + 3]
            b.add(SPHERE, tpos, [0.015, 0, 0],
                  jnp.asarray(BLOCK_COLORS[BLOCK_ORDER[i]], F32), visible=show)
        if cfg.grip_informed_goal:
            gpos = (state.desired_goal[-4:-1] if cfg.grasping
                    else state.desired_goal[-3:])
            b.add(BOX, gpos, [0.01, 0.01, 0.01], TARGET_COLOR, visible=show)
    elif cfg.family == 'single_step':
        if cfg.has_obj:
            add_scene_bodies(b, env, body_pos, body_quat,
                             [jnp.asarray(BLOCK_COLORS['red'], F32)])
        show = bool(cfg.visualize_target)
        b.add(SPHERE, state.desired_goal[:3], [0.02, 0, 0], TARGET_COLOR,
              visible=show)
    else:
        add_scene_bodies(b, env, body_pos, body_quat)
        show = bool(cfg.visualize_target)
        b.add(SPHERE, state.desired_goal[:3], [0.02, 0, 0], TARGET_COLOR,
              visible=show)
    return b.build()
