"""Full-env cross-engine replay: the Kuka arm + block in MuJoCo.

tests/test_crossengine.py validates component mechanics (drop/slide/grasp/
tower) on matched single-body scenes; this file closes the env-level gate
from BASELINE.md ("trajectory/return parity under fixed seeds, within
contact-solver tolerance"): the SAME 7-DoF Kuka chain — built in MuJoCo from
the same compiled model constants (model/kuka_model.py, i.e. the numbers of
`/root/reference/pybullet_multigoal_gym/assets/robots/kuka/
iiwa14_parallel_jaw.urdf`) — driven by IDENTICAL action sequences through
both full stacks:

* FK parity: MuJoCo's forward kinematics of the chain vs ops/fk.py at
  random joint configurations (catches any frame-convention drift).
* Push replay: a scripted joint-space action sequence through the public
  `make_env(task='push', joint_control=True)` surface and through a MuJoCo
  scene with the same table plane + block, asserting bounded tip-trajectory
  divergence, comparable block displacement, and equal binary success
  against a common goal region.

Both engines get the same servo semantics (velocity toward target at
ARM_SERVO_RATE, force-capped — Bullet POSITION_CONTROL, kuka.py:282-301):
MuJoCo via per-substep velocity targets with forcerange +-200/+-50.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk, ik

mujoco = pytest.importorskip('mujoco')

DT = D.DT_SUB


def _chain_xml(block_pos=None, plane_z=0.16, plane_friction=0.1,
               weld_fingers=False):
    """MuJoCo model of the iiwa14 + parallel jaw from the compiled constants.

    Arm link geoms are non-colliding (contype 0) — like the engine, only the
    finger pads contact the world in the push scenario. Finger/block/plane
    frictions follow Bullet's multiplicative pair semantics (see
    test_crossengine.py): plane and block carry the 0.1 product, the pads 1.0.

    weld_fingers pins the pads at the closed position (no slide joints): the
    push replay never actuates the fingers, and a hand-built MuJoCo finger
    servo chatters against contacts (clamped actuator forces defeat the
    implicit velocity feedback), hammering the block with energy neither
    Bullet nor the engine produce. Finger-DoF contact parity is covered by
    test_crossengine.py::test_two_finger_grasp_holds_matches_mujoco.
    """
    jnt = []
    for i in range(7):
        x, y, z = KM.JOINT_ORIGIN_XYZ[i]
        r, p, w = KM.JOINT_ORIGIN_RPY[i]
        lo, hi = KM.JOINT_LIMIT_LOWER[i], KM.JOINT_LIMIT_UPPER[i]
        # damping = force-cap / velocity-limit: when the +-200 N*m actuator
        # saturates (which defeats the implicit velocity feedback), the
        # joint speed tops out at ARM_VEL_LIMIT — the same bound the
        # engine's servo enforces (ops/dynamics.py:substep)
        damp = KM.ARM_PD_FORCE / D.ARM_VEL_LIMIT
        jnt.append(
            f'<body name="link{i + 1}" pos="{x} {y} {z}" euler="{r} {p} {w}">'
            f'<joint name="j{i + 1}" type="hinge" axis="0 0 1" '
            f'range="{lo} {hi}" damping="{damp}"/>'
            f'<geom type="sphere" size="0.06" mass="{KM.LINK_MASS[i + 1]}" '
            f'contype="0" conaffinity="0"/>')
    gb = KM.GRIPPER_BASE_OFFSET
    tip = KM.TIP_OFFSET
    fh = KM.FINGER_HALF_EXTENTS
    fingers = []
    for f in range(2):
        org = np.asarray(KM.FINGER_ORIGIN[f])
        if weld_fingers:
            org = org + np.asarray(KM.FINGER_AXIS[f]) * KM.FINGER_LIMIT
            joint = ''
        else:
            ax, ay, az = KM.FINGER_AXIS[f]
            # range widened past the URDF 0..0.035: the env commands the
            # closed target EXACTLY at the limit, and a MuJoCo limit
            # constraint fighting the +-50 N velocity servo rings the wrist;
            # the engine (like Bullet) just saturates fq at the stop
            joint = (f'<joint name="f{f + 1}" type="slide" '
                     f'axis="{ax} {ay} {az}" '
                     f'range="-0.005 {KM.FINGER_LIMIT + 0.005}" '
                     f'damping="{KM.FINGER_PD_FORCE / D.FINGER_VEL_LIMIT}"/>')
        fingers.append(
            f'<body name="finger{f + 1}" pos="{org[0]} {org[1]} {org[2]}">'
            + joint +
            f'<geom name="pad{f + 1}" type="box" '
            f'size="{fh[0]} {fh[1]} {fh[2]}" mass="{KM.FINGER_MASS}"/>'
            f'</body>')
    hand = (
        f'<site name="tip" pos="{tip[0]} {tip[1]} {tip[2]}" size="0.005"/>'
        f'<body name="gripper_base" pos="{gb[0]} {gb[1]} {gb[2]}">'
        f'<geom type="sphere" size="0.02" mass="{KM.GRIPPER_BASE_MASS}" '
        f'contype="0" conaffinity="0"/>'
        + ''.join(fingers) + '</body>')
    world = []
    contact = ''
    if block_pos is not None:
        bh = 0.015
        world.append(
            f'<body name="block" pos="{block_pos[0]} {block_pos[1]} '
            f'{block_pos[2]}"><freejoint/>'
            f'<geom name="block_g" type="box" size="{bh} {bh} {bh}" '
            f'mass="2.0"/></body>')
        world.append(
            f'<geom name="plane" type="plane" size="5 5 0.1" '
            f'pos="0 0 {plane_z}"/>')
        # explicit pairs carrying Bullet's MULTIPLICATIVE pair frictions
        # (block 1.0, plane 0.1, pad 1.0 -> products 0.1 / 0.1 / 1.0);
        # MuJoCo's default element-wise-max combine would give the pads
        # mu=1.0 on the table, which stick-slips the servo-stiff wrist
        pf = plane_friction
        contact = ('<contact>'
                   f'<pair geom1="block_g" geom2="plane" '
                   f'friction="{pf} {pf} 0.005 0.0001 0.0001"/>'
                   f'<pair geom1="pad1" geom2="plane" '
                   f'friction="{pf} {pf} 0.005 0.0001 0.0001"/>'
                   f'<pair geom1="pad2" geom2="plane" '
                   f'friction="{pf} {pf} 0.005 0.0001 0.0001"/>'
                   '<pair geom1="pad1" geom2="block_g" '
                   'friction="1.0 1.0 0.005 0.0001 0.0001"/>'
                   '<pair geom1="pad2" geom2="block_g" '
                   'friction="1.0 1.0 0.005 0.0001 0.0001"/>'
                   # closed pads touch face-to-face at y=0; the engine has no
                   # finger-finger lane, and letting MuJoCo fight the finger
                   # servos through it pumps energy into the wrist
                   '<exclude body1="finger1" body2="finger2"/>'
                   '</contact>')
    # critically-damped position actuators: with 0.2 s of settling per
    # control step and <=0.05 rad target moves, any stable stiff servo
    # converges to the target within the step, so per-step poses match the
    # engine's rate-limited Bullet servo; velocity actuators chatter when
    # the force clamp defeats the implicit feedback
    acts = ''.join(
        f'<position joint="j{i + 1}" kp="2000" dampratio="1" '
        f'forcerange="-{KM.ARM_PD_FORCE} {KM.ARM_PD_FORCE}"/>'
        for i in range(7))
    if not weld_fingers:
        acts += ''.join(
            f'<position joint="f{f + 1}" kp="20000" dampratio="1" '
            f'forcerange="-{KM.FINGER_PD_FORCE} {KM.FINGER_PD_FORCE}"/>'
            for f in range(2))
    xml = (f'<mujoco><compiler angle="radian" eulerseq="XYZ"/>'
           f'<option timestep="{DT}" gravity="0 0 -{D.GRAVITY}" '
           f'integrator="implicitfast"/>'
           f'<worldbody>{"".join(world)}<body name="base" pos="0 0 0">'
           + ''.join(jnt) + hand
           + '</body>' * 7 + '</body></worldbody>'
           f'{contact}<actuator>{acts}</actuator></mujoco>')
    return mujoco.MjModel.from_xml_string(xml)


def test_fk_parity_with_mujoco():
    """ops/fk.py matches MuJoCo's FK of the same chain at random configs."""
    m = _chain_xml()
    d = mujoco.MjData(m)
    sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, 'tip')
    rng = np.random.default_rng(0)
    for _ in range(8):
        q = rng.uniform(0.6 * KM.JOINT_LIMIT_LOWER, 0.6 * KM.JOINT_LIMIT_UPPER)
        d.qpos[:7] = q
        d.qpos[7:9] = 0.0
        mujoco.mj_forward(m, d)
        tip_mj = d.site_xpos[sid].copy()
        tip_jx, _ = fk.tip_pose(jnp.asarray(q, jnp.float32))
        np.testing.assert_allclose(np.asarray(tip_jx), tip_mj, atol=2e-4)


def test_push_replay_matches_mujoco():
    """Identical joint-space action sequences through make_env(push) and the
    MuJoCo scene: bounded tip divergence, comparable block displacement, and
    equal binary success against a shared goal region."""
    import pybullet_multigoal_gym_tpu as pmg

    env = pmg.make_env(task='push', joint_control=True,
                       max_episode_steps=60, seed=3)
    obs = env.reset()
    q0 = np.asarray(obs['observation'][:7], np.float64)
    block0 = np.asarray(obs['achieved_goal'], np.float64)
    tip0 = np.asarray(fk.tip_pose(jnp.asarray(q0, jnp.float32))[0])

    # scripted EE waypoint path: hover behind the block, descend, push 10 cm
    # through it along the (block - tip) line; converted once to a shared
    # joint-target trajectory via the engine's IK
    push_dir = block0[:2] - tip0[:2]
    push_dir = push_dir / np.linalg.norm(push_dir)
    # tip z=0.176: pad bottoms ride 1 mm above the table (at 0.175 they
    # graze the plane and MuJoCo's stiff unilateral contact stick-slips the
    # wrist) and the pad face covers the block's full height, so the push
    # force passes through the block centre — pushing higher (e.g. 0.180)
    # pitches the block and MuJoCo wedge-crushes it between pad bottom and
    # plane, squirting it out at m/s neither Bullet nor the engine produce
    z_push = 0.176
    behind = block0[:2] - push_dir * 0.055
    ee_path = []
    for s in np.linspace(0.0, 1.0, 8):        # approach, descending
        xy = tip0[:2] + (behind - tip0[:2]) * s
        z = tip0[2] + (z_push - tip0[2]) * s
        ee_path.append([xy[0], xy[1], z])
    for s in np.linspace(0.0, 1.0, 22)[1:]:   # push stroke
        xy = behind + push_dir * 0.10 * s
        ee_path.append([xy[0], xy[1], z_push])
    q_traj = [q0]
    qc = jnp.asarray(q0, jnp.float32)
    for tgt in ee_path:
        qc = ik.solve(jnp.asarray(tgt, jnp.float32), q_init=qc,
                      rest_pose=jnp.asarray(q0, jnp.float32))
        q_traj.append(np.asarray(qc, np.float64))
    # joint-space actions: joint_target += a * 0.05 (kuka.py:204-206)
    actions = [np.clip((q_traj[t + 1] - q_traj[t]) / 0.05, -1, 1)
               for t in range(len(q_traj) - 1)]

    # --- our stack, through the public adapter
    tips_jx = []
    for a in actions:
        obs, _, _, _ = env.step(np.asarray(a, np.float32))
        tips_jx.append(np.asarray(
            fk.tip_pose(jnp.asarray(obs['observation'][:7]))[0]))
    block_jx = np.asarray(obs['achieved_goal'], np.float64)

    # --- MuJoCo, same servo + same integrated target trajectory (pads
    # welded at the closed position the env holds throughout)
    m = _chain_xml(block_pos=block0, weld_fingers=True)
    d = mujoco.MjData(m)
    d.qpos[7:14] = q0             # block freejoint is qpos[0:7]
    mujoco.mj_forward(m, d)
    sid = mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_SITE, 'tip')
    q_target = q0.copy()
    tips_mj = []
    for a in actions:
        q_target = q_target + a * 0.05
        d.ctrl[:7] = q_target
        for _ in range(D.SIM_CALLS_PER_STEP * D.SUBSTEPS_PER_SIM):
            mujoco.mj_step(m, d)
        tips_mj.append(d.site_xpos[sid].copy())
    block_mj = d.qpos[:3].copy()

    # tip trajectories track the same waypoints in both stacks
    tip_div = np.max(np.linalg.norm(np.asarray(tips_jx) - np.asarray(tips_mj),
                                    axis=-1))
    assert tip_div < 0.05, tip_div
    # both pushed the block a comparable distance along the same line
    d_jx = np.linalg.norm(block_jx[:2] - block0[:2])
    d_mj = np.linalg.norm(block_mj[:2] - block0[:2])
    assert d_jx > 0.05, d_jx
    assert d_mj > 0.05, d_mj
    assert np.linalg.norm(block_jx[:2] - block_mj[:2]) < 0.06, \
        (block_jx, block_mj)
    # equal binary success vs the common commanded end point
    goal = np.array([*(behind + push_dir * 0.13), 0.175])
    ok_jx = np.linalg.norm(block_jx - goal) < 0.05
    ok_mj = np.linalg.norm(block_mj - goal) < 0.05
    assert ok_jx == ok_mj, (block_jx, block_mj, goal)
