"""Robotiq-85 mimic-linkage gripper: kinematics, observations, dynamics and
kernel parity.

The reference simulates the 6-joint underactuated linkage with mimic
multipliers (kuka.py:54-65, iiwa14_robotiq85.urdf:394-641); the TPU engine
models it exactly as what the URDF geometry reduces to — each finger a
parallelogram four-bar whose PAD keeps a constant orientation and moves on a
circle around the inner-knuckle pivot (model/kuka_model.py:
robotiq_pad_kinematics). These tests pin the linkage numbers to the URDF
chain and prove grasp dynamics + pallas parity with the linkage enabled.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pybullet_multigoal_gym_tpu as pmg  # noqa: F401 (precision config)
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk
from pybullet_multigoal_gym_tpu.ops import scene as S

ON_TPU = jax.default_backend() == 'tpu'


# --------------------------------------------------------- URDF chain oracle
def _urdf_pad_tab(theta, finger):
    """Straight-line FK through the URDF joint chain (gripper-base frame):
    inner_knuckle joint (mimic +theta) -> finger_tip joint (mimic -theta)
    -> finger_tab fixed joint. finger=0 is the +y (flipped-frame) finger."""

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0.0],
                         [np.sin(a), np.cos(a), 0.0], [0.0, 0.0, 1.0]])

    flip = np.diag([1.0, -1.0, -1.0])        # rpy (pi, 0, 0)
    o_inner = np.array([0.06142, 0.0127, 0.0])
    t_tip = np.array([0.04303959807, -0.03759940821, 0.0])
    t_tab = np.array([0.05, 0.0075, 0.0])
    R0 = flip if finger == 0 else np.eye(3)
    # base <- inner knuckle frame: origin o (mirrored for finger 0), then
    # rotation theta about the (possibly flipped) z
    o = R0 @ (o_inner * np.array([1.0, 1.0, 1.0]))
    o = np.array([0.06142, 0.0127 if finger == 0 else -0.0127, 0.0])
    R_inner = R0 @ rz(theta)
    p_tip = o + R_inner @ t_tip
    R_tip = R_inner @ rz(-theta)
    return p_tip + R_tip @ t_tab


@pytest.mark.parametrize('theta', [0.0, 0.2, 0.545, 0.804])
def test_pad_kinematics_matches_urdf_chain(theta):
    k = KM.robotiq_pad_kinematics(np.array([theta, theta]))
    for f in range(2):
        tab_b = _urdf_pad_tab(theta, f)      # gripper-base frame (x,y,z)
        # map base frame -> link7 frame: (x_B, y_B, z_B) -> (-z_B, y_B, x_B),
        # plus the base offset (0, 0, 0.045)
        expect = np.array([-tab_b[2], tab_b[1], tab_b[0] + 0.045])
        np.testing.assert_allclose(np.asarray(k['tab'][f]), expect,
                                   atol=1e-9, err_msg='finger %d' % f)
    # velocity = d tab / d theta (central difference on the chain)
    eps = 1e-6
    for f in range(2):
        d = (_urdf_pad_tab(theta + eps, f) - _urdf_pad_tab(theta - eps, f)) \
            / (2 * eps)
        expect = np.array([-d[2], d[1], d[0]])
        np.testing.assert_allclose(np.asarray(k['vel'][f]), expect, atol=1e-5)


def test_pad_gap_reference_constants():
    """The '85' in Robotiq-85, and the reference's grasp_block_state."""
    gap = lambda th: float(np.linalg.norm(
        KM.robotiq_pad_kinematics(np.array([th, th]))['tab'][0]
        - KM.robotiq_pad_kinematics(np.array([th, th]))['tab'][1]))
    assert abs(gap(0.0) - 0.0856) < 1e-3
    # at gripper_grasp_block_state=0.545 the pads span a 30 mm block
    # (kuka.py:64: the state the reference composes grasp goals with)
    assert abs(gap(KM.ROBOTIQ_GRASP_BLOCK_STATE) - 0.030) < 1e-3
    assert gap(KM.ROBOTIQ_JOINT_LIMIT) < 2e-3


def test_ee_frames_closeness_range():
    q = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
    fro = fk.ee_frames(q, jnp.zeros((2,), jnp.float32), gripper='robotiq85')
    tab = np.asarray(fro['finger_tab'])
    assert abs(np.linalg.norm(tab[0] - tab[1]) - 0.0856) < 1e-3
    frc = fk.ee_frames(q, jnp.full((2,), 0.804, jnp.float32),
                       gripper='robotiq85')
    tabc = np.asarray(frc['finger_tab'])
    assert np.linalg.norm(tabc[0] - tabc[1]) < 2e-3


def test_robotiq_grasps_and_lifts_block():
    """Grasp dynamics through the raw engine: close the linkage on a block
    and lift — the friction pinch must carry it (reference behaviour with
    50 N-m drive, mu=1 pads)."""
    spec = S.single_step_scene(has_obj=True)
    eng = D.Engine(spec, gripper='robotiq85')
    # arm pose putting the PADS around the block: solve IK for a tip 34 mm
    # above the block centre (the pads ride ~20-35 mm below the tip)
    from pybullet_multigoal_gym_tpu.ops import ik
    bp = jnp.array([[-0.52, 0.0, 0.175]], jnp.float32)
    # the robotiq pads ride 20-33 mm below ITS tip frame (+0.18 z, not the
    # jaw's +0.12): solve IK in the robotiq tip frame, pads centred on the
    # block's upper half so they clear the table (pad length 36 mm > block)
    q0 = ik.solve(jnp.array([-0.52, 0.0, 0.175 + 0.035], jnp.float32),
                  q_init=jnp.asarray(KM.KUKA_REST_POSE, jnp.float32),
                  gripper='robotiq85')
    st = eng.init_state(q=q0, body_pos=bp, fq=0.0)      # pads open
    ctrl_close = D.Controls(q_target=q0,
                            f_target=jnp.full((2,), 0.804, jnp.float32),
                            door_motor_on=jnp.zeros((), bool),
                            door_target=jnp.zeros(()))
    step = jax.jit(lambda s, c: eng.control_step(s, c))
    st = step(st, ctrl_close)                            # close (2 rad/s cap)
    st = step(st, ctrl_close)
    assert 0.5 < float(st.fq[0]) < 0.62, st.fq           # stalled on the block
    # lift the arm 6 cm; the pinched block must follow
    q_up = ik.solve(jnp.array([-0.52, 0.0, 0.175 + 0.095], jnp.float32),
                    q_init=q0, gripper='robotiq85')
    ctrl_up = ctrl_close._replace(q_target=q_up)
    for _ in range(3):
        st = step(st, ctrl_up)
    assert float(st.body_pos[0, 2]) > 0.21, st.body_pos
    assert np.all(np.isfinite(np.asarray(st.body_pos)))


@pytest.mark.skipif(not ON_TPU, reason='interpret mode is intractably slow; '
                    'CPU covers the XLA robotiq path directly')
def test_robotiq_pallas_engine_parity():
    from pybullet_multigoal_gym_tpu.ops.pallas_engine import (PallasEngine,
                                                              TILE)
    n_sub = 40 if ON_TPU else 2
    spec = S.single_step_scene(has_obj=True)
    xeng = D.Engine(spec, gripper='robotiq85')
    peng = PallasEngine(spec, gripper='robotiq85')
    key = jax.random.PRNGKey(0)
    N = TILE
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (N, 1))
    bp = jnp.tile(jnp.array([[-0.5, 0.05, 0.21]], jnp.float32), (N, 1, 1))
    bp = bp + jax.random.uniform(key, (N, 1, 3), jnp.float32, -0.02, 0.02)
    st = D.PhysicsState(
        q=q0, qd=jnp.zeros((N, 7)), fq=jnp.full((N, 2), 0.3, jnp.float32),
        fqd=jnp.zeros((N, 2)), body_pos=bp,
        body_quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                           (N, 1, 1)),
        body_linvel=jnp.zeros((N, 1, 3)), body_angvel=jnp.zeros((N, 1, 3)),
        door_q=jnp.zeros((N,)), door_qd=jnp.zeros((N,)),
        ee_contact_force=jnp.zeros((N, 3)))
    ctrl = D.Controls(q_target=q0,
                      f_target=jnp.full((N, 2), 0.804, jnp.float32),
                      door_motor_on=jnp.zeros((N,), bool),
                      door_target=jnp.zeros((N,)))
    M = 16

    def xla_n(s, c):
        for _ in range(n_sub):
            s = xeng.substep(s, c)
        return s

    x_out = jax.jit(jax.vmap(xla_n))(
        jax.tree_util.tree_map(lambda x: x[:M], st),
        jax.tree_util.tree_map(lambda x: x[:M], ctrl))
    p_out = jax.jit(lambda s, c: peng.control_step(s, c, n_substeps=n_sub))(
        st, ctrl)
    for name in ('q', 'fq', 'body_pos', 'body_quat'):
        np.testing.assert_allclose(
            np.asarray(getattr(p_out, name))[:M],
            np.asarray(getattr(x_out, name)), atol=2e-3,
            err_msg=name)
