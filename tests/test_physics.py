"""Physics engine tests: resting contact, friction, gravity, stability
(SURVEY.md §4: penetration bounds, energy sanity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import scene as S


@pytest.fixture(scope='module')
def engine():
    return D.Engine(S.single_step_scene(has_obj=True))


def _rest_controls():
    return D.Controls(q_target=jnp.asarray(KM.KUKA_REST_POSE, jnp.float32),
                      f_target=jnp.full((2,), KM.FINGER_LIMIT, jnp.float32),
                      door_motor_on=jnp.zeros((), bool),
                      door_target=jnp.zeros((), jnp.float32))


def test_block_falls_and_rests_on_table(engine):
    """A block dropped above the table settles on the surface with bounded
    penetration and near-zero velocity."""
    st = engine.init_state(body_pos=jnp.array([[-0.42, 0.15, 0.25]]))
    step = jax.jit(lambda s: engine.control_step(s, _rest_controls()))
    for _ in range(5):       # 5 control steps = 1 s simulated
        st = step(s=st)
    z = float(st.body_pos[0, 2])
    rest_z = 0.16 + S.BLOCK_HALF
    assert abs(z - rest_z) < 5e-3, z
    assert float(jnp.linalg.norm(st.body_linvel[0])) < 5e-2
    # penetration bound: never sinks below the plane
    assert z > 0.16 - 5e-3


def test_block_stays_put_under_friction(engine):
    """A block resting away from the arm does not drift (static friction +
    no spurious impulses)."""
    start = jnp.array([[-0.42, 0.15, 0.16 + S.BLOCK_HALF]])
    st = engine.init_state(body_pos=start)
    step = jax.jit(lambda s: engine.control_step(s, _rest_controls()))
    for _ in range(10):
        st = step(s=st)
    drift = float(jnp.linalg.norm(st.body_pos[0, :2] - start[0, :2]))
    assert drift < 2e-2, drift


def test_arm_tracks_joint_targets(engine):
    """The PD servo converges to a nearby joint target within one control
    step (the Bullet force-200/gain-0.03 regime is stiff)."""
    q0 = jnp.asarray(KM.KUKA_REST_POSE, jnp.float32)
    target = q0 + 0.05
    st = engine.init_state(q=q0, body_pos=jnp.array([[-0.42, 0.15, 0.175]]))
    ctrl = D.Controls(q_target=target,
                      f_target=jnp.full((2,), KM.FINGER_LIMIT, jnp.float32),
                      door_motor_on=jnp.zeros((), bool),
                      door_target=jnp.zeros((), jnp.float32))
    st = jax.jit(lambda s: engine.control_step(s, ctrl))(st)
    np.testing.assert_allclose(np.asarray(st.q), np.asarray(target), atol=5e-3)


def test_no_nans_under_random_controls(engine):
    key = jax.random.PRNGKey(0)
    st = engine.init_state(body_pos=jnp.array([[-0.5, 0.0, 0.2]]))

    @jax.jit
    def step(s, k):
        dq = jax.random.uniform(k, (7,), jnp.float32, -0.3, 0.3)
        ctrl = D.Controls(
            q_target=jnp.asarray(KM.KUKA_REST_POSE, jnp.float32) + dq,
            f_target=jnp.zeros((2,), jnp.float32),
            door_motor_on=jnp.zeros((), bool),
            door_target=jnp.zeros((), jnp.float32))
        return engine.control_step(s, ctrl)

    for i in range(5):
        st = step(st, jax.random.fold_in(key, i))
    for leaf in jax.tree_util.tree_leaves(st):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_finger_grasp_and_lift():
    """Pick a block off the table: close the fingers around it, raise the
    arm, and the friction grasp must carry it up — the behaviour
    pick_and_place/block_stack depend on (SURVEY.md §7 hard part #1)."""
    from pybullet_multigoal_gym_tpu.ops import fk, ik
    engine = D.Engine(S.single_step_scene(has_obj=True))
    block = jnp.array([-0.52, 0.0, 0.175], jnp.float32)
    q = ik.solve(block)
    # fingers start open (fq=0), then drive fully closed (fq=limit):
    # URDF axes (0,-1,0)/(0,1,0) from origins y=+-0.04 mean joint value
    # INCREASES toward the centre (iiwa14_parallel_jaw.urdf:418-455)
    st = engine.init_state(q=q, body_pos=block[None], fq=0.0)
    close = D.Controls(q_target=q,
                       f_target=jnp.full((2,), KM.FINGER_LIMIT, jnp.float32),
                       door_motor_on=jnp.zeros((), bool),
                       door_target=jnp.zeros((), jnp.float32))
    step = jax.jit(lambda s, c: engine.control_step(s, c))
    for _ in range(3):
        st = step(st, close)
    # fingers stall at the block faces (pad separation = block width):
    # fq = 0.04 - 0.005 - 0.015 = 0.02
    np.testing.assert_allclose(np.asarray(st.fq), 0.02, atol=2e-3)
    np.testing.assert_allclose(float(st.body_pos[0, 2]), 0.175, atol=5e-3)

    q_up = ik.solve(block + jnp.array([0.0, 0.0, 0.15], jnp.float32), q_init=q)
    lift = close._replace(q_target=q_up)
    for _ in range(5):                    # 1 s simulated
        st = step(st, lift)
    # the block came up with the gripper and hangs stably
    assert float(st.body_pos[0, 2]) > 0.27, st.body_pos
    assert float(jnp.linalg.norm(st.body_linvel[0])) < 0.05
    # EE force sensor reads the hanging load (~2 kg block + distal subtree)
    assert abs(float(st.ee_contact_force[2])) > 10.0
