"""Parity tests: Pallas physics/IK kernels vs the XLA reference engine.

On CPU the kernels run in pallas interpret mode (slow), so substep counts
are small; on TPU the full compiled path is exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pybullet_multigoal_gym_tpu  # noqa: F401  (precision config)
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk, ik
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.ops.pallas_engine import PallasEngine, TILE

ON_TPU = jax.default_backend() == 'tpu'


def _mk_state(N, key, z=0.21):
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (N, 1))
    bp = jnp.tile(jnp.array([[-0.5, 0.05, z]], jnp.float32), (N, 1, 1))
    bp = bp + jax.random.uniform(key, (N, 1, 3), jnp.float32, -0.02, 0.02)
    return D.PhysicsState(
        q=q0, qd=jnp.zeros((N, 7)), fq=jnp.zeros((N, 2)),
        fqd=jnp.zeros((N, 2)), body_pos=bp,
        body_quat=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (N, 1, 1)),
        body_linvel=jnp.zeros((N, 1, 3)), body_angvel=jnp.zeros((N, 1, 3)),
        door_q=jnp.zeros((N,)), door_qd=jnp.zeros((N,)),
        ee_contact_force=jnp.zeros((N, 3)))


def _mk_controls(N, f_target=0.035):
    q0 = jnp.tile(jnp.asarray(KM.KUKA_REST_POSE, jnp.float32), (N, 1))
    return D.Controls(q_target=q0,
                      f_target=jnp.full((N, 2), f_target, jnp.float32),
                      door_motor_on=jnp.zeros((N,), bool),
                      door_target=jnp.zeros((N,)))


def test_pallas_engine_matches_xla():
    n_sub = 100 if ON_TPU else 2
    spec = S.single_step_scene(has_obj=True)
    xeng = D.Engine(spec)
    peng = PallasEngine(spec)
    st = _mk_state(TILE, jax.random.PRNGKey(0))
    ctrl = _mk_controls(TILE)
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
    for f in ['q', 'qd', 'fq', 'fqd', 'body_pos', 'body_quat', 'body_linvel',
              'body_angvel']:
        a = np.asarray(getattr(x_out, f))
        b = np.asarray(getattr(p_out, f))[:M]
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=f)


def test_pallas_ik_matches_xla():
    from pybullet_multigoal_gym_tpu.ops.pallas_ik import PallasIK
    N = TILE
    tgt = jax.random.uniform(
        jax.random.PRNGKey(0), (N, 3), jnp.float32,
        jnp.array([-0.62, -0.15, 0.2]), jnp.array([-0.42, 0.15, 0.45]))
    pik = PallasIK()
    qp = jax.jit(pik.solve)(tgt)
    M = 16 if not ON_TPU else N
    qx = jax.jit(jax.vmap(lambda t: ik.solve(t)))(tgt[:M])
    np.testing.assert_allclose(np.asarray(qp)[:M], np.asarray(qx), atol=1e-4)
    tips, _ = jax.vmap(fk.tip_pose)(qp[:M])
    assert float(jnp.linalg.norm(tips - tgt[:M], axis=-1).max()) < 1e-3


@pytest.mark.skipif(not ON_TPU, reason='full vec-env pallas path needs TPU')
def test_vec_env_pallas_matches_xla_path():
    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
    cfg = EnvConfig(task='push', max_episode_steps=10)
    env_p = VecMGEnv(cfg, num_envs=1024, use_pallas=True)
    env_x = VecMGEnv(cfg, num_envs=1024, use_pallas=False)
    assert env_p.use_pallas and not env_x.use_pallas
    key = jax.random.PRNGKey(3)
    sp, op = env_p.reset(key)
    sx, ox = env_x.reset(key)
    np.testing.assert_allclose(np.asarray(op['achieved_goal']),
                               np.asarray(ox['achieved_goal']))
    a = jax.random.uniform(jax.random.PRNGKey(4), (1024, 4), jnp.float32,
                           -1, 1)
    for t in range(3):
        sp, op, rp, dp, ip = env_p.step(sp, a)
        sx, ox, rx, dx, ix = env_x.step(sx, a)
    # trajectories agree within solver tolerance after 3 steps (300 substeps)
    np.testing.assert_allclose(np.asarray(op['observation']),
                               np.asarray(ox['observation']), atol=5e-3)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx), atol=1e-6)


@pytest.mark.skipif(not ON_TPU, reason='full vec-env pallas path needs TPU')
def test_vec_env_pallas_tile_padding():
    """Batches that don't tile into 1024-env VPU blocks keep the Pallas
    engine by padding up to whole tiles internally (vec_env.py). A padded
    1536-env env must behave exactly like the first 1536 envs of a 2048-env
    env (reset splits the same internal key count), with every user-visible
    output sliced to the requested batch."""
    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
    cfg = EnvConfig(task='push', max_episode_steps=10)
    env_a = VecMGEnv(cfg, num_envs=1536, use_pallas=True)
    env_b = VecMGEnv(cfg, num_envs=2048, use_pallas=True)
    assert env_a.use_pallas and env_a._n == 2048
    key = jax.random.PRNGKey(7)
    sa, oa = env_a.reset(key)
    sb, ob = env_b.reset(key)
    assert oa['observation'].shape[0] == 1536
    assert ob['observation'].shape[0] == 2048
    a = jax.random.uniform(jax.random.PRNGKey(8), (2048, 4), jnp.float32,
                           -1, 1)
    for _ in range(2):
        sa, oa, ra, da, ia = env_a.step(sa, a[:1536])
        sb, ob, rb, db, ib = env_b.step(sb, a)
    assert ra.shape == (1536,) and da.shape == (1536,)
    np.testing.assert_allclose(np.asarray(oa['observation']),
                               np.asarray(ob['observation'][:1536]))
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb[:1536]))

    # small batches fall back to the XLA engine with an explicit warning
    with pytest.warns(UserWarning, match='falling back'):
        env_s = VecMGEnv(cfg, num_envs=64, use_pallas=True)
    assert not env_s.use_pallas
