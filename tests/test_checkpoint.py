"""Checkpoint/resume + NaN-guard tests (SURVEY.md §5 auxiliary subsystems)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.utils import checkpoint


def test_checkpoint_roundtrip_resumes_deterministically():
    env = VecMGEnv(EnvConfig(task='reach', max_episode_steps=10), num_envs=4)
    state, obs = env.reset(jax.random.PRNGKey(0))
    a = jax.random.uniform(jax.random.PRNGKey(1), (4, 3), jnp.float32, -1, 1)
    state, obs, reward, done, info = env.step(state, a)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'ckpt')
        checkpoint.save(path, state)
        restored = checkpoint.restore(path, state)

    # restored state continues IDENTICALLY (PRNG keys, goals, physics)
    s1, o1, r1, d1, i1 = env.step(state, a)
    s2, o2, r2, d2, i2 = env.step(restored, a)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(o1['observation']),
                                  np.asarray(o2['observation']))
    np.testing.assert_array_equal(np.asarray(s1.key), np.asarray(s2.key))


def test_no_nans_with_debug_nans_rollout():
    """jax_debug_nans guard: a short rollout raises on any NaN produced
    anywhere in the jitted step (SURVEY.md §5 race/NaN detection)."""
    jax.config.update('jax_debug_nans', True)
    try:
        env = VecMGEnv(EnvConfig(task='push', max_episode_steps=5),
                       num_envs=2)
        state, obs = env.reset(jax.random.PRNGKey(2))
        for i in range(3):
            a = jax.random.uniform(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                   (2, 4), jnp.float32, -1, 1)
            state, obs, reward, done, info = env.step(state, a)
        np.asarray(reward)
    finally:
        jax.config.update('jax_debug_nans', False)
