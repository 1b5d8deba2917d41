"""Scripted-policy acceptance tests: each task family must be SOLVABLE by a
simple hand-written controller through the public API — the strongest
end-to-end evidence that action decoding, IK, physics, goal sampling and
reward all compose correctly (the reference's examples/ are eyeball demos;
these are their machine-checkable equivalent)."""

import jax
import numpy as np
import pytest

import pybullet_multigoal_gym_tpu as pmg
from tests import policies


def _run_episodes(env, policy, n_episodes=3, max_steps=100):
    wins = 0
    for ep in range(n_episodes):
        obs = env.reset()
        for t in range(max_steps):
            obs, reward, done, info = env.step(policy(obs))
            if info['goal_achieved']:
                wins += 1
                break
    return wins


def test_reach_scripted():
    env = pmg.make_env(task='reach', max_episode_steps=100, seed=0)

    def policy(obs):
        grip = obs['observation'][:3]
        goal = obs['desired_goal']
        return np.clip((goal - grip) * 20, -1, 1).astype(np.float32)

    wins = _run_episodes(env, policy, n_episodes=3, max_steps=60)
    assert wins == 3, wins


def test_push_scripted():
    """Push the block toward the goal by driving the EE behind it."""
    env = pmg.make_env(task='push', max_episode_steps=120, seed=1)

    def policy(obs):
        return policies.push_step(
            obs['observation'][:3], obs['achieved_goal'],
            obs['desired_goal']).astype(np.float32)

    wins = _run_episodes(env, policy, n_episodes=3, max_steps=120)
    assert wins >= 2, wins


def test_pick_and_place_scripted():
    env = pmg.make_env(task='pick_and_place', max_episode_steps=100, seed=3)

    def policy(obs):
        grip = obs['observation'][:3]
        block = obs['achieved_goal']
        goal = obs['desired_goal']
        closeness = obs['observation'][6]
        above = block + [0, 0, 0.06]
        if (np.linalg.norm(grip - block) > 0.055
                and np.linalg.norm(grip[:2] - block[:2]) > 0.01):
            a, g = np.clip((above - grip) * 30, -1, 1), -1.0
        elif closeness > 0.045 and np.linalg.norm(grip - block) > 0.012:
            a, g = np.clip((block - grip) * 30, -1, 1), -1.0
        elif closeness > 0.04:
            a, g = np.zeros(3), 1.0
        else:
            a, g = np.clip((goal - block) * 20, -1, 1), 1.0
        return np.concatenate([a, [g]]).astype(np.float32)

    wins = _run_episodes(env, policy, n_episodes=3, max_steps=100)
    assert wins >= 2, wins


def test_slide_scripted():
    """Slide: strike the puck so it coasts over the mu=0.05 long table
    toward a goal beyond the EE workspace (kuka_single_step_base_env.py:66).

    Precision wins are physics-limited for a scripted controller: the
    fixed-yaw 2 cm paddle face drifts diagonally-struck pucks laterally and
    the 5 Hz action rate bounds strike-speed control (the reference's
    DDPG-HER agents also plateau well below 100% on Slide). The assertions
    therefore target the MECHANICS: every strike keeps the puck on the
    table (no solver blow-ups — the historical failure mode launched it
    metres away), and the aggregate distance-to-goal shrinks substantially.
    """
    import jax.numpy as jnp
    from pybullet_multigoal_gym_tpu.ops import ik

    env = pmg.make_env(task='slide', joint_control=True,
                       max_episode_steps=150, seed=0)
    core = env.venv.core
    rest = np.asarray(core.rest_pose)

    def ik_solve(p, qi):
        return np.asarray(ik.solve(jnp.asarray(p, jnp.float32),
                                   q_init=jnp.asarray(qi, jnp.float32),
                                   rest_pose=jnp.asarray(core.rest_pose)))

    expert = policies.SlideExpert(ik_solve, rest)
    init_d, final_d = [], []
    for _ in range(4):
        obs = env.reset()
        expert.reset()
        init_d.append(np.linalg.norm(obs['achieved_goal'][:2]
                                     - obs['desired_goal'][:2]))
        for _ in range(150):
            obs, reward, done, info = env.step(expert(obs))
            if info['goal_achieved']:
                break
        puck = obs['achieved_goal']
        final_d.append(np.linalg.norm(puck[:2] - obs['desired_goal'][:2]))
        # the puck stays ON the table plane (no launch / blow-up)
        assert 0.16 < puck[2] < 0.25, puck
        assert np.linalg.norm(puck[:2]) < 2.0, puck
    # aggregate progress: strikes move the pucks most of the way in
    assert np.mean(final_d) < 0.7 * np.mean(init_d), (init_d, final_d)
    # and at least half the strikes land near the goal
    assert sum(d < 0.2 for d in final_d) >= 2, final_d
