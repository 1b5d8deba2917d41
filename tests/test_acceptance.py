"""Scripted-policy acceptance tests: each task family must be SOLVABLE by a
simple hand-written controller through the public API — the strongest
end-to-end evidence that action decoding, IK, physics, goal sampling and
reward all compose correctly (the reference's examples/ are eyeball demos;
these are their machine-checkable equivalent)."""

import jax
import numpy as np
import pytest

import pybullet_multigoal_gym_tpu as pmg


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
        grip = obs['observation'][:3]
        block = obs['achieved_goal']
        goal = obs['desired_goal']
        to_goal = goal[:2] - block[:2]
        d = np.linalg.norm(to_goal)
        push_dir = to_goal / max(d, 1e-6)
        rel = grip[:2] - block[:2]
        behind = float(np.dot(rel, push_dir)) < -0.012
        if behind and grip[2] < 0.19:
            # low and behind: push through the block toward the goal
            tgt = np.concatenate([block[:2] + push_dir * 0.02, [0.176]])
        elif behind:
            tgt = np.array([grip[0], grip[1], 0.176])     # descend in place
        elif grip[2] < 0.24 and np.linalg.norm(rel) < 0.06:
            # misaligned near the block: go straight up before traversing
            tgt = np.array([grip[0], grip[1], 0.26])
        else:
            tgt = np.concatenate([block[:2] - push_dir * 0.04, [0.26]])
        return np.clip((tgt - grip) * 25, -1, 1).astype(np.float32)

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
