"""6-DoF insertion with EE force sensing and subtask rewards — port of the
reference demo (`examples/kuka_insertion.py`)."""

import numpy as np

import pybullet_multigoal_gym_tpu as pmg

env = pmg.make_env(task='insertion', binary_reward=True,
                   distance_threshold=0.05, state_noise=True,
                   gripper='parallel_jaw', max_episode_steps=10)

obs = env.reset()
rng = np.random.default_rng(0)
for t in range(10):
    action = env.action_space.sample(rng)
    obs, reward, done, info = env.step(action)
    sr = obs['subtask_rewards']
    print('t=%d r=%.2f pick_up=%.3f reach=%.3f insert=%.3f' % (
        t, reward, float(sr['pick_up']), float(sr['reach']),
        float(sr['insert'])))
    if done:
        obs = env.reset()
