"""Block stacking with task decomposition — port of the reference demo
(`examples/kuka_chest_push_task_decomposition.py` pattern applied to
block_stack): cycle the sub-goal index and watch the desired goal change."""

import numpy as np

import pybullet_multigoal_gym_tpu as pmg

env = pmg.make_env(task='block_stack', gripper='parallel_jaw', num_block=5,
                   binary_reward=True, max_episode_steps=25,
                   task_decomposition=True)
obs = env.reset()
env.set_sub_goal(0)
rng = np.random.default_rng(0)
t = 0
for step in range(10):
    action = env.action_space.sample(rng)
    obs, reward, done, info = env.step(action)
    t = (t + 1) % 5
    goal = env.set_sub_goal(t)
    print('step %2d -> sub_goal %d, desired_goal[:6]=%s' % (
        step, t, np.round(goal[:6], 3).tolist()))
