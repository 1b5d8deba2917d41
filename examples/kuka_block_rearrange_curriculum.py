"""Block-rearrange with curriculum goal generation — port of the reference
demo (`examples/kuka_block_rearrange_curriculum.py`): resets with curriculum
updates active and prints how the goal difficulty distribution shifts."""

import numpy as np

import pybullet_multigoal_gym_tpu as pmg

env = pmg.make_env(task='block_rearrange', gripper='parallel_jaw', num_block=4,
                   binary_reward=True, max_episode_steps=25,
                   use_curriculum=True, num_goals_to_generate=32)
obs = env.reset()
env.activate_curriculum_update()
rng = np.random.default_rng(0)
for episode in range(8):
    obs = env.reset()
    st = env._state
    print('episode %d: curriculum level=%d prob=%s goals/level=%s' % (
        episode, int(np.asarray(st.curriculum_level)[0]),
        np.round(np.asarray(st.curriculum_prob)[0], 2).tolist(),
        np.asarray(st.goals_generated)[0].tolist()))
    for t in range(5):
        obs, reward, done, info = env.step(env.action_space.sample(rng))
