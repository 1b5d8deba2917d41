"""Reach with image observations + goal images — port of the reference demo
(`/root/reference/pybullet_multigoal_gym/examples/kuka_reach.py`), headless:
images are written to ./out instead of a GUI window."""

import os

import numpy as np

import pybullet_multigoal_gym_tpu as pmg

camera_setup = [
    {'cameraEyePosition': [-0.9, -0.0, 0.4],
     'cameraTargetPosition': [-0.45, -0.0, 0.0],
     'cameraUpVector': [0, 0, 1], 'render_width': 224, 'render_height': 224},
    {'cameraEyePosition': [-1.0, -0.25, 0.6],
     'cameraTargetPosition': [-0.6, -0.05, 0.2],
     'cameraUpVector': [0, 0, 1], 'render_width': 224, 'render_height': 224},
]

env = pmg.make_env(task='pick_and_place', gripper='parallel_jaw',
                   binary_reward=True, max_episode_steps=5,
                   image_observation=True, depth_image=False, goal_image=True,
                   visualize_target=True, camera_setup=camera_setup,
                   observation_cam_id=[0], goal_cam_id=1)
obs = env.reset()
os.makedirs('out', exist_ok=True)
rng = np.random.default_rng(0)
for t in range(10):
    action = env.action_space.sample(rng)
    obs, reward, done, info = env.step(action)
    if done:
        obs = env.reset()

try:
    from PIL import Image
    Image.fromarray(np.asarray(obs['desired_goal_img'])).save('out/reach_goal.png')
    Image.fromarray(np.asarray(obs['achieved_goal_img'])).save('out/reach_achieved.png')
    print('wrote out/reach_goal.png, out/reach_achieved.png')
except ImportError:
    print('desired_goal_img shape:', np.asarray(obs['desired_goal_img']).shape)
