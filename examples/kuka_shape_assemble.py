"""Push-primitive shape assembly — port of the reference demo
(`examples/kuka_shape_assemble.py`): discrete push actions over the
workspace pixel grid, RGB-D observations, hand-cam goal images."""

import numpy as np

import pybullet_multigoal_gym_tpu as pmg

camera_setup = [
    {'cameraEyePosition': [-0.58, 0.0, 0.327],
     'cameraTargetPosition': [-0.58, 0.0, 0.02],
     'cameraUpVector': [1, 0, 0], 'render_width': 224, 'render_height': 224},
    {'cameraEyePosition': [-0.9, -0.0, 0.4],
     'cameraTargetPosition': [-0.45, -0.0, 0.0],
     'cameraUpVector': [0, 0, 1], 'render_width': 224, 'render_height': 224},
]

env = pmg.make_env(task='primitive_push_reach', primitive='discrete_push',
                   binary_reward=True, distance_threshold=0.05,
                   image_observation=True, depth_image=True, goal_image=True,
                   state_noise=True, visualize_target=False,
                   camera_setup=camera_setup, observation_cam_id=[1],
                   goal_cam_id=-1, gripper='parallel_jaw',
                   max_episode_steps=10)

obs = env.reset()
rng = np.random.default_rng(0)
for t in range(5):
    action = env.action_space.sample(rng)
    obs, reward, done, info = env.step(action)
    print('t=%d reward=%.2f obs img %s goal img %s' % (
        t, reward, np.asarray(obs['observation']).shape,
        np.asarray(obs['desired_goal_img']).shape))
    if done:
        obs = env.reset()
