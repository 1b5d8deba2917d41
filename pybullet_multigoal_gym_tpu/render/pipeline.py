"""Image-observation pipeline: cameras + goal-image synthesis per family.

Reproduces the reference's image obs assembly
(`kuka_single_step_base_env.py:222-234`, `kuka_multi_step_base_env.py:322-335`,
`kuka_shape_assemble_base_env.py:179-201`) and goal-image synthesis. In this
functional engine a goal image is just "render(modified configuration)" — the
teleport-render-restore dance of the reference collapses into a pose override.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import fk, ik
from pybullet_multigoal_gym_tpu.render import camera as C
from pybullet_multigoal_gym_tpu.render import raster, visuals

F32 = jnp.float32


class RenderPipeline:
    """Per-family camera rig + render entry points (unbatched; vmap outside)."""

    def __init__(self, env, camera_setup=None):
        cfg = env.cfg
        self.env = env
        self.cfg = cfg
        if camera_setup is None:
            camera_setup = cfg.camera_setup_dicts
        setups = list(camera_setup) if camera_setup is not None \
            else C.default_camera_setup(cfg.render_width, cfg.render_height)
        setups.append(C.top_down_camera_setup())
        self.setups = setups          # hand cam appended dynamically (id -1)
        self.fixed = []
        for s in setups:
            V = C.view_matrix(s['cameraEyePosition'], s['cameraTargetPosition'],
                              s['cameraUpVector'])
            P = C.projection_matrix_fov(
                aspect=float(s['render_width']) / s['render_height'])
            self.fixed.append((V, P, s['render_width'], s['render_height']))

    # ------------------------------------------------------------- low level
    def camera(self, state, camera_id):
        if camera_id == -1:
            frames = fk.ee_frames(state.phys.q, state.phys.fq)
            tgt = frames['tip'].at[2].add(-0.1)
            V = C.view_matrix(frames['hand_cam'], tgt, jnp.array([0.0, 0, 1]))
            P = C.projection_matrix_fov(aspect=1.0)
            return V, P, 224, 224
        return self.fixed[camera_id]

    def render(self, state, mode='rgb_array', camera_id=0, goal_config=None):
        V, P, w, h = self.camera(state, camera_id)
        prims = visuals.build_prims(self.env, state, goal_config=goal_config)
        if mode == 'pcd':
            depth = raster.render(prims, V, P, w, h, mode='depth_float')
            return raster.render_pcd(depth, V, P, w, h)
        return raster.render(prims, V, P, w, h, mode=mode)

    # ----------------------------------------------------------- goal images
    def _goal_config(self, state):
        """Pose overrides that realise the desired goal (family-specific)."""
        env, cfg = self.env, self.cfg
        ph = state.phys
        goal = state.desired_goal
        if cfg.family == 'single_step':
            if not cfg.has_obj:
                # arm teleported to the goal (kuka_single_step_base_env.py:150-157)
                q = ik.solve(goal[:3], q_init=jnp.asarray(env.rest_pose),
                         gripper=env.cfg.gripper,
                             rest_pose=jnp.asarray(env.rest_pose))
                return {'q': q}
            if not cfg.grasping:
                # block teleported to the goal (:158-168)
                return {'body_pos': ph.body_pos.at[0].set(goal[:3])}
            # pick-and-place: arm + closed fingers + block at the goal (:169-188)
            q = ik.solve(goal[:3], q_init=jnp.asarray(env.rest_pose),
                         gripper=env.cfg.gripper,
                         rest_pose=jnp.asarray(env.rest_pose))
            fq = jnp.full((2,), env.gripper_grasp_block_state * env.finger_scale,
                          F32)
            return {'q': q, 'fq': fq,
                    'body_pos': ph.body_pos.at[0].set(goal[:3])}
        if cfg.family == 'multi_step':
            if cfg.has_chest:
                # unsupported in the reference too
                # (kuka_multi_step_base_env.py:399-401)
                return None
            nb = cfg.num_block
            body_pos = goal[:3 * nb].reshape(nb, 3)
            if cfg.grasping:
                if cfg.grip_informed_goal:
                    gpos = goal[-4:-1]
                else:
                    gpos = state.target_xyzs[0].at[2].set(
                        0.175 + env.block_size * (nb - 1))
                q = ik.solve(gpos, q_init=jnp.asarray(env.rest_pose),
                         gripper=env.cfg.gripper,
                             rest_pose=jnp.asarray(env.rest_pose))
                fq = jnp.full((2,), env.gripper_grasp_block_state
                              * env.finger_scale, F32)
                return {'q': q, 'fq': fq, 'body_pos': body_pos}
            return {'body_pos': body_pos}
        # shape_assemble / insertion: goal object teleported; arm away
        # (kuka_shape_assemble_envs.py:37-54)
        b = (env._body_index(cfg.goal_object_key)
             if hasattr(env, '_body_index') else env.goal_obj_idx)
        tq = quatm.euler_zyz_to_quat(goal[3:6])
        return {'q': jnp.asarray(KM.KUKA_AWAY_POSE, F32),
                'body_pos': ph.body_pos.at[b].set(goal[:3]),
                'body_quat': ph.body_quat.at[b].set(tq)}

    def goal_image(self, state):
        """Render the desired-goal image for one env state (uncached)."""
        return self.render(state, self.cfg.render_mode, self.cfg.goal_cam_id,
                           goal_config=self._goal_config(state))

    # ------------------------------------------------------------ obs fields
    def image_obs(self, state):
        """The image-related obs-dict fields for one env state."""
        cfg = self.cfg
        mode = cfg.render_mode
        # shape-assemble renders with the arm teleported out of view
        # (kuka_shape_assemble_base_env.py:180,200)
        away = ({'q': jnp.asarray(KM.KUKA_AWAY_POSE, F32)}
                if cfg.family == 'shape_assemble' else None)
        images = [self.render(state, mode, cid, goal_config=away)
                  for cid in cfg.observation_cam_id]
        out = {'images': images, 'observation': images[0]}
        if cfg.goal_image:
            # achieved_goal_img is the same render as an observation camera
            # whenever goal_cam_id is among observation_cam_id (the default:
            # both 0) — reuse it instead of tracing a second full trace
            cids = list(cfg.observation_cam_id)
            out['achieved_goal_img'] = (
                images[cids.index(cfg.goal_cam_id)]
                if cfg.goal_cam_id in cids
                else self.render(state, mode, cfg.goal_cam_id,
                                 goal_config=away))
            # episode-constant goals carry their image in state (rendered
            # once per reset, like the reference's teleport-render-at-reset);
            # families that mutate desired_goal mid-episode render fresh
            out['desired_goal_img'] = (
                state.desired_goal_img if state.desired_goal_img is not None
                else self.goal_image(state))
        if cfg.point_cloud:
            out['pcd'] = self.render(state, 'pcd', 0, goal_config=away)
        return out
