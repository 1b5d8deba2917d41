"""6-DoF insertion family: KukaInsertionEnv.

Functional re-implementation of `KukaBulletInsertionEnv`
(`/root/reference/pybullet_multigoal_gym/envs/base_envs/kuka_insertion_base_env.py`)
and `KukaInsertionEnv` (`envs/task_envs/kuka_insertion_envs.py`): 6-DoF EE
frame control (xyz + ZYZ euler + grip), EE force/torque sensing, optional
Gaussian state noise, auxiliary object state and dense per-subtask rewards.

Note on the EE rotation target: the reference seeds its Euler accumulator
with PyBullet XYZ angles but consumes them as numpy-quaternion ZYZ angles
(`kuka.py:164` vs `kuka.py:218`), which makes the very first orientation
target the identity. This engine seeds the accumulator with the ZYZ angles of
the actual tip orientation instead, so the initial target equals the actual
downward pose — the intended behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.envs import core
from pybullet_multigoal_gym_tpu.envs import robot as R
from pybullet_multigoal_gym_tpu.envs.single_step import KukaEnvBase

F32 = jnp.float32

# ZYZ euler of the fixed downward EE orientation (wxyz (0,0,-1,0))
_DOWN_ZYZ = np.array([np.pi, np.pi, -np.pi], np.float32)


class KukaInsertionEnv(KukaEnvBase):

    def __init__(self, cfg: EnvConfig):
        super().__init__(cfg)
        self.object_keys = cfg.manipulated_object_keys   # ('slot','rectangle')
        self.goal_obj_idx = self.object_keys.index(cfg.goal_object_key)
        self.slot_idx = self.object_keys.index('slot')
        # object_initial_pos z values (kuka_insertion_base_env.py:54-58)
        self.obj_z = {'slot': 0.03, 'rectangle': 0.06}

    def _build_engine(self):
        # scene body order: (rectangle, slot); env object order: (slot, rectangle)
        return D.Engine(S.insertion_scene(), gripper=self.cfg.gripper,
                        ik_workspace=self.ik_workspace)

    def _body_index(self, key):
        # insertion_scene bodies: 0=rectangle (dynamic), 1=slot (pinned)
        return 0 if key == 'rectangle' else 1

    @property
    def goal_dim(self):
        return 6

    # ------------------------------------------------------------------ reset
    def reset(self, key):
        cfg = self.cfg
        k_spawn, k_yaw, k_next = jax.random.split(key, 3)
        tip_init = jnp.asarray(self.tip_initial, F32)
        n = len(self.object_keys)
        xy = core.sample_block_positions(
            k_spawn, n, self.object_lower[:2], self.object_upper[:2],
            tip_init[:2], 0.0)[:, :2]
        yaws = jax.random.uniform(k_yaw, (n,), F32, -1.0, 1.0) * jnp.pi
        quats_env_order = quatm.yaw_quat_zyz(yaws)
        # scatter env-order objects into engine body slots
        body_pos = jnp.zeros((self.engine.nb, 3), F32)
        body_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], F32), (self.engine.nb, 1))
        for i, keyname in enumerate(self.object_keys):
            b = self._body_index(keyname)
            pos3 = jnp.concatenate([xy[i], jnp.full((1,), self.obj_z[keyname], F32)])
            body_pos = body_pos.at[b].set(pos3)
            body_quat = body_quat.at[b].set(quats_env_order[i])
        phys = self._reset_phys(body_pos, body_quat=body_quat)
        state = self._base_env_state(phys, k_next, jnp.zeros((6,), F32))
        state = state._replace(ee_target_rot=jnp.asarray(_DOWN_ZYZ))
        state = self._generate_goal(state)
        return state, self._get_obs(state)[0]

    # ------------------------------------------------------------------ goals
    def _generate_goal(self, state):
        """Goal = slot_target frame (slot link 3 = base_target_joint at
        (-0.03,0,0), the pocket centre; insertion/slot.urdf:133-137) with
        z = rectangle initial z (kuka_insertion_envs.py:25-30)."""
        b = self._body_index('slot')
        spos = state.phys.body_pos[b]
        squat = state.phys.body_quat[b]
        tgt = spos + quatm.rotate(squat, jnp.array([-0.03, 0.0, 0.0], F32))
        euler = quatm.quat_to_euler_zyz(squat)
        goal = jnp.concatenate([
            tgt[:2], jnp.full((1,), self.obj_z['rectangle'], F32), euler])
        return state._replace(desired_goal=goal)

    # ------------------------------------------------------------------- step
    def step(self, state: core.EnvState, action):
        cfg = self.cfg
        a = jnp.clip(jnp.asarray(action, F32), -1.0, 1.0)
        grip_ctrl = self._grip_ctrl_from_action(a)
        q_target, state = self._apply_arm_action(state, a)
        phys = self.engine.control_step(
            state.phys, self._controls(q_target, grip_ctrl))
        state = state._replace(phys=phys, steps=state.steps + 1)
        obs, state = self._get_obs(state)
        reward, achieved = core.binary_or_dense_reward(
            obs['achieved_goal'], obs['desired_goal'],
            cfg.distance_threshold, cfg.binary_reward)
        return state, obs, reward, achieved

    # ---------------------------------------------------- pallas phase hooks
    def step_decode_pre(self, state, action):
        """6-DoF decode without IK (vec wrapper batches IK with the rotation
        target from state.ee_target_rot)."""
        a = jnp.clip(jnp.asarray(action, F32), -1.0, 1.0)
        grip_ctrl = self._grip_ctrl_from_action(a)
        f_target = self._grip_target(grip_ctrl)
        ee_target = jnp.clip(state.ee_target + a[:3] * 0.01,
                             jnp.asarray(self.ee_lower, F32),
                             jnp.asarray(self.ee_upper, F32))
        ee_rot = state.ee_target_rot + a[3:6] * 0.05
        state = state._replace(ee_target=ee_target, ee_target_rot=ee_rot)
        return state, f_target

    def step_finish(self, state: core.EnvState):
        obs, state = self._get_obs(state)
        reward, achieved = core.binary_or_dense_reward(
            obs['achieved_goal'], obs['desired_goal'],
            self.cfg.distance_threshold, self.cfg.binary_reward)
        return state, obs, reward, achieved

    @property
    def supports_pallas(self):
        from pybullet_multigoal_gym_tpu.ops import pallas_multibody as PM
        return PM.supports_scene(self.engine.spec,
                                 ik_workspace=self.ik_workspace)

    def get_pallas_engine(self, interpret=None):
        from pybullet_multigoal_gym_tpu.ops.pallas_multibody import (
            PallasMultiBodyEngine)
        if getattr(self, '_pallas_engine', None) is None:
            self._pallas_engine = PallasMultiBodyEngine(
                self.engine.spec, solver_iters=self.engine.solver_iters,
                erp=self.engine.erp, slop=self.engine.slop,
                interpret=interpret, gripper=self.cfg.gripper,
                ik_workspace=self.ik_workspace)
        return self._pallas_engine

    # -------------------------------------------------------------------- obs
    def _get_obs(self, state: core.EnvState):
        """`kuka_insertion_base_env.py:142-208`."""
        cfg = self.cfg
        ph = state.phys
        rs = R.robot_state(ph.q, ph.qd, ph.fq, ph.fqd, grasping=True,
                           gripper=cfg.gripper,
                           ee_contact_force=ph.ee_contact_force)
        gripper_xyz = rs['gripper_xyz']
        fx = rs['ee_joint_force']

        state_vec = jnp.concatenate([
            gripper_xyz, rs['gripper_rpy'], rs['gripper_vel_xyz'],
            rs['gripper_vel_rpy'], rs['gripper_finger_vel'],
            rs['joint_poses'], fx])
        policy_state = jnp.concatenate([
            gripper_xyz, rs['gripper_rpy'], rs['joint_poses'], fx])
        if cfg.state_noise:
            key, sub = jax.random.split(state.key)
            noise = jax.random.normal(sub, policy_state.shape, F32) * 0.05
            policy_state = policy_state + noise
            state = state._replace(key=key)
        state_vec = jnp.concatenate([state_vec, rs['gripper_finger_closeness']])
        policy_state = jnp.concatenate([policy_state,
                                        rs['gripper_finger_closeness']])

        object_state = []
        achieved = []
        for i, keyname in enumerate(self.object_keys):
            b = self._body_index(keyname)
            xyz = ph.body_pos[b]
            euler = quatm.quat_to_euler_zyz(ph.body_quat[b])
            object_state += [xyz, euler]
            if i == self.goal_obj_idx:
                achieved += [xyz, euler]

        obs = {
            'observation': state_vec,
            'policy_state': policy_state,
            'auxiliary_task_state': jnp.concatenate(object_state),
            'achieved_goal': jnp.concatenate(achieved),
            'desired_goal': state.desired_goal,
            'subtask_rewards': self._compute_subtask_reward(state, gripper_xyz),
        }
        return obs, state

    def _compute_subtask_reward(self, state, gripper_xyz):
        """Dense pick_up / reach / insert shaped rewards
        (`kuka_insertion_base_env.py:210-254`)."""
        ph = state.phys
        thr = self.cfg.distance_threshold
        rb = self._body_index('rectangle')
        sb = self._body_index('slot')
        obj_xyz = ph.body_pos[rb]
        obj_euler = quatm.quat_to_euler_zyz(ph.body_quat[rb])
        # grasp_target frame: rectangle link 0 at +0.03 z local
        # (insertion/rectangle.urdf:34-38)
        grasp_xyz = obj_xyz + quatm.rotate(ph.body_quat[rb],
                                           jnp.array([0.0, 0.0, 0.03], F32))
        # slot_target frame = slot link 3 at (-0.03,0,0): the pocket centre
        # (insertion/slot.urdf:133-137), NOT the end bar at (-0.06,0,0)
        slot_xyz = ph.body_pos[sb] + quatm.rotate(
            ph.body_quat[sb], jnp.array([-0.03, 0.0, 0.0], F32))
        slot_euler = quatm.quat_to_euler_zyz(ph.body_quat[sb])

        d_pick = (jnp.linalg.norm(grasp_xyz - gripper_xyz)
                  + jnp.abs(0.15 - obj_xyz[2]))
        reach_t = slot_xyz.at[2].add(0.06)
        d_reach = (jnp.linalg.norm(obj_xyz - reach_t)
                   + jnp.linalg.norm(obj_euler - slot_euler))
        insert_t = slot_xyz.at[2].add(0.03)
        d_insert = (jnp.linalg.norm(obj_xyz - insert_t)
                    + jnp.linalg.norm(obj_euler - slot_euler))
        return {
            'pick_up': jnp.clip(-d_pick, -15.0, 0.0),
            'pick_up_done': d_pick < thr,
            'pick_up_desired_goal': jnp.concatenate([grasp_xyz,
                                                     jnp.full((1,), 0.15, F32)]),
            'pick_up_achieved_goal': jnp.concatenate([gripper_xyz,
                                                      obj_xyz[2:3]]),
            'reach': jnp.clip(-d_reach, -15.0, 0.0),
            'reach_done': d_reach < thr,
            'reach_desired_goal': jnp.concatenate([reach_t, slot_euler]),
            'reach_achieved_goal': jnp.concatenate([obj_xyz, obj_euler]),
            'insert': jnp.clip(-d_insert, -15.0, 0.0),
            'insert_done': d_insert < thr,
            'insert_desired_goal': jnp.concatenate([insert_t, slot_euler]),
            'insert_achieved_goal': jnp.concatenate([obj_xyz, obj_euler]),
        }
