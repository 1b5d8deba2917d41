"""Single-step task family: Reach / Push / PickAndPlace / Slide.

Functional re-implementation of `KukaBulletMGEnv`
(`/root/reference/pybullet_multigoal_gym/envs/base_envs/kuka_single_step_base_env.py`)
with the exact observation/goal/reward contracts, as pure
``reset(key)``/``step(state, action)`` functions that jit, vmap and shard.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import fk, ik
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.envs import core
from pybullet_multigoal_gym_tpu.envs import robot as R

F32 = jnp.float32


class KukaEnvBase:
    """Shared construction: scene, engine, workspace bounds, rest pose."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg
        # EE/primitive control only ever feeds the servo IK solutions for
        # tip targets inside the workspace box, so the engines can cull
        # statically unreachable arm-contact lanes (ops/lane_cull.py);
        # joint-space control can command any configuration -> keep all
        self.ik_workspace = not cfg.joint_control
        # tip start (kuka.py:35-38)
        tip_init = np.array([-0.52, 0.0, 0.25])
        if cfg.end_effector_start_on_table:
            tip_init[2] = cfg.table_surface_z + 0.001
        self.tip_initial = tip_init
        # EE workspace clamp (kuka.py:40-41)
        self.ee_upper = np.array([-0.37, 0.20, 0.55])
        self.ee_lower = np.array([-0.67, -0.20, cfg.table_surface_z])
        # object / target bounds (kuka.py:43-51)
        obj_r, tgt_r = cfg.obj_range, cfg.target_range
        self.object_lower = tip_init - obj_r
        self.object_lower[0] += 0.03
        self.object_upper = tip_init + obj_r
        self.object_upper[0] -= 0.03
        self.target_lower = tip_init - tgt_r
        self.target_lower[0] += 0.03
        self.target_lower[2] = self.ee_lower[2]
        self.target_upper = tip_init + tgt_r
        self.target_upper[0] -= 0.03
        if cfg.table_type == 'long_table':
            # slide target range shift (kuka_single_step_base_env.py:66-69)
            self.target_lower[0] -= 0.4
            self.target_upper[0] -= 0.4
        # gripper joint limit surface (kuka.py:63-73)
        self.gripper_abs_joint_limit = (KM.ROBOTIQ_JOINT_LIMIT
                                        if cfg.gripper == 'robotiq85'
                                        else KM.FINGER_LIMIT)
        self.gripper_grasp_block_state = (KM.ROBOTIQ_GRASP_BLOCK_STATE
                                          if cfg.gripper == 'robotiq85'
                                          else KM.PARALLEL_JAW_GRASP_BLOCK_STATE)
        # engines consume the gripper's own joint coordinates directly
        # (prismatic metres for the jaw, Robotiq closure radians); kept for
        # the render layer's approximate finger visuals.
        self.finger_scale = (KM.FINGER_LIMIT / KM.ROBOTIQ_JOINT_LIMIT
                             if cfg.gripper == 'robotiq85' else 1.0)
        # rest pose: reference re-derives it by IK from the canonical pose
        # (kuka.py:158-160)
        rest = ik.solve(jnp.asarray(tip_init, F32),
                        q_init=jnp.asarray(KM.KUKA_REST_POSE, F32),
                        gripper=cfg.gripper)
        self.rest_pose = np.asarray(rest, np.float32)
        tip_rest, _ = fk.tip_pose(jnp.asarray(self.rest_pose),
                                  gripper=cfg.gripper)
        self.tip_rest = np.asarray(tip_rest, np.float32)

        self.engine = self._build_engine()
        self.block_z = self._block_z()

    # -- family hooks --------------------------------------------------------
    def _build_engine(self) -> D.Engine:
        raise NotImplementedError

    def _block_z(self) -> float:
        return 0.175

    # -- common pieces -------------------------------------------------------
    def _grip_target(self, grip_ctrl):
        """Both finger joints track the same grip value (the reference's
        mimic multipliers reduce to this for the pad DoFs, kuka.py:65-73)."""
        return jnp.full((2,), 1.0, F32) * grip_ctrl

    def _controls(self, q_target, grip_ctrl, door_motor_on=None,
                  door_target=None):
        if door_motor_on is None:
            door_motor_on = jnp.zeros((), bool)
            door_target = jnp.zeros((), F32)
        return D.Controls(q_target=q_target,
                          f_target=self._grip_target(grip_ctrl),
                          door_motor_on=door_motor_on,
                          door_target=door_target)

    def _apply_arm_action(self, state: core.EnvState, a):
        """EE-space / joint-space action decoding (kuka.py:204-220)."""
        cfg = self.cfg
        if cfg.joint_control:
            joint_target = state.joint_target + a[:7] * 0.05
            q_target = joint_target
            ee_target = state.ee_target
            ee_rot = state.ee_target_rot
        else:
            ee_target = jnp.clip(state.ee_target + a[:3] * 0.01,
                                 jnp.asarray(self.ee_lower, F32),
                                 jnp.asarray(self.ee_upper, F32))
            if cfg.end_effector_rotation_control:
                from pybullet_multigoal_gym_tpu.maths import quat as quatm
                ee_rot = state.ee_target_rot + a[3:6] * 0.05
                tq = quatm.euler_zyz_to_quat(ee_rot)
                q_target = ik.solve(ee_target, target_quat=tq,
                                    q_init=state.phys.q,
                                    rest_pose=jnp.asarray(self.rest_pose),
                                    gripper=cfg.gripper)
            else:
                ee_rot = state.ee_target_rot
                q_target = ik.solve(ee_target, q_init=state.phys.q,
                                    rest_pose=jnp.asarray(self.rest_pose),
                                    gripper=cfg.gripper)
            joint_target = state.joint_target
        return q_target, state._replace(ee_target=ee_target,
                                        ee_target_rot=ee_rot,
                                        joint_target=joint_target)

    def _grip_ctrl_from_action(self, a):
        # (a[-1]+1) * limit/2 (kuka.py:169-172)
        return (a[-1] + 1.0) * (self.gripper_abs_joint_limit / 2.0)

    def step_decode_pre(self, state, action):
        """Decode WITHOUT the IK solve — the vec wrapper batches IK through
        the Pallas kernel (ops/pallas_ik.py) outside the vmap."""
        cfg = self.cfg
        a = jnp.clip(jnp.asarray(action, F32), -1.0, 1.0)
        grip_ctrl = (self._grip_ctrl_from_action(a) if cfg.grasping
                     else self.gripper_abs_joint_limit)
        f_target = self._grip_target(grip_ctrl)
        if cfg.joint_control:
            state = state._replace(joint_target=state.joint_target
                                   + a[:7] * 0.05)
        else:
            ee_target = jnp.clip(state.ee_target + a[:3] * 0.01,
                                 jnp.asarray(self.ee_lower, F32),
                                 jnp.asarray(self.ee_upper, F32))
            state = state._replace(ee_target=ee_target)
        return state, f_target

    def get_pallas_ik(self, interpret=None):
        from pybullet_multigoal_gym_tpu.ops.pallas_ik import PallasIK
        if getattr(self, '_pallas_ik', None) is None:
            # in-step IK is warm-started (the EE target moves <= 1 cm per
            # action, kuka.py:208-220) — 8 DLS iterations reach the same
            # <1e-6 m residual Bullet's residualThreshold=1e-5 early-exit
            # does; the reference's 40 is a cold-start worst-case cap
            self._pallas_ik = PallasIK(num_iters=8, interpret=interpret,
                                       gripper=self.cfg.gripper)
        return self._pallas_ik

    def _reset_phys(self, body_pos, body_quat=None):
        eng = self.engine
        # fingers reset TO the joint limit, i.e. fully closed — the reference
        # does set_finger_joint_state(gripper_abs_joint_limit) (kuka.py:161)
        st = eng.init_state(q=jnp.asarray(self.rest_pose),
                            body_pos=body_pos, body_quat=body_quat,
                            fq=self.gripper_abs_joint_limit)
        return st

    def _base_env_state(self, phys, key, desired_goal, spawn_body_pos=None,
                        nc: int = 1):
        nb = self.engine.nb
        if spawn_body_pos is None:
            spawn_body_pos = phys.body_pos
        tip_rest = jnp.asarray(self.tip_rest)
        return core.EnvState(
            phys=phys, key=key, steps=jnp.zeros((), jnp.int32),
            ee_target=tip_rest,
            ee_target_rot=jnp.zeros((3,), F32),
            joint_target=jnp.asarray(self.rest_pose),
            desired_goal=desired_goal,
            sub_goals=jnp.zeros((max(self.cfg.num_steps, 1),
                                 desired_goal.shape[-1]), F32),
            sub_goal_ind=jnp.full((), -1, jnp.int32),
            target_xyzs=jnp.zeros((nb, 3), F32),
            block_order=jnp.arange(nb, dtype=jnp.int32),
            curriculum_level=jnp.zeros((), jnp.int32),
            ind_block_to_move=jnp.zeros((nb,), bool),
            curriculum_prob=jnp.concatenate(
                [jnp.ones((1,), F32), jnp.zeros((max(nc, 1) - 1,), F32)]),
            goals_generated=jnp.zeros((max(nc, 1),), F32),
            curriculum_update=jnp.zeros((), bool),
            curriculum_goal_step=jnp.full((), 50, jnp.int32),
            door_hold_open=jnp.zeros((), bool),
            spawn_body_pos=spawn_body_pos)


class KukaSingleStepEnv(KukaEnvBase):
    """Reach / Push / PickAndPlace / Slide
    (`envs/task_envs/kuka_single_step_envs.py`)."""

    def _build_engine(self):
        return D.Engine(S.single_step_scene(self.cfg.has_obj,
                                            self.cfg.table_type),
                        gripper=self.cfg.gripper,
                        ik_workspace=self.ik_workspace)

    def _block_z(self):
        # object_initial_pos['block'][2] (kuka_single_step_base_env.py:50-56)
        return 0.170 if self.cfg.table_type == 'long_table' else 0.175

    @property
    def goal_dim(self):
        return 3

    # ------------------------------------------------------------------ reset
    def reset(self, key):
        cfg = self.cfg
        k_obj, k_goal, k_grasp, k_next = jax.random.split(key, 4)
        tip_init = jnp.asarray(self.tip_initial, F32)

        if cfg.has_obj:
            # object >=0.1 m from the gripper start (xy)
            def valid(xy):
                return jnp.linalg.norm(xy - tip_init[:2]) > 0.1
            obj_xy = core.rejection_uniform(
                k_obj, self.object_lower[:2], self.object_upper[:2], valid)
            obj_xyz = jnp.concatenate([obj_xy, jnp.full((1,), self.block_z, F32)])
            body_pos = obj_xyz[None]
            center = obj_xyz
        else:
            body_pos = jnp.zeros((self.engine.nb, 3), F32)
            center = tip_init

        # goal: >=0.1 m from center (kuka_single_step_base_env.py:132-136)
        def goal_valid(g):
            return jnp.linalg.norm(g - center) > 0.1
        goal = core.rejection_uniform(
            k_goal, self.target_lower, self.target_upper, goal_valid)
        if not cfg.target_in_the_air:
            goal = goal.at[2].set(self.block_z)
        elif cfg.grasping:
            # 50%: target on the table (kuka_single_step_base_env.py:140-143)
            on_table = jax.random.uniform(k_grasp) >= 0.5
            goal = goal.at[2].set(jnp.where(on_table, self.block_z, goal[2]))

        phys = self._reset_phys(body_pos)
        state = self._base_env_state(phys, k_next, goal)
        return state, self._get_obs(state)

    # ------------------------------------------------------------------- step
    # The step is split into decode -> physics -> finish so the vectorised
    # wrapper can swap the physics phase for the batched Pallas kernel
    # (ops/pallas_engine.py) while decode/finish stay vmapped XLA.
    def step_decode(self, state: core.EnvState, action):
        cfg = self.cfg
        a = jnp.clip(jnp.asarray(action, F32), -1.0, 1.0)
        grip_ctrl = (self._grip_ctrl_from_action(a) if cfg.grasping
                     else self.gripper_abs_joint_limit)
        q_target, state = self._apply_arm_action(state, a)
        return state, q_target, self._grip_target(grip_ctrl)

    def step_finish(self, state: core.EnvState):
        cfg = self.cfg
        obs = self._get_obs(state)
        reward, achieved = core.binary_or_dense_reward(
            obs['achieved_goal'], obs['desired_goal'],
            cfg.distance_threshold, cfg.binary_reward)
        return state, obs, reward, achieved

    @property
    def supports_pallas(self):
        # single free body + plane + fingers, or the no-object reach scene
        return True

    def get_pallas_engine(self, interpret=None):
        from pybullet_multigoal_gym_tpu.ops.pallas_engine import PallasEngine
        if getattr(self, '_pallas_engine', None) is None:
            self._pallas_engine = PallasEngine(
                self.engine.spec, solver_iters=self.engine.solver_iters,
                erp=self.engine.erp, slop=self.engine.slop,
                interpret=interpret, gripper=self.cfg.gripper,
                ik_workspace=self.ik_workspace)
        return self._pallas_engine

    def step(self, state: core.EnvState, action):
        state, q_target, f_target = self.step_decode(state, action)
        phys = self.engine.control_step(
            state.phys, D.Controls(
                q_target=q_target, f_target=f_target,
                door_motor_on=jnp.zeros((), bool),
                door_target=jnp.zeros((), F32)))
        state = state._replace(phys=phys, steps=state.steps + 1)
        state, obs, reward, achieved = self.step_finish(state)
        return state, obs, reward, achieved

    # -------------------------------------------------------------------- obs
    def _get_obs(self, state: core.EnvState):
        """Mirrors `kuka_single_step_base_env.py:193-235` field-for-field."""
        cfg = self.cfg
        ph = state.phys
        rs = R.robot_state(ph.q, ph.qd, ph.fq, ph.fqd, cfg.grasping,
                           gripper=cfg.gripper)
        gripper_xyz = rs['gripper_xyz']
        policy_state = state_vec = gripper_xyz
        achieved_goal = gripper_xyz

        if cfg.has_obj:
            block_xyz = ph.body_pos[0]
            block_rel_xyz = gripper_xyz - block_xyz
            block_vel_xyz = ph.body_linvel[0]
            block_vel_rpy = ph.body_angvel[0]
            block_rel_vel_xyz = rs['gripper_vel_xyz'] - block_vel_xyz
            block_rel_vel_rpy = rs['gripper_vel_rpy'] - block_vel_rpy
            achieved_goal = block_xyz
            state_vec = jnp.concatenate([
                gripper_xyz, block_xyz, rs['gripper_finger_closeness'],
                block_rel_xyz, rs['gripper_vel_xyz'], rs['gripper_finger_vel'],
                block_rel_vel_xyz, block_rel_vel_rpy])
            policy_state = jnp.concatenate([
                gripper_xyz, rs['gripper_finger_closeness'], block_rel_xyz])

        if cfg.joint_control:
            state_vec = jnp.concatenate([rs['joint_poses'], state_vec])
            policy_state = jnp.concatenate([rs['joint_poses'], policy_state])

        return {'observation': state_vec,
                'policy_state': policy_state,
                'achieved_goal': achieved_goal,
                'desired_goal': state.desired_goal}
