"""Multi-block long-horizon family: BlockStack / BlockRearrange /
ChestPickAndPlace / ChestPush.

Functional re-implementation of `KukaBulletMultiBlockEnv` and its task envs
(`/root/reference/pybullet_multigoal_gym/envs/base_envs/kuka_multi_step_base_env.py`,
`envs/task_envs/kuka_multi_step_envs.py`) with identical observation/goal
layouts, curriculum bookkeeping, task-decomposition sub-goals and the chest
door hold-open logic — all as pure state transitions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.envs import core
from pybullet_multigoal_gym_tpu.envs import robot as R
from pybullet_multigoal_gym_tpu.envs.single_step import KukaEnvBase

F32 = jnp.float32

# door keypoint offsets in the door joint frame, per door kind
# (chest_*.urdf keypoint joints): left, right, handle
_KEYPOINTS = {
    'up_sliding': np.array([[0.05, 0.07, 0.0], [0.05, -0.07, 0.0],
                            [0.07, 0.065, 0.0]], np.float32),
    'front_sliding': np.array([[0.0, -0.07, 0.0], [0.0, 0.07, 0.0],
                               [0.01, 0.0, 0.04]], np.float32),
    'revolving': np.array([[0.05, 0.07, 0.0], [0.05, -0.07, 0.0],
                           [0.105, 0.0, 0.0]], np.float32),
}


def update_curriculum_prob(prob, counts, nc: int, per: float):
    """Vectorised curriculum-probability staircase: the branch-free port of
    `kuka_multi_step_base_env.py:350-379` (validated against a straight-line
    NumPy oracle in tests/test_oracles.py). ``per`` =
    num_goals_to_generate // num_curriculum."""
    finished = counts >= per
    half = counts >= (per / 2)
    prob = jnp.where(finished, 0.0, prob)
    # first curriculum
    first_split = half[0] & ~finished[0]
    prob = prob.at[0].set(jnp.where(first_split, 0.5, prob[0]))
    prob = prob.at[1].set(jnp.where(first_split, 0.5, prob[1]))
    # middle curricula
    for i in range(1, nc - 1):
        cond = finished[i - 1] & ~finished[i]
        prob = prob.at[i].set(jnp.where(cond & half[i], 0.5,
                                        jnp.where(cond, 1.0, prob[i])))
        prob = prob.at[i + 1].set(jnp.where(cond & half[i], 0.5,
                                            prob[i + 1]))
    # last curriculum
    prob = prob.at[-1].set(jnp.where(finished[-2], 1.0, prob[-1]))
    return prob


class KukaMultiBlockEnv(KukaEnvBase):

    def __init__(self, cfg: EnvConfig):
        super().__init__(cfg)
        self.nb = cfg.num_block
        self.nc = cfg.num_curriculum
        # chest shifts the object spawn bounds (kuka_multi_step_base_env.py:102-105)
        if cfg.has_chest:
            self.object_lower = self.object_lower.copy()
            self.object_upper = self.object_upper.copy()
            self.object_lower[0] += 0.05
            self.object_upper[0] += 0.05
            self.object_lower[1] -= 0.05
            self.object_upper[1] += 0.05
        self.block_size = 0.03
        self.num_goals_per_curriculum = cfg.num_goals_to_generate // self.nc
        if cfg.has_chest:
            # chest centre target (kuka_multi_step_envs.py:256-263, 405-410)
            cb = np.asarray(self.engine.chest_base, np.float32)
            self.chest_center = np.array([cb[0] + 0.05, cb[1], 0.175], np.float32)
            self.chest_top = np.array([cb[0] + 0.05, cb[1], 0.3], np.float32)
            self.door_opened = cfg.chest_door_opened_state

    def _build_engine(self):
        return D.Engine(S.multi_step_scene(self.cfg.num_block,
                                           self.cfg.has_chest,
                                           self.cfg.chest_door),
                        gripper=self.cfg.gripper,
                        ik_workspace=self.ik_workspace)

    @property
    def goal_dim(self):
        cfg = self.cfg
        gd = 3 * cfg.num_block
        if cfg.has_chest:
            gd += 1
        if cfg.grip_informed_goal:
            gd += 3
            if cfg.grasping:
                gd += 1
        return gd

    # ------------------------------------------------------------------ reset
    def reset(self, key, curr=None):
        """``curr``: optional (curriculum_prob, goals_generated,
        curriculum_update) carried over from the previous episode — the
        reference keeps these as instance attributes that persist across
        resets (`kuka_multi_step_base_env.py:133-145`); the vec-env wrapper
        and the gym adapter thread them through here."""
        cfg = self.cfg
        k_spawn, k_goal, k_next = jax.random.split(key, 3)
        tip_init = jnp.asarray(self.tip_initial, F32)
        block_pos = core.sample_block_positions(
            k_spawn, self.nb, self.object_lower[:2], self.object_upper[:2],
            tip_init[:2], 0.175)
        phys = self._reset_phys(block_pos)
        state = self._base_env_state(phys, k_next, jnp.zeros((self.goal_dim,), F32),
                                     spawn_body_pos=block_pos, nc=self.nc)
        if curr is not None:
            state = state._replace(curriculum_prob=curr[0],
                                   goals_generated=curr[1],
                                   curriculum_update=curr[2])
        state = self._generate_goal(state, block_pos, new_target=True,
                                    key=k_goal)
        obs, state = self._get_obs(state)
        return state, obs

    # ------------------------------------------------------------------- step
    def step(self, state: core.EnvState, action):
        cfg = self.cfg
        a = jnp.clip(jnp.asarray(action, F32), -1.0, 1.0)
        grip_ctrl = (self._grip_ctrl_from_action(a) if cfg.grasping
                     else self.gripper_abs_joint_limit)
        q_target, state = self._apply_arm_action(state, a)
        door_on = state.door_hold_open
        door_target = jnp.full((), self.door_opened if cfg.has_chest else 0.0, F32)
        phys = self.engine.control_step(
            state.phys, self._controls(q_target, grip_ctrl,
                                       door_motor_on=door_on,
                                       door_target=door_target))
        state = state._replace(phys=phys, steps=state.steps + 1)
        obs, state = self._get_obs(state)
        reward, achieved = core.binary_or_dense_reward(
            obs['achieved_goal'], obs['desired_goal'],
            cfg.distance_threshold, cfg.binary_reward)
        return state, obs, reward, achieved

    # ---------------------------------------------------- pallas phase hooks
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

    # ----------------------------------------------------------- sub-goal API
    def set_sub_goal(self, state: core.EnvState, sub_goal_ind):
        """`kuka_multi_step_base_env.py:159-181`: pin the desired goal to one
        of the decomposition sub-goals (index -1 wraps to the final goal)."""
        ind = jnp.asarray(sub_goal_ind, jnp.int32)
        wrapped = jnp.where(ind < 0, ind + self.cfg.num_steps, ind)
        goal = state.sub_goals[wrapped]
        return state._replace(sub_goal_ind=ind, desired_goal=goal)

    # -------------------------------------------------------------------- obs
    def _get_obs(self, state: core.EnvState):
        """Mirrors `kuka_multi_step_base_env.py:255-336`. Returns (obs, state)
        because goal regeneration and door hold-open mutate env state."""
        cfg = self.cfg
        ph = state.phys
        rs = R.robot_state(ph.q, ph.qd, ph.fq, ph.fqd, cfg.grasping,
                           gripper=cfg.gripper)
        gripper_xyz = rs['gripper_xyz']
        gvel = rs['gripper_vel_xyz']
        grpy_vel = rs['gripper_vel_rpy']

        block_xyzs = ph.body_pos                   # (NB,3)
        block_quat_xyzw = quatm.wxyz_to_xyzw(ph.body_quat)
        rel_xyz = gripper_xyz[None] - block_xyzs
        rel_vel = gvel[None] - ph.body_linvel
        rel_vel_rpy = grpy_vel[None] - ph.body_angvel
        # per-block critic state: [xyz, rel_xyz, quat(xyzw), rel_vel, rel_vel_rpy]
        # (the reference's `block_rpy` is actually the base quaternion,
        # kuka_multi_step_base_env.py:266-276)
        block_states = jnp.concatenate(
            [block_xyzs, rel_xyz, block_quat_xyzw, rel_vel, rel_vel_rpy],
            axis=-1).reshape(-1)
        policy_block_states = rel_xyz.reshape(-1)

        state_vec = jnp.concatenate([
            gripper_xyz, rs['gripper_finger_closeness'], gvel,
            rs['gripper_finger_vel'], block_states])
        policy_state = jnp.concatenate([
            gripper_xyz, rs['gripper_finger_closeness'], policy_block_states])

        if cfg.joint_control:
            state_vec = jnp.concatenate([rs['joint_poses'], state_vec])
            policy_state = jnp.concatenate([rs['joint_poses'], policy_state])

        achieved = [block_xyzs.reshape(-1)]

        if cfg.has_chest:
            door_q, door_qd = ph.door_q, ph.door_qd
            kp_state = self._keypoint_state(door_q, door_qd)
            state_vec = jnp.concatenate([state_vec, door_q[None], door_qd[None],
                                         kp_state])
            policy_state = jnp.concatenate([policy_state, door_q[None], kp_state])
            achieved = [door_q[None]] + achieved
            # hold the door open once the robot has opened it
            # (kuka_multi_step_base_env.py:297-298)
            hold = jnp.abs(self.door_opened - door_q) <= 0.01
            state = state._replace(door_hold_open=state.door_hold_open | hold)

        if cfg.grip_informed_goal:
            achieved.append(gripper_xyz)
            if cfg.grasping:
                achieved.append(rs['gripper_finger_closeness'])

        state_vec = jnp.clip(state_vec, -5.0, 5.0)
        policy_state = jnp.clip(policy_state, -5.0, 5.0)
        achieved_goal = jnp.concatenate(achieved)

        # regenerate goal from current block positions (new_target=False,
        # kuka_multi_step_base_env.py:311) and re-pin any active sub-goal
        state = self._generate_goal(state, block_xyzs, new_target=False,
                                    gripper_xyz=gripper_xyz,
                                    finger_closeness=rs['gripper_finger_closeness'])
        if cfg.task_decomposition:
            state = self.set_sub_goal(state, state.sub_goal_ind)

        obs = {'observation': state_vec,
               'policy_state': policy_state,
               'achieved_goal': achieved_goal,
               'desired_goal': state.desired_goal}
        return obs, state

    def _keypoint_state(self, door_q, door_qd):
        """Chest door keypoint positions+velocities (`chest.py:47-58`)."""
        eng = self.engine
        kps = jnp.asarray(_KEYPOINTS[self.cfg.chest_door])
        dpos, drot = eng.door_frame(door_q)
        pts = dpos + quatm.rotate(drot[None], kps)
        vel = eng.door_point_jac(pts, door_q) * door_qd
        parts = [jnp.concatenate([pts[i], vel[i]]) for i in range(3)]
        if self.cfg.chest_door == 'revolving':
            rpy = quatm.quat_to_euler_xyz(drot)
            omega = jnp.asarray(eng.door_axis) * door_qd
            parts = [jnp.concatenate([pts[i], vel[i], rpy, omega])
                     for i in range(3)]
        return jnp.concatenate(parts)

    # ------------------------------------------------------------- curriculum
    def _draw_curriculum_level(self, state, key):
        """level ~ Categorical(curriculum_prob) + bookkeeping
        (`kuka_multi_step_envs.py:124-148`, `_update_curriculum_prob`)."""
        level = jax.random.choice(key, self.nc, p=state.curriculum_prob)
        goal_step = level * 25 + 50      # base_curriculum_episode_steps=50
        counts = state.goals_generated.at[level].add(
            jnp.where(state.curriculum_update, 1.0, 0.0))
        prob = jnp.where(state.curriculum_update,
                         self._update_curriculum_prob(state.curriculum_prob,
                                                      counts),
                         state.curriculum_prob)
        return level, state._replace(curriculum_level=level.astype(jnp.int32),
                                     goals_generated=counts,
                                     curriculum_prob=prob,
                                     curriculum_goal_step=goal_step.astype(jnp.int32))

    def _update_curriculum_prob(self, prob, counts):
        return update_curriculum_prob(prob, counts, self.nc,
                                      self.num_goals_per_curriculum)

    # ------------------------------------------------------------------ goals
    def _generate_goal(self, state, block_poses, new_target, key=None,
                       gripper_xyz=None, finger_closeness=None):
        task = self.cfg.task
        if gripper_xyz is None:
            gripper_xyz = jnp.asarray(self.tip_rest)
        if finger_closeness is None:
            finger_closeness = jnp.zeros((1,), F32)
        if task == 'block_stack':
            return self._goal_block_stack(state, block_poses, new_target, key)
        if task == 'block_rearrange':
            return self._goal_block_rearrange(state, block_poses, new_target, key)
        if task == 'chest_pick_and_place':
            return self._goal_chest(state, block_poses, new_target, key,
                                    gripper_xyz, finger_closeness,
                                    door_open=0.10, pick=True)
        return self._goal_chest(state, block_poses, new_target, key,
                                gripper_xyz, finger_closeness,
                                door_open=0.12, pick=False)

    # -- BlockStack ----------------------------------------------------------
    def _goal_block_stack(self, state, block_poses, new_target, key):
        cfg = self.cfg
        nb = self.nb
        if new_target:
            k_ord, k_base, k_cur = jax.random.split(key, 3)
            order = jax.random.permutation(k_ord, nb).astype(jnp.int32)

            def valid(xy):
                d = jnp.linalg.norm(xy[None] - block_poses[:, :2], axis=-1)
                return jnp.all(d > 0.08)
            base_xy = core.rejection_uniform(
                k_base, self.target_lower[:2], self.target_upper[:2], valid)
            levels = jnp.arange(nb, dtype=F32)
            target_xyzs = jnp.concatenate(
                [jnp.tile(base_xy, (nb, 1)),
                 (0.175 + self.block_size * levels)[:, None]], axis=-1)
            state = state._replace(block_order=order, target_xyzs=target_xyzs)
            if cfg.use_curriculum:
                _, state = self._draw_curriculum_level(state, k_cur)
        order = state.block_order
        target_xyzs = state.target_xyzs

        if cfg.use_curriculum:
            level = state.curriculum_level
            # desired[order[i]] = target[i] if i <= level else pose[order[i]]
            take_target = jnp.arange(nb) <= level
            desired_by_order = jnp.where(take_target[:, None],
                                         target_xyzs, block_poses[order])
            desired = jnp.zeros((nb, 3), F32).at[order].set(desired_by_order)
            parts = [desired.reshape(-1)]
            if cfg.grip_informed_goal:
                parts += [target_xyzs[level], jnp.array([0.03], F32)]
        else:
            desired = jnp.zeros((nb, 3), F32).at[order].set(target_xyzs)
            parts = [desired.reshape(-1)]
            if cfg.grip_informed_goal:
                parts += [target_xyzs[-1], jnp.array([0.03], F32)]
            if cfg.task_decomposition:
                state = state._replace(sub_goals=self._stack_subgoals(
                    block_poses, target_xyzs, order))
        return state._replace(desired_goal=jnp.concatenate(parts))

    def _stack_subgoals(self, block_poses, target_xyzs, order):
        """`KukaBlockStackEnv._generate_subgoals` (kuka_multi_step_envs.py:89-122)."""
        cfg = self.cfg
        nb = self.nb
        subs = []
        placed = block_poses[order]     # row i = pose of block order[i]
        for k in range(nb):
            # poses with the first `j` ordered blocks at their targets
            def goal_vec(j, grip, width):
                take = jnp.arange(nb) < j
                by_order = jnp.where(take[:, None], target_xyzs, placed)
                blocks = jnp.zeros((nb, 3), F32).at[order].set(by_order)
                return jnp.concatenate([blocks.reshape(-1), grip,
                                        jnp.array([width], F32)])
            if cfg.grip_informed_goal:
                subs.append(goal_vec(k, block_poses[order[k]], 0.03))
                subs.append(goal_vec(k + 1, target_xyzs[k], 0.03))
            else:
                take = jnp.arange(nb) <= k
                by_order = jnp.where(take[:, None], target_xyzs, placed)
                blocks = jnp.zeros((nb, 3), F32).at[order].set(by_order)
                subs.append(blocks.reshape(-1))
        return jnp.stack(subs)

    # -- BlockRearrange ------------------------------------------------------
    def _goal_block_rearrange(self, state, block_poses, new_target, key):
        cfg = self.cfg
        nb = self.nb
        if new_target:
            k_t, k_cur, k_pick = jax.random.split(key, 3)

            def place(carry, k):
                placed, count = carry

                def valid(xy):
                    d_t = jnp.linalg.norm(xy[None] - placed, axis=-1)
                    ok_t = jnp.all((d_t > 0.06) | (jnp.arange(nb) >= count))
                    d_b = jnp.linalg.norm(xy[None] - block_poses[:, :2], axis=-1)
                    return ok_t & jnp.all(d_b > 0.06)
                xy = core.rejection_uniform(
                    k, self.target_lower[:2], self.target_upper[:2], valid)
                return (placed.at[count].set(xy), count + 1), xy

            keys = jax.random.split(k_t, nb)
            (xys, _), _ = jax.lax.scan(
                place, (jnp.zeros((nb, 2), F32) + 1e6, 0), keys)
            target_xyzs = jnp.concatenate(
                [xys, jnp.full((nb, 1), 0.175, F32)], axis=-1)
            state = state._replace(target_xyzs=target_xyzs)
            if cfg.use_curriculum:
                level, state = self._draw_curriculum_level(state, k_cur)
                # move a random subset of level+1 blocks
                # (kuka_multi_step_envs.py:208-212)
                scores = jax.random.uniform(k_pick, (nb,))
                ranks = jnp.argsort(jnp.argsort(scores))
                mask = ranks < (level + 1)
                state = state._replace(ind_block_to_move=mask)
        target_xyzs = state.target_xyzs
        if cfg.use_curriculum:
            mask = state.ind_block_to_move
            tidx = jnp.clip(jnp.cumsum(mask.astype(jnp.int32)) - 1, 0, nb - 1)
            desired = jnp.where(mask[:, None], target_xyzs[tidx], block_poses)
        else:
            desired = target_xyzs
        return state._replace(desired_goal=desired.reshape(-1))

    # -- Chest tasks ---------------------------------------------------------
    def _goal_chest(self, state, block_poses, new_target, key,
                    gripper_xyz, finger_closeness, door_open, pick):
        cfg = self.cfg
        nb = self.nb
        center = jnp.asarray(self.chest_center)
        top = jnp.asarray(self.chest_top)
        if new_target and cfg.use_curriculum:
            k_cur, k_pick = jax.random.split(key)
            level, state = self._draw_curriculum_level(state, k_cur)
            scores = jax.random.uniform(k_pick, (nb,))
            ranks = jnp.argsort(jnp.argsort(scores))
            mask = ranks < level            # size = level blocks to move
            state = state._replace(ind_block_to_move=mask)

        door_goal = jnp.array([door_open], F32)
        if cfg.use_curriculum:
            mask = state.ind_block_to_move
            blocks = jnp.where(mask[:, None], center[None], block_poses)
            parts = [door_goal, blocks.reshape(-1)]
            if cfg.grip_informed_goal:
                level0 = state.curriculum_level == 0
                if pick:
                    gpos = jnp.where(level0, gripper_xyz, top)
                    width = jnp.where(level0, finger_closeness,
                                      jnp.array([0.06], F32))
                    parts += [gpos, width]
                else:
                    goalp = center.at[0].add(0.03)
                    gpos = jnp.where(level0, gripper_xyz, goalp)
                    parts += [gpos]
        else:
            blocks = jnp.tile(center, (nb, 1))
            parts = [door_goal, blocks.reshape(-1)]
            if cfg.grip_informed_goal:
                if pick:
                    parts += [top, jnp.array([0.06], F32)]
                else:
                    parts += [center.at[0].add(0.03)]
            if cfg.task_decomposition:
                state = state._replace(sub_goals=self._chest_subgoals(
                    block_poses, gripper_xyz, finger_closeness,
                    door_open, pick))
        return state._replace(desired_goal=jnp.concatenate(parts))

    def _chest_subgoals(self, block_poses, gripper_xyz, finger_closeness,
                        door_open, pick):
        """`_generate_subgoals` of the chest tasks
        (kuka_multi_step_envs.py:287-340, 435-481)."""
        cfg = self.cfg
        nb = self.nb
        center = jnp.asarray(self.chest_center)
        top = jnp.asarray(self.chest_top)
        door = jnp.array([door_open], F32)
        subs = []

        def blocks_done(j, extra_mask=None):
            take = jnp.arange(nb) < j
            if extra_mask is not None:
                take = take | extra_mask
            return jnp.where(take[:, None], center[None], block_poses)

        # sub-goal 1: open the door, everything else as spawned. The
        # reference appends the gripper tip (and closeness, for pick) even
        # when grip_informed_goal=False (kuka_multi_step_envs.py:292-296,
        # 443-446), which makes the first sub-goal a different length from
        # the rest — unusable ragged output; here the gripper entries follow
        # grip_informed_goal so every sub-goal has the goal dimension.
        first = [door, block_poses.reshape(-1)]
        if cfg.grip_informed_goal:
            first += ([gripper_xyz, finger_closeness] if pick
                      else [gripper_xyz])
        subs.append(jnp.concatenate(first))

        if cfg.grip_informed_goal:
            for k in range(nb):
                onehot = jnp.arange(nb) == k
                if pick:
                    subs.append(jnp.concatenate(
                        [door, blocks_done(k).reshape(-1),
                         block_poses[k], jnp.array([0.03], F32)]))
                    moved = blocks_done(k).at[k].set(top)
                    subs.append(jnp.concatenate(
                        [door, moved.reshape(-1), top, jnp.array([0.03], F32)]))
                    subs.append(jnp.concatenate(
                        [door, blocks_done(k, onehot).reshape(-1), top,
                         jnp.array([0.06], F32)]))
                else:
                    reach_g = block_poses[k].at[0].add(0.03)
                    subs.append(jnp.concatenate(
                        [door, blocks_done(k).reshape(-1), reach_g]))
                    push_g = center.at[0].add(0.03)
                    subs.append(jnp.concatenate(
                        [door, blocks_done(k, onehot).reshape(-1), push_g]))
        else:
            for k in range(nb):
                subs.append(jnp.concatenate(
                    [door, blocks_done(k + 1).reshape(-1)]))
        return jnp.stack(subs)
