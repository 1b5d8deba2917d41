"""Push-primitive shape-assembly family: KukaPushAssembleEnv / KukaPushReachEnv.

Functional re-implementation of `KukaBulletPrimitiveEnv`
(`/root/reference/pybullet_multigoal_gym/envs/base_envs/kuka_shape_assemble_base_env.py`)
and its task envs (`envs/task_envs/kuka_shape_assemble_envs.py`).

One env action executes a whole push primitive
(`robots/kuka.py:303-312`): teleport the arm to rest, then 4 IK waypoints,
each followed by 20 sim calls (= 400 substeps of 2 ms), then teleport back.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.maths import quat as quatm
from pybullet_multigoal_gym_tpu.model import kuka_model as KM
from pybullet_multigoal_gym_tpu.ops import dynamics as D
from pybullet_multigoal_gym_tpu.ops import ik
from pybullet_multigoal_gym_tpu.ops import scene as S
from pybullet_multigoal_gym_tpu.envs import core
from pybullet_multigoal_gym_tpu.envs.single_step import KukaEnvBase

F32 = jnp.float32

# workspace range for the push primitive
# (kuka_shape_assemble_base_env.py:70-73)
WORKSPACE_UPPER_XY = np.array([-0.405, 0.175], np.float32)
WORKSPACE_LOWER_XY = np.array([-0.755, -0.175], np.float32)
RESOLUTION = 0.0015625          # 0.35 / 224 m per pixel
PUSH_LENGTH = 0.1               # kuka.py:87
NUM_ANGLES = 20                 # kuka.py:90


class KukaPrimitiveEnv(KukaEnvBase):

    def __init__(self, cfg: EnvConfig):
        super().__init__(cfg)
        rng = WORKSPACE_UPPER_XY - WORKSPACE_LOWER_XY
        # int((range + 1e-4) // resolution) (kuka.py:92-94)
        self.action_map_width = int((rng[0] + 0.0001) // RESOLUTION)
        self.action_map_height = int((rng[1] + 0.0001) // RESOLUTION)
        self.object_keys = cfg.manipulated_object_keys
        self.goal_obj_idx = self.object_keys.index(cfg.goal_object_key)
        self.obj_z = 0.035      # object_initial_pos (kuka_shape_assemble_base_env.py:55-61)

    def _build_engine(self):
        return D.Engine(S.shape_assemble_scene(self.cfg.manipulated_object_keys),
                        gripper=self.cfg.gripper,
                        ik_workspace=self.ik_workspace)

    @property
    def goal_dim(self):
        return 6 if self.cfg.orientation_informed_goal else 3

    # ------------------------------------------------------------------ reset
    def reset(self, key):
        cfg = self.cfg
        k_spawn, k_yaw, k_goal, k_next = jax.random.split(key, 4)
        tip_init = jnp.asarray(self.tip_initial, F32)
        n = len(self.object_keys)
        pos = core.sample_block_positions(
            k_spawn, n, self.object_lower[:2], self.object_upper[:2],
            tip_init[:2], self.obj_z)
        yaws = jax.random.uniform(k_yaw, (n,), F32, -1.0, 1.0) * jnp.pi
        quats = quatm.yaw_quat_zyz(yaws)
        phys = self._reset_phys(pos, body_quat=quats)
        state = self._base_env_state(phys, k_next,
                                     jnp.zeros((self.goal_dim,), F32),
                                     spawn_body_pos=pos)
        state = self._generate_goal(state, k_goal)
        return state, self._get_obs(state)[0]

    # ------------------------------------------------------------------ goals
    def _generate_goal(self, state, key):
        if self.cfg.task == 'primitive_push_assemble':
            # goal = slot_target frame (slot link 2, offset (-0.03,0,0) in the
            # slot base frame; kuka_shape_assemble_envs.py:25-30)
            slot_idx = self.object_keys.index('slot')
            spos = state.phys.body_pos[slot_idx]
            squat = state.phys.body_quat[slot_idx]
            tgt = spos + quatm.rotate(squat, jnp.array([-0.03, 0.0, 0.0], F32))
            euler = quatm.quat_to_euler_zyz(squat)
            goal = jnp.concatenate([tgt, euler])
        else:
            # random pose >=0.06 away + random yaw
            # (kuka_shape_assemble_envs.py:76-91)
            k_pos, k_yaw = jax.random.split(key)
            obj_pos = state.phys.body_pos[self.goal_obj_idx]

            def valid(g):
                return jnp.linalg.norm(g - obj_pos) > 0.06
            tgt = core.rejection_uniform(k_pos, self.target_lower,
                                         self.target_upper, valid)
            tgt = tgt.at[2].set(self.obj_z)
            yaw = jax.random.uniform(k_yaw, (), F32, -1.0, 1.0) * jnp.pi
            euler = quatm.quat_to_euler_zyz(quatm.yaw_quat_zyz(yaw[None])[0])
            goal = jnp.concatenate([tgt, euler])
        return state._replace(desired_goal=goal)

    # ------------------------------------------------------------------- step
    def step_decode_waypoints(self, state: core.EnvState, action):
        """Action -> the 4 push-primitive EE waypoints (kuka.py:174-202)."""
        cfg = self.cfg
        a = jnp.asarray(action, F32)
        lower = jnp.asarray(WORKSPACE_LOWER_XY)
        upper = jnp.asarray(WORKSPACE_UPPER_XY)
        rng = upper - lower
        if cfg.primitive == 'discrete_push':
            # (angle_idx, px, py) (kuka.py:174-177)
            start_x = a[1] * RESOLUTION + lower[0]
            start_y = a[2] * RESOLUTION + lower[1]
            angle = 2.0 * jnp.pi / NUM_ANGLES * a[0]
        else:
            # (x, y, angle) in [-1,1] (kuka.py:178-181)
            a = jnp.clip(a, -1.0, 1.0)
            start_x = lower[0] + rng[0] * (a[0] + 1.0) / 2.0
            start_y = lower[1] + rng[1] * (a[1] + 1.0) / 2.0
            angle = a[2] * jnp.pi / 2.0
        end_x = jnp.clip(start_x + jnp.cos(angle) * PUSH_LENGTH,
                         lower[0], upper[0])
        end_y = jnp.clip(start_y + jnp.sin(angle) * PUSH_LENGTH,
                         lower[1], upper[1])
        z_hi = cfg.table_surface_z + 0.1
        z_lo = cfg.table_surface_z + 0.01
        return jnp.stack([
            jnp.stack([start_x, start_y, z_hi]),
            jnp.stack([start_x, start_y, z_lo]),
            jnp.stack([end_x, end_y, z_lo]),
            jnp.stack([end_x, end_y, z_hi])])

    def step_finish(self, state: core.EnvState):
        if self.cfg.regenerate_goal_when_step:
            state = self._generate_goal(state, state.key)
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

    def get_pallas_ik_primitive(self, interpret=None):
        from pybullet_multigoal_gym_tpu.ops.pallas_ik import PallasIK
        if getattr(self, '_pallas_ik_prim', None) is None:
            # waypoint jumps are ~0.1 m (cold-ish): more iterations than the
            # warm-started per-step IK
            self._pallas_ik_prim = PallasIK(num_iters=16, interpret=interpret,
                                            gripper=self.cfg.gripper)
        return self._pallas_ik_prim

    # sub-targets per waypoint leg: one IK hop per 20 sim calls lets the
    # joint-space servo path bow ~2 cm off the 10 cm stroke line; the bowed
    # pad then overlaps the pushed object LATERALLY and the solver resolves
    # that overlap sideways, slapping the object off the push line. The
    # reference executes plain hops (kuka.py:303-312), but its evident
    # intent is a straight sweep — sub-targets every 4 sim calls keep the
    # commanded tip on the line without changing the 80-sim-call budget.
    INTERP_K = 5

    def _interp_waypoints(self, wps):
        """(..., 4, 3) -> (..., 4*K, 3): straight-line sub-targets."""
        K = self.INTERP_K
        tip0 = jnp.broadcast_to(jnp.asarray(self.tip_rest, F32),
                                wps[..., :1, :].shape)
        prev = jnp.concatenate([tip0, wps[..., :-1, :]], axis=-2)
        frac = (jnp.arange(K, dtype=F32) + 1.0) / K            # (K,)
        seg = prev[..., :, None, :] + (wps - prev)[..., :, None, :] \
            * frac[:, None]                                    # (...,4,K,3)
        return seg.reshape(seg.shape[:-3] + (4 * K, 3))

    def execute_primitive_batched(self, phys, wps, num_envs):
        """Batched execute_primitive (kuka.py:303-312) on the Pallas engines:
        teleport to rest, 4x (20 sim calls along the interpolated leg),
        teleport back. ``wps``: (N, 4, 3). Shared by the vec wrapper so the
        XLA `step` below and the Pallas path cannot drift."""
        rest = jnp.broadcast_to(jnp.asarray(self.rest_pose), (num_envs, 7))
        zeros7 = jnp.zeros((num_envs, 7), F32)
        f_open = jax.vmap(self._grip_target)(
            jnp.full((num_envs,), self.gripper_abs_joint_limit, F32))
        pik = self.get_pallas_ik_primitive()
        peng = self.get_pallas_engine()
        phys = phys._replace(q=rest, qd=zeros7)
        sub = self._interp_waypoints(wps)                      # (N, 4K, 3)
        for w in range(sub.shape[1]):
            q_t = pik.solve(sub[:, w], q_init=phys.q, rest_pose=rest)
            phys = peng.control_step(
                phys, D.Controls(
                    q_target=q_t, f_target=f_open,
                    door_motor_on=jnp.zeros((num_envs,), bool),
                    door_target=jnp.zeros((num_envs,), F32)),
                n_sim_calls=20 // self.INTERP_K)
        return phys._replace(q=rest, qd=zeros7)

    def step(self, state: core.EnvState, action):
        waypoints = self.step_decode_waypoints(state, action)

        # execute_primitive (kuka.py:303-312): teleport to rest, drive through
        # the waypoints (20 sim calls each), teleport back to rest
        phys = state.phys._replace(q=jnp.asarray(self.rest_pose),
                                   qd=jnp.zeros(7, F32))

        def run_waypoint(ph, wp):
            q_t = ik.solve(wp, q_init=ph.q,
                           rest_pose=jnp.asarray(self.rest_pose),
                           gripper=self.cfg.gripper)
            ctrl = self._controls(q_t, self.gripper_abs_joint_limit)
            ph = self.engine.control_step(
                ph, ctrl, n_sim_calls=20 // self.INTERP_K)
            return ph, None

        phys, _ = jax.lax.scan(run_waypoint, phys,
                               self._interp_waypoints(waypoints))
        phys = phys._replace(q=jnp.asarray(self.rest_pose), qd=jnp.zeros(7, F32))
        state = state._replace(phys=phys, steps=state.steps + 1)
        state, obs, reward, achieved = self.step_finish(state)
        return state, obs, reward, achieved

    # -------------------------------------------------------------------- obs
    def _get_obs(self, state: core.EnvState):
        """`kuka_shape_assemble_base_env.py:145-202`: object poses with ZYZ
        Euler angles; achieved goal = goal object pose."""
        parts = []
        achieved = []
        for i, keyname in enumerate(self.object_keys):
            xyz = state.phys.body_pos[i]
            euler = quatm.quat_to_euler_zyz(state.phys.body_quat[i])
            parts += [xyz, euler]
            if i == self.goal_obj_idx:
                achieved.append(xyz)
                if self.cfg.orientation_informed_goal:
                    achieved.append(euler)
        state_vec = jnp.concatenate(parts)
        obs = {'observation': state_vec,
               'policy_state': state_vec,
               'achieved_goal': jnp.concatenate(achieved),
               'desired_goal': state.desired_goal}
        return obs, state
