"""Single-env, numpy-in/numpy-out adapter with the classic Gym surface.

Gives users of the reference (`env = pmg.make_env(...)`; `obs = env.reset()`;
`obs, reward, done, info = env.step(action)`) a drop-in object backed by the
vectorised TPU engine (one env instance, still jitted). Also carries the
reference's auxiliary public API: `set_sub_goal`,
`activate_curriculum_update`, `deactivate_curriculum_update`,
`step_demonstrator` (`kuka_multi_step_base_env.py:113-181`)."""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.utils import spaces
from pybullet_multigoal_gym_tpu.utils.demonstrator import (
    StepDemonstrator, default_demonstrations)


def _to_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class GymStyleEnv:
    """One logical env with the reference's gym-era API."""

    def __init__(self, cfg: EnvConfig, seed: int = 0):
        # no auto-reset: classic gym semantics (user calls reset())
        self.venv = VecMGEnv(cfg, num_envs=1, auto_reset=False)
        self.cfg = cfg
        self.env_id = self.venv.env_id
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self.action_space = self.venv.action_space
        self.observation_space = None
        self._max_episode_steps = cfg.max_episode_steps
        if cfg.task_decomposition:
            self.step_demonstrator = StepDemonstrator(
                default_demonstrations(cfg.num_steps))

        self._set_sub_goal = None
        if cfg.family == 'multi_step':
            core = self.venv.core
            self._set_sub_goal = jax.jit(
                lambda s, i: jax.vmap(core.set_sub_goal, in_axes=(0, None))(s, i))

    # --------------------------------------------------------------- gym api
    def seed(self, seed=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        return [seed]

    def reset(self, test: bool = False):
        self._key, sub = jax.random.split(self._key)
        curr = None
        if self._state is not None and self.cfg.family == 'multi_step':
            s = self._state
            curr = (s.curriculum_prob, s.goals_generated, s.curriculum_update)
        self._state, obs = self.venv.reset(sub, curr)
        obs = {k: (v[0] if not isinstance(v, dict) else
                   {kk: vv[0] for kk, vv in v.items()})
               for k, v in _to_np(obs).items()}
        if self.observation_space is None:
            self.observation_space = spaces.Dict({
                ('state' if k == 'observation' and not self.cfg.image_observation
                 else k): spaces.Box.unbounded(np.asarray(v).shape)
                for k, v in obs.items() if not isinstance(v, dict)})
        return obs

    def step(self, action):
        assert self._state is not None, 'call reset() before step()'
        a = jnp.asarray(np.asarray(action, np.float32))[None]
        self._state, obs, reward, done, info = self.venv.step(self._state, a)
        obs = {k: (v[0] if not isinstance(v, dict) else
                   {kk: vv[0] for kk, vv in _to_np(v).items()})
               for k, v in _to_np(obs).items()}
        info = {'goal_achieved': bool(np.asarray(info['goal_achieved'])[0])}
        # env-level done is always False; TimeLimit truncates (base_env.py:138)
        return obs, float(np.asarray(reward)[0]), bool(np.asarray(done)[0]), info

    def render(self, mode='human', camera_id=0):
        from pybullet_multigoal_gym_tpu.render import raster
        if mode == 'human':
            # reference warns and returns: GUI rendering is a construction-
            # time choice there (base_env.py:143-145); here it does not exist
            import warnings
            warnings.warn('render(mode="human") does nothing in the TPU '
                          'build; use mode="rgb_array" and inspect the array')
            return np.array([])
        assert self._state is not None, 'call reset() before render()'
        img = raster.render_state(self.venv.core, self._state, mode=mode,
                                  camera_id=camera_id)
        return np.asarray(jax.tree_util.tree_map(lambda x: x[0], img))

    def close(self):
        self._state = None

    @property
    def dt(self):
        return 0.002 * 20

    # ------------------------------------------------- reference extras
    def set_sub_goal(self, sub_goal_ind):
        if not self.cfg.task_decomposition:
            import warnings
            warnings.warn(
                'The set_sub_goal() method should only be called when using '
                'task decomposition,\nIt does nothing and returns None when '
                'task_decomposition is False.')
            return None
        self._state = self._set_sub_goal(self._state, int(sub_goal_ind))
        return np.asarray(self._state.desired_goal[0])

    def activate_curriculum_update(self):
        self._set_curriculum_update(True)

    def deactivate_curriculum_update(self):
        self._set_curriculum_update(False)

    def _set_curriculum_update(self, value: bool):
        if not self.cfg.use_curriculum:
            import warnings
            warnings.warn('This method should not be called while not using '
                          'curriculum.')
            return
        flags = jnp.full_like(self._state.curriculum_update, value)
        self._state = self._state._replace(curriculum_update=flags)
