"""Sharded rollout driver: `lax.scan` episodes over a device mesh.

The reference steps one env per Python process; here a whole episode for the
full sharded env batch is one compiled program. Metrics (success rate, mean
reward, steps/s numerators) are reduced on-device — under jit + sharding XLA
lowers the means below to `psum` over ICI.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.parallel import mesh as M


class RolloutMetrics(NamedTuple):
    success_rate: jnp.ndarray    # () fraction of envs with goal_achieved at episode end
    mean_reward: jnp.ndarray     # () mean per-step reward over batch x time
    env_steps: jnp.ndarray       # () total env steps simulated


class ShardedRollout:
    """Rollout driver for a `VecMGEnv` sharded over a 1-D env mesh.

    Usage::

        mesh = make_mesh()
        r = ShardedRollout(EnvConfig(task='push'), num_envs=4096, mesh=mesh)
        state = r.reset(jax.random.PRNGKey(0))
        state, metrics = r.rollout(state, policy_fn, policy_params, n_steps=50)
    """

    def __init__(self, cfg: EnvConfig, num_envs: int, mesh: Optional[Mesh] = None,
                 policy_fn: Optional[Callable] = None):
        if mesh is None:
            mesh = M.make_mesh()
        assert num_envs % mesh.devices.size == 0, \
            'num_envs must divide evenly over the mesh'
        self.mesh = mesh
        self.cfg = cfg
        self.num_envs = num_envs
        # unjitted core fns: jit once here, with shardings
        self.venv = VecMGEnv(cfg, num_envs=num_envs, auto_reset=True, jit=False)
        env_s = M.env_sharding(mesh)
        rep_s = M.replicated(mesh)
        self._policy_fn = policy_fn

        state_shard = jax.tree_util.tree_map(lambda _: env_s,
                                             self._state_struct())

        self._reset = jax.jit(self.venv._reset, in_shardings=rep_s,
                              out_shardings=(state_shard, None))
        self._step = jax.jit(self.venv._step,
                             in_shardings=(state_shard, env_s),
                             out_shardings=(state_shard, None, None, None, None))

        def rollout_fn(state, params, key, n_steps):
            def body(carry, _):
                state, key = carry
                key, sub = jax.random.split(key)
                if policy_fn is None:
                    act = jax.random.uniform(
                        sub, (self.num_envs, cfg.action_dim), jnp.float32,
                        -1.0, 1.0)
                else:
                    obs = jax.vmap(self.venv.core._get_obs)(state)
                    act = policy_fn(params, obs, sub)
                state, obs, reward, done, info = self.venv._step(state, act)
                return (state, key), (reward, done, info['goal_achieved'])

            (state, _), (rewards, dones, achieved) = jax.lax.scan(
                body, (state, key), None, length=n_steps)
            # terminal success: achieved at the step where done fired
            final_success = jnp.sum(
                jnp.sum(achieved * dones, axis=0) /
                jnp.maximum(jnp.sum(dones, axis=0), 1)) / self.num_envs
            metrics = RolloutMetrics(
                success_rate=final_success,
                mean_reward=jnp.mean(rewards),
                env_steps=jnp.asarray(n_steps * self.num_envs, jnp.int32))
            return state, metrics

        self._rollout = jax.jit(rollout_fn, static_argnums=(3,),
                                in_shardings=(state_shard, rep_s, rep_s),
                                donate_argnums=(0,))

    def _state_struct(self):
        return jax.eval_shape(
            lambda k: self.venv._reset(k)[0], jax.random.PRNGKey(0))

    # ------------------------------------------------------------------- api
    def reset(self, key):
        state, obs = self._reset(key)
        return state

    def step(self, state, action):
        return self._step(state, action)

    def rollout(self, state, params, key, n_steps: int):
        return self._rollout(state, params, key, n_steps)
