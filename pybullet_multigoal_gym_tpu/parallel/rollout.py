"""Sharded rollout driver: `shard_map` over the env mesh, `lax.scan` episodes.

The reference steps one env per Python process; here a whole episode for the
full sharded env batch is one compiled program. The step is mapped over the
1-D ``('env',)`` mesh with `shard_map`: each device runs the vectorised env
on its LOCAL shard (which keeps the fused Pallas physics kernel valid — a
`pallas_call` is a per-device program and must not be split by the SPMD
partitioner), and metrics reduce over ICI with `psum`/`pmean`.
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    # jax >= 0.8: public API; the replication check kwarg is `check_vma`
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.parallel import mesh as M


class RolloutMetrics(NamedTuple):
    success_rate: jnp.ndarray    # () fraction of episodes ending achieved
    mean_reward: jnp.ndarray     # () mean per-step reward over batch x time
    env_steps: jnp.ndarray       # () total env steps simulated


class ShardedRollout:
    """Rollout driver for a vectorised env sharded over a 1-D env mesh.

    Usage::

        mesh = make_mesh()
        r = ShardedRollout(EnvConfig(task='push'), num_envs=4096, mesh=mesh)
        state = r.reset(jax.random.PRNGKey(0))
        state, metrics = r.rollout(state, None, jax.random.PRNGKey(1), 50)
    """

    def __init__(self, cfg: EnvConfig, num_envs: int, mesh: Optional[Mesh] = None,
                 policy_fn: Optional[Callable] = None,
                 use_pallas: Optional[bool] = None):
        if mesh is None:
            mesh = M.make_mesh()
        ndev = mesh.devices.size
        assert num_envs % ndev == 0, 'num_envs must divide over the mesh'
        self.mesh = mesh
        self.cfg = cfg
        self.num_envs = num_envs
        self.n_local = num_envs // ndev
        # each device runs the env on its local shard
        self.venv = VecMGEnv(cfg, num_envs=self.n_local, auto_reset=True,
                             jit=False, use_pallas=use_pallas)
        self.policy_fn = policy_fn

        env_spec = P(M.ENV_AXIS)
        rep = P()
        state_spec = jax.tree_util.tree_map(lambda _: env_spec,
                                            self._state_struct())
        obs_spec = jax.tree_util.tree_map(lambda _: env_spec,
                                          self._obs_struct())

        @partial(shard_map, mesh=mesh, in_specs=(rep,),
                 out_specs=(state_spec, obs_spec), check_rep=False)
        def reset_fn(key):
            key = jax.random.fold_in(key, jax.lax.axis_index(M.ENV_AXIS))
            return self.venv._reset(key)

        def rollout_fn(state, params, key, n_steps):
            @partial(shard_map, mesh=mesh,
                     in_specs=(state_spec, rep, rep),
                     out_specs=(state_spec, rep), check_rep=False)
            def run(state, params, key):
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(M.ENV_AXIS))

                def body(carry, _):
                    state, key = carry
                    key, sub = jax.random.split(key)
                    if self.policy_fn is None:
                        act = jax.random.uniform(
                            sub, (self.n_local, cfg.action_dim), jnp.float32,
                            -1.0, 1.0)
                    else:
                        obs = self._local_obs(state)
                        act = self.policy_fn(params, obs, sub)
                    state, obs, reward, done, info = self.venv._step(state, act)
                    return (state, key), (reward, done, info['goal_achieved'])

                (state, _), (rewards, dones, achieved) = jax.lax.scan(
                    body, (state, key), None, length=n_steps)
                # fraction of finished episodes that ended goal_achieved
                finished = jnp.maximum(jnp.sum(dones), 1)
                succ = jnp.sum(achieved * dones) / finished
                metrics = RolloutMetrics(
                    success_rate=jax.lax.pmean(succ, M.ENV_AXIS),
                    mean_reward=jax.lax.pmean(jnp.mean(rewards), M.ENV_AXIS),
                    env_steps=jax.lax.psum(
                        jnp.asarray(n_steps * self.n_local, jnp.int32),
                        M.ENV_AXIS))
                return state, metrics

            # params/key replicated; key folded per-device inside
            return run(state, params, key)

        self._reset = jax.jit(reset_fn)
        self._rollout = jax.jit(rollout_fn, static_argnums=(3,),
                                donate_argnums=(0,))

    # ---------------------------------------------------------------- helpers
    def _state_struct(self):
        return jax.eval_shape(lambda k: self.venv._reset(k)[0],
                              jax.random.PRNGKey(0))

    def _obs_struct(self):
        return jax.eval_shape(lambda k: self.venv._reset(k)[1],
                              jax.random.PRNGKey(0))

    def _local_obs(self, state):
        return jax.vmap(self.venv.core._get_obs)(state) \
            if self.cfg.family == 'single_step' else \
            jax.vmap(lambda s: self.venv.core._get_obs(s)[0])(state)

    # ------------------------------------------------------------------- api
    def reset(self, key):
        state, obs = self._reset(key)
        return state

    def rollout(self, state, params, key, n_steps: int):
        return self._rollout(state, params, key, n_steps)
