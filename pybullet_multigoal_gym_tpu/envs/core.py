"""Shared env-layer machinery: state pytree, goal sampling, reward kernel.

The reference's template-method contract (`BaseBulletMGEnv`,
`/root/reference/pybullet_multigoal_gym/envs/base_envs/base_env.py:254-271`)
maps here onto pure functions: every family implements
``reset(key) -> (EnvState, obs)`` and ``step(state, action) -> (state, obs,
reward, goal_achieved)``; TimeLimit and auto-reset live in the vectorised
wrapper (envs/vec_env.py).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pybullet_multigoal_gym_tpu.ops.dynamics import PhysicsState

F32 = jnp.float32


class EnvState(NamedTuple):
    """Complete per-env state. All reference Python statefulness
    (ee_target accumulators `kuka.py:209`, curriculum counters
    `kuka_multi_step_base_env.py:140`, sub-goal index) lives here so rollouts
    are pure and checkpointable."""
    phys: PhysicsState
    key: jnp.ndarray                 # per-env PRNG key
    steps: jnp.ndarray               # () int32 episode step counter
    ee_target: jnp.ndarray           # (3,)
    ee_target_rot: jnp.ndarray       # (3,) ZYZ euler accumulator (insertion)
    joint_target: jnp.ndarray        # (7,)
    desired_goal: jnp.ndarray        # (GD,)
    # multi-step extras (zero-sized/scalar defaults elsewhere)
    sub_goals: jnp.ndarray           # (num_steps, GD)
    sub_goal_ind: jnp.ndarray        # () int32, -1 = none
    target_xyzs: jnp.ndarray         # (NB, 3) last_target_poses
    block_order: jnp.ndarray         # (NB,) int32 stacking order
    curriculum_level: jnp.ndarray    # () int32
    ind_block_to_move: jnp.ndarray   # (NB,) bool
    curriculum_prob: jnp.ndarray     # (NC,)
    goals_generated: jnp.ndarray     # (NC,) per-curriculum goal counters
    curriculum_update: jnp.ndarray   # () bool
    curriculum_goal_step: jnp.ndarray  # () int32
    door_hold_open: jnp.ndarray      # () bool
    # per-reset spawn poses (for goal images / subgoal generation)
    spawn_body_pos: jnp.ndarray      # (NB, 3)
    # goal image rendered once per episode (families whose desired_goal is
    # episode-constant: single_step, insertion); None = render per step.
    # The reference also renders goal images only at reset
    # (kuka_single_step_base_env.py:150-188).
    desired_goal_img: jnp.ndarray = None


def binary_or_dense_reward(achieved, desired, threshold, binary):
    """Reward kernel: r = -(d > delta) or -d; matches
    `kuka_single_step_base_env.py:237-244` exactly."""
    d = jnp.linalg.norm(achieved - desired, axis=-1)
    not_achieved = d > threshold
    if binary:
        reward = -not_achieved.astype(F32)
    else:
        reward = -d
    return reward, ~not_achieved


def uniform(key, lower, upper):
    lower = jnp.asarray(lower, F32)
    upper = jnp.asarray(upper, F32)
    return jax.random.uniform(key, lower.shape, F32, lower, upper)


def rejection_uniform(key, lower, upper, valid_fn, n_trials: int = 24):
    """Fixed-trip masked rejection sampling: the jit-safe analogue of the
    reference's unbounded ``while`` loops (`kuka_single_step_base_env.py:109,
    132`, `kuka_multi_step_base_env.py:226-234`). Draws ``n_trials``
    candidates, returns the first valid one (or the last candidate if none
    validate - geometrically negligible probability)."""
    lower = jnp.asarray(lower, F32)
    upper = jnp.asarray(upper, F32)
    cands = jax.random.uniform(key, (n_trials,) + lower.shape, F32, lower, upper)
    valid = jax.vmap(valid_fn)(cands)
    # first valid index; if none, argmax returns 0 - fall back to last trial
    idx = jnp.argmax(valid)
    idx = jnp.where(jnp.any(valid), idx, n_trials - 1)
    return cands[idx]


def sample_block_positions(key, n_block, lower_xy, upper_xy, avoid_xy, z,
                           min_dist=0.06, n_trials: int = 24):
    """Sequentially place ``n_block`` objects, each >= min_dist (xy) from all
    previously placed ones and from ``avoid_xy`` (the gripper start).
    Mirrors `kuka_multi_step_base_env.py:223-240`."""
    def place(carry, k):
        placed, count = carry

        def valid(xy):
            d_prev = jnp.linalg.norm(xy - placed, axis=-1)
            ok_prev = jnp.all((d_prev > min_dist) |
                              (jnp.arange(n_block) >= count))
            ok_grip = jnp.linalg.norm(xy - avoid_xy) > min_dist
            return ok_prev & ok_grip

        xy = rejection_uniform(k, lower_xy, upper_xy, valid, n_trials)
        placed = placed.at[count].set(xy)
        return (placed, count + 1), xy

    keys = jax.random.split(key, n_block)
    (placed, _), _ = jax.lax.scan(place, (jnp.zeros((n_block, 2), F32) + 1e6, 0),
                                  keys)
    return jnp.concatenate([placed, jnp.full((n_block, 1), z, F32)], axis=-1)
