"""Headline benchmark: env-steps/s, state-based push, 4096 vectorized envs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md); the comparison
point is the driver's north star — >=1M aggregate env-steps/s on a v4-8
(4 chips) for state-based reach/push, i.e. 250k env-steps/s per chip.
`vs_baseline` is measured throughput / 250k. One env step = 100 physics
substeps of 2 ms (matching the reference's 5 stepSimulation x 20 numSubSteps,
`robots/kuka.py:223-225`, `envs/base_envs/base_env.py:215-219`).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_BASELINE = 250_000.0


def multichip(args):
    """Aggregate env-steps/s over an N-device ('env',) mesh via the sharded
    rollout driver (the >=1M aggregate north star, BASELINE.md:33).

    On single-chip hosts, pass --force-devices N to bench the sharded path
    over N virtual CPU devices instead (sets
    --xla_force_host_platform_device_count before jax initialises)."""
    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.parallel import make_mesh, ShardedRollout

    mesh = make_mesh()
    n_dev = mesh.devices.size
    num_envs = args.num_envs - args.num_envs % n_dev
    r = ShardedRollout(EnvConfig(task=args.task), num_envs=num_envs,
                       mesh=mesh)
    key = jax.random.PRNGKey(0)
    state = r.reset(key)
    # warmup/compile (host fetch forces remote completion)
    state, metrics = r.rollout(state, None, jax.random.fold_in(key, 1),
                               args.warmup)
    np.asarray(metrics.mean_reward)

    t0 = time.perf_counter()
    state, metrics = r.rollout(state, None, jax.random.fold_in(key, 2),
                               args.steps)
    np.asarray(metrics.mean_reward)
    dt = time.perf_counter() - t0

    steps_per_s = num_envs * args.steps / dt
    print(json.dumps({
        'metric': 'aggregate_env_steps_per_s_%s_%d_%ddev'
                  % (args.task, num_envs, n_dev),
        'value': round(steps_per_s, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(steps_per_s / (PER_CHIP_BASELINE * n_dev), 4),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--task', default='push')
    ap.add_argument('--num-envs', type=int, default=4096)
    ap.add_argument('--num-block', type=int, default=5)
    ap.add_argument('--image', type=int, default=0,
                    help='image-observation mode: render size (84 / 128)')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--warmup', type=int, default=3)
    ap.add_argument('--multichip', action='store_true',
                    help='aggregate over all devices via ShardedRollout')
    ap.add_argument('--force-devices', type=int, default=0,
                    help='virtual CPU device count (multichip testing)')
    args = ap.parse_args()

    if args.force_devices:
        import os
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + ' --xla_force_host_platform_device_count=%d'
                                   % args.force_devices)
        jax.config.update('jax_platforms', 'cpu')
    if args.multichip:
        return multichip(args)

    from pybullet_multigoal_gym_tpu.config import EnvConfig
    from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv

    kw = {}
    if args.task.startswith('primitive'):
        kw['primitive'] = 'discrete_push'
    if args.task in ('block_stack', 'block_rearrange', 'chest_push',
                     'chest_pick_and_place'):
        kw['num_block'] = args.num_block
    if args.image:
        # BASELINE config #5: image observations + goal images
        # (base_env.py:140-168); rgbd obs via depth_image
        kw.update(image_observation=True, goal_image=True, depth_image=True,
                  render_width=args.image, render_height=args.image)
    venv = VecMGEnv(EnvConfig(task=args.task, **kw), num_envs=args.num_envs)
    key = jax.random.PRNGKey(0)
    state, obs = venv.reset(key)

    if venv.cfg.primitive == 'discrete_push':
        w, h = venv.core.action_map_width, venv.core.action_map_height

        def random_actions(k):
            u = jax.random.uniform(k, (args.num_envs, 3))
            return jnp.stack([u[:, 0] * 20, u[:, 1] * w, u[:, 2] * h],
                             axis=-1).astype(jnp.float32)
    else:
        def random_actions(k):
            return jax.random.uniform(
                k, (args.num_envs, venv.cfg.action_dim), jnp.float32,
                -1.0, 1.0)

    acts = jax.jit(random_actions)

    # warmup / compile. NOTE: a host data fetch (np.asarray), not just
    # block_until_ready, is required to actually wait on remote TPU backends.
    for i in range(args.warmup):
        state, obs, reward, done, info = venv.step(state, acts(jax.random.fold_in(key, i)))
    np.asarray(reward)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, obs, reward, done, info = venv.step(
            state, acts(jax.random.fold_in(key, 100 + i)))
    np.asarray(reward)
    dt = time.perf_counter() - t0

    steps_per_s = args.num_envs * args.steps / dt
    n_chips = max(len(set(d.id for d in jax.devices())), 1)
    tag = '%s_%d' % (args.task, args.num_envs)
    if args.image:
        tag += '_img%d' % args.image
    print(json.dumps({
        'metric': 'env_steps_per_s_per_chip_' + tag,
        'value': round(steps_per_s / n_chips, 1),
        'unit': 'env-steps/s/chip',
        'vs_baseline': round(steps_per_s / n_chips / PER_CHIP_BASELINE, 4),
    }))


if __name__ == '__main__':
    main()
