"""Device-mesh construction and env-axis sharding helpers.

The reference has no distributed machinery at all (one process, one Bullet
client — `/root/reference/pybullet_multigoal_gym/envs/base_envs/base_env.py:203-220`);
the TPU build's scaling axis is the env batch: thousands of lockstep env
instances sharded over a 1-D ``('env',)`` mesh. XLA inserts the ICI
collectives for any cross-env reduction (metrics, learner grads) — no
hand-written communication.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = 'env'


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the env axis.

    Args:
      n_devices: take the first n of ``jax.devices()`` (default: all).
      devices: explicit device list (overrides n_devices).
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the env batch."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, scalars, PRNG roots)."""
    return NamedSharding(mesh, P())


def shard_env_tree(tree, mesh: Mesh):
    """Place every leaf of an env-batched pytree with its leading axis sharded
    over the mesh's env axis."""
    s = env_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
