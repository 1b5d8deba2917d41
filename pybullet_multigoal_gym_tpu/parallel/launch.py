"""Multi-host launcher: `jax.distributed` initialisation + global env mesh.

SURVEY.md §7 layer 8 / §2.4: the reference is strictly single-process (one
Bullet client, `base_env.py:203-220`); the TPU build scales the env batch
over a pod slice. This module is the entry point a multi-host job runs on
every host BEFORE any jax computation:

    from pybullet_multigoal_gym_tpu.parallel import launch
    launch.initialize()                       # TPU pods: auto-detected
    mesh = launch.global_env_mesh()           # 1-D ('env',) over ALL chips
    rollout = ShardedRollout(cfg, num_envs, mesh=mesh)

On Cloud TPU the coordinator/process topology is auto-detected; elsewhere
(CPU fleets, tests) pass coordinator_address/num_processes/process_id
explicitly. Collectives ride ICI within a slice and DCN across slices — XLA
partitions them from the mesh, nothing here is transport-specific.

Tested without a cluster via multi-process CPU backends
(tests/test_multihost.py): N processes x M virtual devices each form a
global N*M-device mesh, exactly the mechanism a v4 pod slice uses.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from pybullet_multigoal_gym_tpu.parallel.mesh import ENV_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None):
    """Initialise the jax distributed runtime (idempotent per process).

    With no arguments, relies on the cloud auto-detection (TPU pods).
    Returns (process_index, process_count)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    if local_device_ids is not None:
        kwargs['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def global_env_mesh() -> Mesh:
    """1-D ('env',) mesh over every device of every participating host."""
    return Mesh(np.asarray(jax.devices()), (ENV_AXIS,))


def process_local_batch(num_envs_global: int) -> int:
    """This host's share of a globally even env batch."""
    n_dev = jax.device_count()
    assert num_envs_global % n_dev == 0, (num_envs_global, n_dev)
    return (num_envs_global // n_dev) * jax.local_device_count()
