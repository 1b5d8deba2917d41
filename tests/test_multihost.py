"""Multi-HOST (multi-process) tests without a cluster: N CPU processes with
M virtual devices each form a global N*M-device mesh through
`jax.distributed` — the same mechanism a TPU pod slice uses, minus the ICI
(SURVEY.md §4 "multi-host without a cluster").

The reference has no distributed machinery at all; these tests cover the
launcher (parallel/launch.py) and the sharded rollout running over a
multi-process mesh with replicated metric reductions.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = '''
import os, sys
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
import jax
jax.config.update('jax_platforms', 'cpu')

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
from pybullet_multigoal_gym_tpu.parallel import launch

idx, count = launch.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
assert (idx, count) == (pid, nproc), (idx, count)
assert jax.device_count() == 4 * nproc, jax.devices()
assert jax.local_device_count() == 4

mesh = launch.global_env_mesh()
assert mesh.devices.size == 4 * nproc

import jax.numpy as jnp
import numpy as np
from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.parallel.rollout import ShardedRollout

n_envs = launch.process_local_batch(16) * nproc
assert n_envs == 16
r = ShardedRollout(EnvConfig(task='reach', max_episode_steps=5),
                   num_envs=16, mesh=mesh)
state = r.reset(jax.random.PRNGKey(0))
state, metrics = r.rollout(state, None, jax.random.PRNGKey(1), 5)
steps = int(metrics.env_steps)
rew = float(metrics.mean_reward)
assert steps == 16 * 5, steps
assert np.isfinite(rew)
print('MULTIHOST_OK pid=%d steps=%d rew=%.6f' % (pid, steps, rew))
'''


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize('nproc', [2])
def test_multihost_rollout(nproc):
    coord = '127.0.0.1:%d' % _free_port()
    procs = [subprocess.Popen(
        [sys.executable, '-c', _WORKER, coord, str(nproc), str(i)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nproc)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, 'STDOUT:\n%s\nSTDERR:\n%s' % (out, err)
        outs.append(out)
    rews = set()
    for i, out in enumerate(outs):
        assert ('MULTIHOST_OK pid=%d steps=80' % i) in out, out
        rews.add(out.strip().split('rew=')[-1])
    # every process computed the SAME globally-reduced metric
    assert len(rews) == 1, outs
