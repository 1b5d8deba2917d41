"""Multi-device sharding tests on an 8-virtual-device CPU mesh
(SURVEY.md §4: multi-host without a cluster).

The session environment pins JAX_PLATFORMS to the TPU tunnel and pytest
plugins import jax before conftest runs, so the multi-device cases run in
subprocesses with a forced CPU backend."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_CPU8_PREAMBLE = '''
import os
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
import jax
# the TPU-tunnel sitecustomize sets jax_platforms programmatically, so the
# env var alone is not enough — override the config after import
jax.config.update('jax_platforms', 'cpu')
# subprocesses bypass conftest.py: importing it wires up the same
# host-ISA-keyed persistent compile cache so re-runs skip the
# (minutes-long) cold CPU compiles without risking a stale-host cache
import tests.conftest  # noqa: F401
'''


def _run_cpu8(code: str):
    r = subprocess.run([sys.executable, '-c', _CPU8_PREAMBLE + code], cwd=REPO,
                       capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, 'STDOUT:\n%s\nSTDERR:\n%s' % (r.stdout, r.stderr)
    return r.stdout


def test_sharded_step_matches_unsharded():
    """The same program, sharded over 8 devices vs single device, must agree
    (physics is data-parallel over envs)."""
    out = _run_cpu8('''
import jax.numpy as jnp
import numpy as np
from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.envs.vec_env import VecMGEnv
from pybullet_multigoal_gym_tpu.parallel import mesh as M

assert jax.device_count() == 8, jax.devices()
mesh = M.make_mesh(n_devices=8)
assert mesh.axis_names == (M.ENV_AXIS,)

cfg = EnvConfig(task='reach', max_episode_steps=5)
env = VecMGEnv(cfg, num_envs=16, jit=False)
state, obs = jax.jit(env._reset)(jax.random.PRNGKey(0))
a = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), jnp.float32, -1, 1)

s1, o1, r1, d1, i1 = jax.jit(env._step)(state, a)

env_s = M.env_sharding(mesh)
state_sh = M.shard_env_tree(state, mesh)
a_sh = jax.device_put(a, env_s)
s2, o2, r2, d2, i2 = jax.jit(env._step)(state_sh, a_sh)

np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)
np.testing.assert_allclose(np.asarray(o1['achieved_goal']),
                           np.asarray(o2['achieved_goal']), atol=1e-6)
print('SHARDED_OK')
''')
    assert 'SHARDED_OK' in out


def test_dryrun_multichip_8dev():
    out = _run_cpu8('''
import sys
sys.path.insert(0, %r)
import __graft_entry__ as ge
ge.dryrun_multichip(8)
''' % REPO)
    assert 'OK' in out


def test_shard_map_rollout_8dev():
    out = _run_cpu8('''
import jax.numpy as jnp
import numpy as np
from pybullet_multigoal_gym_tpu.config import EnvConfig
from pybullet_multigoal_gym_tpu.parallel import make_mesh, ShardedRollout
mesh = make_mesh(n_devices=8)
r = ShardedRollout(EnvConfig(task='reach', max_episode_steps=5),
                   num_envs=32, mesh=mesh)
state = r.reset(jax.random.PRNGKey(0))
state, metrics = r.rollout(state, None, jax.random.PRNGKey(1), 10)
assert int(metrics.env_steps) == 320, metrics
assert np.isfinite(float(metrics.mean_reward))
# per-device PRNG folding gives distinct goals across shards
assert float(jnp.std(state.desired_goal[:, 0])) > 1e-3
print('ROLLOUT_OK')
''')
    assert 'ROLLOUT_OK' in out


def test_graft_entry_single_chip():
    """entry() compiles and runs on the session's default backend."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))
