"""Test configuration.

Note: the session environment may pin JAX_PLATFORMS to a TPU backend, and
pytest plugins import jax before this file runs, so we do NOT try to force a
platform here by default. Multi-device mesh tests (tests/test_sharding.py)
spawn subprocesses with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 instead.

For fast local iteration, ``PMG_FORCE_CPU=1 PYTEST_DISABLE_PLUGIN_AUTOLOAD=1
python -m pytest ...`` forces the CPU backend (works only when plugin
autoload is disabled, otherwise a plugin may initialise the TPU backend
before this file runs).
"""

import os

import jax

if os.environ.get('PMG_FORCE_CPU'):
    jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: env physics programs are large (30-500 s cold
# compiles); re-runs of the suite hit the cache instead
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 os.path.expanduser('~/.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
