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
# compiles); re-runs of the suite hit the cache instead.
#
# XLA:CPU cache entries are AOT results specialised to the build host's CPU
# features (avx512*, amx-*, ...); jax's cache key does NOT include them, so a
# cache written on one machine can SIGILL/SEGV when loaded on another. Key
# the cache dir by a host-ISA fingerprint so a reused home directory on a
# different machine cold-compiles instead of crashing. (TPU executables are
# host-independent, but the fingerprint is cheap and a stale-TPU-cache miss
# only costs a recompile.)


def _host_cache_dir():
    base = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                          os.path.expanduser('~/.jax_cache'))
    import hashlib
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    flags = ' '.join(sorted(line.split(':', 1)[1].split()))
                    return os.path.join(
                        base, hashlib.sha256(flags.encode()).hexdigest()[:12])
    except OSError:
        pass
    return base


jax.config.update('jax_compilation_cache_dir', _host_cache_dir())
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
