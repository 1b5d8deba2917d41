"""Test configuration.

Note: the session environment may pin JAX_PLATFORMS to a TPU backend, and
pytest plugins import jax before this file runs, so we do NOT try to force a
platform here. Multi-device mesh tests (tests/test_sharding.py) spawn
subprocesses with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 instead."""
