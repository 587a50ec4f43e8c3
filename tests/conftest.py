"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU (fast compiles, deterministic) with 8 virtual devices so the
sharded/distributed paths are exercised without TPU hardware. Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: the big fused/scan programs dominate suite
# wall time on CPU; caching their XLA compiles makes repeat runs (and every
# per-worker re-compile under pytest-xdist) a disk load instead
# (VERDICT r1 next-round #7). Shared with bench.py's cache dir — keys
# include platform, so CPU test entries never collide with axon ones.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "cpu"
