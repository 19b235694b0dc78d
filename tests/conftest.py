"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` so pjit/shard_map code paths are
exercised on 8 virtual CPU devices.
"""

import os

# force-set: the environment pre-exports JAX_PLATFORMS=axon (TPU tunnel)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: amortizes XLA compiles across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon
# already exported, so the env vars above are read too late — force the
# platform through the config API (effective until first backend init).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
