"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard TPU-codebase fake-backend mechanism (SURVEY §4): CPU
execution with ``xla_force_host_platform_device_count=8`` so multi-device
sharding paths are exercised without real chips.
"""

import os

# Force-assign: the environment pre-sets JAX_PLATFORMS to the TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU-tunnel sitecustomize registers its PJRT plugin at interpreter
# startup and can win platform selection; override it explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: this box has one CPU core and jit compiles
# dominate test wall-time; cached executables cut repeat runs drastically.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
