"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/pjit tests run
on 8 virtual CPU devices (XLA host platform), mirroring how the reference
exercises its DDP paths with ``nproc_per_node=1`` (SURVEY.md §4.7) — except
we actually get 8 devices.

Must run before anything imports jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# after import is what actually pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the model-family/e2e tests are dominated by
# XLA compile time (~30 min cold); warm runs reuse cached executables.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu", jax.devices()
