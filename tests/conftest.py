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
# NO persistent compilation cache here, deliberately: deserialized XLA:CPU
# executables lose the cross-collective ordering constraint of the thunk
# runtime — on cache HITS the 8 virtual device threads split between two
# independent collectives (4 at the all-reduce, 4 at the all-to-all),
# deadlock, and abort the process after the 40 s rendezvous timeout
# ("Fatal Python error: Aborted" in test_all_families). Cold compiles are
# the price of correctness on the CPU mesh; the TPU bench keeps its own
# cache (/tmp/jax_cache) where the problem does not exist.
assert jax.devices()[0].platform == "cpu", jax.devices()
