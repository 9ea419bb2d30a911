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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in _flags:
    # This sandbox exposes ONE core (nproc=1): the 8 virtual devices'
    # collective threads time-slice it, and anything else competing
    # (XLA compiles, parallel workers) can starve a rendezvous past the
    # default 40 s TERMINATION timeout -> SIGABRT mid-suite. The timeout
    # exists to catch real deadlocks; starvation isn't one — raise it.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
os.environ["XLA_FLAGS"] = _flags

import signal  # noqa: E402

import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# after import is what actually pins tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: the model-family/e2e tests are dominated
# by XLA compile time (~hours cold on this 1-core sandbox); warm runs
# reuse cached executables. SAFE ONLY together with the raised collective
# timeouts above: with the default 40 s termination timeout, cache-hit
# executables start running while the next test's compile hogs the single
# core, a collective thread starves past the timeout, and XLA aborts the
# process ("Fatal Python error: Aborted" — diagnosed round 2; the
# timeouts, not the cache, were the root cause).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """Native @pytest.mark.timeout(N) via SIGALRM (pytest-timeout isn't in
    this image; without this hook the marker would be a silent no-op)."""
    marker = item.get_closest_marker("timeout")
    if marker is None or not hasattr(signal, "SIGALRM"):
        yield
        return
    seconds = int(marker.args[0])

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded its {seconds}s timeout marker")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
