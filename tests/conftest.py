"""Test configuration: run everything on a virtual 8-device CPU mesh.

The image pre-imports jax and registers the remote-TPU backend via
sitecustomize, so ``JAX_PLATFORMS`` env alone is not enough — we must force
the platform through jax.config after import.  Multi-chip sharding
correctness is tested on 8 virtual CPU devices
(``xla_force_host_platform_device_count``), per SURVEY.md §4.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent on-disk compilation cache: the suite is dominated by XLA CPU
# compiles, so warm reruns (the verify loop) skip them entirely.  /tmp is
# per-machine scratch; a cold machine just pays the compile once.
jax.config.update("jax_compilation_cache_dir", "/tmp/uzliti_slam_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A single long-lived process accumulating hundreds of XLA CPU
    executables has intermittently segfaulted inside backend_compile (LLVM)
    late in the suite; bounding the live-executable set avoids that state
    and keeps memory flat. Re-compiles are free thanks to the persistent
    cache above (only re-tracing is paid).
    """
    yield
    jax.clear_caches()
