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
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("UZSLAM_TEST_CACHE_DIR", "/tmp/uzliti_slam_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_load_initial_conftests(early_config, parser, args):
    """Run two xdist workers (the image has 2 cores; loadfile keeps each
    module's often-module-scoped fixtures on one worker) — but only when
    pytest-xdist is actually importable, so plain ``pytest tests/`` works
    on environments without the plugin (no hard dependency)."""
    try:
        import xdist  # noqa: F401
    except ImportError:
        return
    if any(a == "-n" or a.startswith(("-n", "--numprocesses", "-p no:xdist")) for a in args):
        return
    args[:] = ["-n", "2", "--dist", "loadfile", *args]

# Collapse generated-graph shapes onto power-of-two tiers so traces and
# compiled programs are shared across test modules (see synthetic.py).
from uzliti_slam_tpu.io import synthetic as _synthetic  # noqa: E402

_synthetic.capacity_rounding = "pow2"


_modules_since_clear = [0]


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_periodically():
    """Drop compiled executables every few test modules.

    A single long-lived process accumulating hundreds of XLA CPU
    executables has intermittently segfaulted inside backend_compile (LLVM)
    late in the suite; bounding the live-executable set avoids that state
    and keeps memory flat.  Clearing is periodic rather than per-module so
    shared jitted programs (``solver.optimize`` keyed on shape+config)
    stay warm across neighbouring modules — re-tracing is the suite's
    dominant cost, not XLA compiles (those come back from the persistent
    cache).
    """
    yield
    _modules_since_clear[0] += 1
    if _modules_since_clear[0] >= 6:
        _modules_since_clear[0] = 0
        jax.clear_caches()
