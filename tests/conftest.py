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
