"""Test env: force CPU with 8 fake devices (SURVEY.md §4.2).

Runs the full pjit data-parallel path without a TPU pod — the standard JAX
fake-backend trick.

Environment subtlety: on the bench box a sitecustomize pre-imports jax and
registers a real-TPU PJRT plugin with JAX_PLATFORMS=axon, so (a) jax may
already be imported before this file runs, making env-var edits to
JAX_PLATFORMS ineffective, and (b) tests would otherwise compile over the
TPU tunnel. `jax.config.update("jax_platforms", ...)` works even after
import (backends initialize lazily), so we use that. XLA_FLAGS is still
read at CPU-backend init, so setting it here is early enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
