"""Test env: force CPU with 8 fake devices BEFORE jax import (SURVEY.md §4.2).

Runs the full pjit data-parallel path without a TPU pod — the standard JAX
fake-backend trick. Must happen before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
