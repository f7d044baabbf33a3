"""Test configuration: force an 8-device virtual CPU platform.

The container's sitecustomize imports jax and pins JAX_PLATFORMS to the TPU
backend at interpreter startup, so plain env vars are too late here; we go
through jax.config instead (backends are created lazily, so this works as
long as no test touched a device before conftest import — pytest guarantees
that ordering).

This is the standard JAX substitute for fake-cluster fixtures (SURVEY.md §4):
multi-device sharding semantics are fully testable on virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"

