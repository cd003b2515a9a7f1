"""Test config: force the CPU backend with a virtual 8-device mesh.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so the backend must be
pinned through jax.config before any backend initialization. Must run before any
test module imports jax-dependent code (conftest imports first).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
