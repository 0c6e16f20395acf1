"""Test harness configuration.

Forces JAX onto the host CPU with 8 virtual devices so the whole suite —
including the multi-chip sharding tests — runs anywhere (no TPU needed).
Must run before any test module imports jax-dependent code.
"""
import os

# Must be set before the XLA CPU client is instantiated.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container registers an experimental TPU PJRT plugin at interpreter start
# (sitecustomize) and pins JAX_PLATFORMS to it; the programmatic config wins.
jax.config.update("jax_platforms", "cpu")
