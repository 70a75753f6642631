"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware.

Note: a sitecustomize may pre-register a TPU plugin at interpreter
startup and pin JAX_PLATFORMS; `jax.config.update` below overrides it
reliably, whereas setting the env var here would be too late.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
