"""Test configuration: run everything on a virtual 8-device CPU mesh.

This environment pre-imports jax from sitecustomize with JAX_PLATFORMS=axon
(the remote-TPU tunnel), so plain env vars are too late — force the platform
through jax.config before any backend initializes. (SURVEY.md §4:
multi-device tests via xla_force_host_platform_device_count.)
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
