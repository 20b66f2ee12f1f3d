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

# Persistent compilation cache: this machine has ONE cpu core, so cold
# XLA compiles dominate suite wall-time (8+ min for the OV multimodal
# forward). Cached executables make repeat runs fast. (bench.py disables
# the cache on the axon TPU backend where deserialized executables hit a
# pathological slow path — that issue is backend-specific; CPU is fine.)
_cache = os.environ.get("JAX_TEST_CACHE",
                        os.path.expanduser("~/.cache/uni3detr_jax_cache"))
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
