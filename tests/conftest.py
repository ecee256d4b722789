"""Test configuration: run all tests on CPU with 8 virtual devices so
sharding/collective paths are exercised without TPU hardware (SURVEY.md §4
"multi-host behavior testable with xla_force_host_platform_device_count").

IMPORTANT environment quirk: this machine's sitecustomize pre-imports jax
and registers the remote-TPU ("axon") platform with JAX_PLATFORMS=axon, so
setting the env var here is too late — the platform must be forced through
jax.config. XLA_FLAGS still works because backends initialize lazily."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: makes re-runs of the suite much faster.
# SMC_TPU_JAX_CACHE overrides the location (e.g. to avoid concurrent access
# with a TPU bench process using the default dir).
_cache = os.environ.get("SMC_TPU_JAX_CACHE", "/root/repo/.jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
