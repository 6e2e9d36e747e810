"""Test harness: force JAX onto CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4 test strategy).

NOTE: in this environment ``jax`` may already be imported (sitecustomize
registers the TPU tunnel backend with JAX_PLATFORMS=axon), so plain env vars
are too late — ``jax.config.update`` is authoritative as long as no backend
has been initialized yet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the meta-step/Mask-R-CNN graphs take minutes to
# compile on this 1-core host — amortize across test runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() == 8, (
    "test harness expected 8 virtual CPU devices, got "
    f"{jax.devices()} — a backend was initialized before conftest ran"
)
