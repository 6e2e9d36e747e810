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
# compile on this 1-core host — amortize across test runs. EOSVOS_TEST_CACHE
# overrides the location (e.g. a fresh tempdir to measure cold-cache cost of
# the smoke tier).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("EOSVOS_TEST_CACHE", "/root/.cache/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() == 8, (
    "test harness expected 8 virtual CPU devices, got "
    f"{jax.devices()} — a backend was initialized before conftest ran"
)

# ---------------------------------------------------------------------------
# Smoke tier (VERDICT r4 next-round item 8): `pytest -m smoke` = one-per-
# subsystem coverage at tiny shapes, cheap even from a COLD compile cache,
# so a cache-invalidating edit doesn't force a 65-minute full-suite run to
# get a first signal. Membership is centralized here (collection hook)
# instead of per-file marks so the subset stays auditable in one place.
# Budget: < 5 min wall from a cold cache on this 1-core host.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

# whole modules that are host-side or tiny-jit only
_SMOKE_MODULES = {
    "test_bits",            # bit-packing wire format
    "test_config",          # yaml/named-config/dotted overrides (pure py)
    "test_data",            # transforms, indexers, splits, packed warp
    "test_detection_ops",   # boxes/NMS/roi-align at toy shapes
    "test_fuse",            # conv-BN fusion, bilinear kernels
    "test_losses",          # dice/CE/Lovász vs golden values
    "test_meta_optim",      # learned-optimizer core on the 2x3 linear task
    "test_metrics",         # native J/F vs hand-computed masks
    "test_native_loader",   # C decode path + PIL fallback
    "test_torch_import",    # state-dict name mapping (host-side)
    "test_utils",           # logger/ckpt/png/splits/submission/report
}
# single representatives of the compile-heavier subsystems (one param
# each — the sibling params re-compile near-identical programs for little
# extra signal and dominate the tier's wall clock)
_SMOKE_NODES = (
    "test_models.py::TestDeepLab::test_logits_at_input_resolution[DeepLabV3Plus]",
    "test_group_norm.py::test_matches_flax",          # + pallas via fallback
    "test_one_shot.py::TestMergeObjects",             # argmax/bg-threshold
    "test_parallel.py::TestTaskset",                  # host-side sampling
    "test_parallel.py::TestShardedMetaStep::test_step_runs_and_updates[8]",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.get_closest_marker("slow"):
            continue
        name = item.nodeid.split("/")[-1]  # e.g. test_x.py::Class::test_y
        mod = name.split(".py::")[0]
        if mod in _SMOKE_MODULES or name.startswith(_SMOKE_NODES):
            item.add_marker(pytest.mark.smoke)
