"""Test harness config: CPU backend with 8 virtual devices.

Tests never touch the real TPU (single shared chip behind a network tunnel —
per-op dispatch there makes tests ~100x slower); multi-chip sharding is
validated on a virtual CPU mesh as SURVEY.md §4 prescribes.

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS=axon
before pytest starts, so env vars alone are too late — we must override via
jax.config before the backend is instantiated.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

# Persistent XLA compile cache for the CPU test backend: suite cost is
# dominated by per-test jit compiles (~30-60s each on the 1-core host), and
# a warm cache cuts a representative test 39.9 -> 13.3 s (r4 measurement).
# Separate dir from the TPU .jax_cache the driver relies on.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, ".jax_cache_cpu")),
)


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, jax.devices()
    config.addinivalue_line(
        "markers", "slow: opt-in heavyweight test (RUN_SLOW=1 or --run-slow)"
    )


def pytest_addoption(parser):
    parser.addoption("--run-slow", action="store_true", default=False)


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get("RUN_SLOW") == "1":
        return
    import pytest

    skip = pytest.mark.skip(reason="slow: enable with RUN_SLOW=1 or --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
