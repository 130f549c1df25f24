"""Test configuration.

Mirrors the reference test strategy (`/root/reference/tests/conftest.py`):
seeded PRNGs, opt-in slow/benchmark markers. TPU-specific addition: tests run
on a *virtual 8-device CPU mesh* (`--xla_force_host_platform_device_count=8`)
so sharding/collective paths are exercised without TPU hardware; the real-chip
benchmark path lives in `bench.py`.
"""

import os

# Must be set before the first jax backend initialization. NOTE: this
# environment force-registers a remote TPU platform via sitecustomize and
# overrides JAX_PLATFORMS, so the env var alone is not enough — we also set
# jax_platforms through the config API below.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache keeps repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_addoption(parser):
    parser.addoption("--include-slow", action="store_true", default=False)
    parser.addoption("--include-benchmark", action="store_true", default=False)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow test, skipped by default")
    config.addinivalue_line("markers", "benchmark: benchmark test, skipped by default")
    config.addinivalue_line("markers", "multi_device: needs >1 jax device")


def pytest_collection_modifyitems(config, items):
    skip_slow = pytest.mark.skip(reason="use --include-slow to run")
    skip_bench = pytest.mark.skip(reason="use --include-benchmark to run")
    n_devices = jax.device_count()
    for item in items:
        if "slow" in item.keywords and not config.getoption("--include-slow"):
            item.add_marker(skip_slow)
        if "benchmark" in item.keywords and not config.getoption("--include-benchmark"):
            item.add_marker(skip_bench)
        if "multi_device" in item.keywords and n_devices < 2:
            item.add_marker(pytest.mark.skip(reason="needs multiple devices"))


@pytest.fixture(autouse=True)
def _seed_prngs():
    np.random.seed(0xF0F0)
    yield


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0xF0F0)
