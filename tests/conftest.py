import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (and without paying remote-TPU compile
# latency per test). bench.py (run by the driver) does NOT import this and
# uses the real TPU.
#
# NOTE: the image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so setting env vars here is too late for jax.config's
# env snapshot — override through jax.config before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for CPU tests: on this host the XLA:CPU AOT
# cache loader reports a machine-feature mismatch ("+prefer-no-scatter ...
# could lead to execution errors") and has been observed to SILENTLY
# MISCOMPUTE loaded executables (and to segfault). Witness correctness beats
# warm-cache speed; the TPU cache used by bench.py goes through the TPU
# runtime and is unaffected. Opt back in with HALO2ECC_TPU_CPU_CACHE=1.
if os.environ.get("HALO2ECC_TPU_CPU_CACHE"):
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow full-scale circuit tests",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: full-scale circuit test (opt-in)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow") or os.environ.get("HALO2ECC_TPU_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: use --run-slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
