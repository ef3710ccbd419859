"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens via bench.py and tools/tpu_chain_bench.py;
unit/conformance tests use the XLA CPU backend with 8 virtual devices so the
multi-chip sharding paths — shard_map, ppermute halo exchange
(tests/test_parallel.py::TestTimeShardedFir), and all_to_all channel
redistribution (TestChannelRedistribution) — are exercised without TPU
hardware, per SURVEY.md §4.
"""

import os

# Env route (works when jax has not been imported yet).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Config route: this environment pre-imports jax with JAX_PLATFORMS=axon via
# a sitecustomize hook, so the env var alone is not sufficient.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent XLA compilation cache: the suite is dominated by lax.scan
# compiles (AGC/PLL/symsync feedback kernels recompile identical HLO across
# tests); caching them on disk cuts repeat-run wall time sharply.
_cache_dir = os.environ.get(
    "YAGI_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without the knobs — cache is best-effort
    pass


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full suite; CI / round snapshots)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "autotest(names, param_map): liquid autotest identity annotation "
        "(tests/autotest.py; collected by tools/autotest_dump.py)",
    )
    config.addinivalue_line("markers", "slow: long-running CPU scan test")


def pytest_collection_modifyitems(config, items):
    """Default run skips ``slow``-marked tests; ``--runslow`` (or
    YAGI_RUNSLOW=1) runs everything. Keeps the default path < 15 min while
    the full conformance surface stays one flag away."""
    import pytest

    if config.getoption("--runslow") or os.environ.get("YAGI_RUNSLOW"):
        return
    skip = pytest.mark.skip(reason="slow test: use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
