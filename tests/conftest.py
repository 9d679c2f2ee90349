"""Test configuration: force JAX onto CPU with 8 virtual devices.

Unit/parity tests must be hardware-independent and able to exercise
multi-chip sharding logic, so JAX is pinned to the CPU platform with
``--xla_force_host_platform_device_count=8`` (the same mechanism the driver
uses to dry-run the multi-chip path).  Must run before the first jax import.

On this machine a sitecustomize hook force-registers the axon TPU backend
whenever PALLAS_AXON_POOL_IPS is set; dropping the variable (and pinning
JAX_PLATFORMS) keeps tests on CPU.  Benchmarks (bench.py) use the real chip.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the tree-merge packer compiles a deep graph
# per (config, shape); caching across test runs keeps the suite fast.
import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU backend via jax.config even
# when JAX_PLATFORMS=cpu is exported; override it back AFTER jax import so
# tests really run on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# No persistent compilation cache for the CPU suite: XLA:CPU executable
# (de)serialization segfaults on this machine class (observed in both
# get_executable_and_time and put_executable_and_time after a VM host
# migration; the loader itself warns that machine-feature mismatches "could
# lead to execution errors such as SIGILL").  The in-process jit cache
# still deduplicates compiles within a test run.  Opt back in explicitly
# with AIRS_TEST_JAX_CACHE=/path if the host is known-stable.
_cache = os.environ.get("AIRS_TEST_JAX_CACHE")
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of live XLA:CPU executables; on
    this machine class LLVM reliably aborts/segfaults partway through the
    suite (same spot every run — observed in test_parallel_sp after ~450
    compiles) while every module passes in isolation.  Clearing the jit
    caches between modules keeps the in-process compiler state bounded;
    within a module, caching still deduplicates compiles.
    """
    yield
    jax.clear_caches()
