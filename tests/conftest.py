"""Test configuration: force CPU with 8 virtual devices.

Must run before any test module touches jax. The container's sitecustomize
registers a TPU plugin in every process; JAX_PLATFORMS is only consulted at
backend-init time, so overriding it here still wins as long as no jax
computation has been dispatched yet. 8 virtual CPU devices let the
multi-chip sharding tests (parallel/) run without hardware (SURVEY.md §4e).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite compiles ~200 distinct jit
# graphs; reruns load them from disk instead of re-invoking LLVM.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    One full-suite process accumulates every module's jit executables in
    LLVM JIT memory; past ~190 compilations XLA:CPU's backend_compile
    SEGFAULTS (measured: the full suite died at test_roughglass ~88%
    three runs in a row, while every module passes in isolation). The
    per-module clear keeps the live-executable count bounded; the disk
    cache above makes the resulting recompiles cheap loads.
    """
    yield
    jax.clear_caches()
