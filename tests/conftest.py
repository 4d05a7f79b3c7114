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
