"""Test config: run everything on a simulated 8-device CPU mesh.

Mirrors the multi-chip testing strategy from SURVEY.md §4: sharding and
collectives are validated on virtual CPU devices
(``xla_force_host_platform_device_count``), real-TPU execution is exercised
by bench.py / the driver.
"""

import os

# Force-set (the driver env carries JAX_PLATFORMS=axon for the TPU tunnel;
# tests must run on simulated CPU devices). NOTE: sitecustomize pre-imports
# jax and registers the axon PJRT plugin before conftest runs, so mutating
# os.environ["JAX_PLATFORMS"] here is too late — but the backend itself is
# initialized lazily, so jax.config.update("jax_platforms") still works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Numerical parity tests compare against fp64/fp32 references; the default
# matmul precision is bf16-grade (TPU MXU convention), so force full fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long e2e chains (driver train->eval->serve); "
        'deselect with -m "not slow" for the fast lane')


@pytest.fixture
def rng():
    return np.random.RandomState(3)
