"""Test config: run everything on a simulated 8-device CPU mesh.

Mirrors the multi-chip testing strategy from SURVEY.md §4: sharding and
collectives are validated on virtual CPU devices
(``xla_force_host_platform_device_count``), real-TPU execution is exercised
by bench.py / the driver.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)
