"""Test harness: hermetic CPU-only JAX with 8 virtual devices.

The reference has no pytest, no tests/ dir, and zero multi-device testing
(SURVEY.md §4). Here every test runs on the JAX CPU backend with 8 simulated
devices so mesh/sharding/collective tests need no TPU hardware.
"""

import os
import sys

# Must be set before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
