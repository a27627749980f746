"""Test harness: hermetic CPU-only JAX with 8 virtual devices.

The reference has no pytest, no tests/ dir, and zero multi-device testing
(SURVEY.md §4). Here every test runs on the JAX CPU backend with 8 simulated
devices so mesh/sharding/collective tests need no TPU hardware.
"""

import os
import sys

# Must be set before the CPU backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start (overriding JAX_PLATFORMS); pin it back to cpu — tests
# must never ride the single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles dominate test wall-clock on this
# small host; cache hits make reruns near-instant.
_CACHE_DIR = os.environ.get("GPT_OSS_TPU_JIT_CACHE", "/tmp/gpt_oss_tpu_jit_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# Numeric oracles in these tests compare f32 einsum paths against NumPy;
# JAX's default matmul precision truncates f32 operands, so force full f32.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

pytest_plugins = ["aiohttp.pytest_plugin"]


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
