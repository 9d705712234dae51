"""Test harness config: CPU backend with 8 virtual devices.

Mirrors the reference's EP-fallback testing stance (WASM as the
works-anywhere backend when WebGPU is absent, client/src/core/model.ts:12-29):
CPU-jit stands in for the TPU, and multi-chip sharding is exercised on a
virtual 8-device CPU mesh via --xla_force_host_platform_device_count.

Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var;
# the config knob wins, so force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on the 1-core CPU
# runner; cache compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
