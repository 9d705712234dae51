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
# runner; cache compiled executables across runs.  The dir is keyed by the
# host's CPU features: XLA:CPU AOT executables are machine-specific, and a
# cache written by a different host makes every load fail loudly
# (cpu_aot_loader machine-feature-mismatch spam, seen in the round-3
# driver environment) before falling back to a recompile.
import hashlib as _hashlib


def _machine_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            key = next(l for l in f if l.startswith("flags"))
    except Exception:
        import platform

        key = platform.processor() or platform.machine()
    return _hashlib.md5(key.encode()).hexdigest()[:8]


jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_machine_tag()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
