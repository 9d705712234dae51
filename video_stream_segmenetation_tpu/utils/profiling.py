"""Tracing / profiling (SURVEY.md §5).

The reference instruments with performance.now() spans around inference
and the whole frame (frameProcessorTest.ts:76,90-92,180-185).  The TPU
equivalents: jax.profiler traces for timeline capture, and a
block_until_ready stopwatch harness for per-stage device timings.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_timer(results: dict, key: str):
    """Wall-clock a device computation (blocks on everything pending)."""
    t0 = time.perf_counter()
    yield
    (jax.device_put(0.0) + 0).block_until_ready()
    results[key] = (time.perf_counter() - t0) * 1e3


def time_fn(fn, *args, warmup: int = 2, iters: int = 10, **kw) -> dict:
    """Benchmark helper: returns mean/min ms with compile excluded."""
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) * 1e3)
    return {
        "mean_ms": sum(samples) / len(samples),
        "min_ms": min(samples),
        "p50_ms": sorted(samples)[len(samples) // 2],
        "samples": samples,
    }


@contextlib.contextmanager
def trace(logdir: str = "/tmp/vst_trace"):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
