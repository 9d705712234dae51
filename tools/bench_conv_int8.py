"""XLA int8 conv vs the Pallas fused kernel on trunk shapes (real TPU).

Chained-dispatch methodology (fori_loop keeps compiles small), single
scalar sync.  Shapes = the MatteNetHD plan-B trunk classes at S=64.

Run: JAX_PLATFORMS= python tools/bench_conv_int8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from video_stream_segmenetation_tpu.kernels.conv_int8 import conv3x3_i8_fused  # noqa: E402
from video_stream_segmenetation_tpu.models.quantized import _conv_i8, _requant  # noqa: E402

N = 30
SHAPES = [
    ("b1 72x128x128", (64, 72, 128, 128), 128),
    ("d2b 36x64x192", (64, 36, 64, 192), 192),
    ("d3b 18x32x256", (64, 18, 32, 256), 256),
]
if len(sys.argv) > 1:
    SHAPES = SHAPES[: int(sys.argv[1])]


_reduce = None


def timeit(fn, *args):
    # sync via a JITTED reducer -- an eager jnp op over the tunnel costs
    # seconds to minutes (see memory tpu-tunnel-quirks)
    global _reduce
    if _reduce is None:
        _reduce = jax.jit(lambda o: jnp.sum(o[:2, :2, :2, :2].astype(jnp.int32)))
    out = fn(*args)
    _ = np.asarray(_reduce(out))  # compile+sync
    t0 = time.perf_counter()
    out = fn(*args)
    _ = np.asarray(_reduce(out))
    total = (time.perf_counter() - t0) * 1e3
    return total / N


def main():
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        # the tunnel occasionally refuses an attach right after another
        # process released it; exit distinctly so a wrapper can retry
        print("TPU not attached (tunnel hiccup) -- rerun", flush=True)
        raise SystemExit(7)
    print("device:", dev, flush=True)
    key = jax.random.PRNGKey(0)
    results = {}
    for name, (s, h, w, c), co in SHAPES:
        ks = jax.random.split(key, 4)
        x = jax.jit(
            lambda k: jax.random.randint(k, (s, h, w, c), 0, 127, jnp.int8)
        )(ks[0])
        wq = jax.jit(
            lambda k: jax.random.randint(k, (3, 3, c, co), -127, 127, jnp.int8)
        )(ks[1])
        mult = jax.jit(lambda k: jax.random.uniform(k, (co,)) * 1e-3)(ks[2])
        bias = jax.jit(lambda k: jax.random.uniform(k, (co,)) - 0.5)(ks[3])
        layer = {"wq": wq, "mult": mult, "bias": bias}

        @jax.jit
        def xla_chain(x, wq, mult, bias):
            def body(_, a):
                return _requant(_conv_i8(a, {"wq": wq, "mult": mult, "bias": bias}))
            return jax.lax.fori_loop(0, N, body, x)

        @jax.jit
        def pl_chain(x, wq, mult, bias):
            def body(_, a):
                return conv3x3_i8_fused(a, wq, mult, bias)
            return jax.lax.fori_loop(0, N, body, x)

        ms_xla = timeit(xla_chain, x, wq, mult, bias)
        try:
            ms_pl = timeit(pl_chain, x, wq, mult, bias)
        except Exception as e:
            ms_pl = None
            print(f"{name}: pallas FAILED: {type(e).__name__}: {e}", flush=True)
        macs = s * h * w * 9 * c * co
        res = {
            "xla_ms": round(ms_xla, 3),
            "pallas_ms": round(ms_pl, 3) if ms_pl else None,
            "xla_tops": round(2 * macs / (ms_xla * 1e-3) / 1e12, 1),
            "pallas_tops": round(2 * macs / (ms_pl * 1e-3) / 1e12, 1) if ms_pl else None,
        }
        results[name] = res
        print(name, res, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
