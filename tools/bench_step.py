"""Step-speed bench for any preset (bench.py methodology, parameterized).

Run: JAX_PLATFORMS= python tools/bench_step.py [preset] [S] [groupS] [overrides-json]
e.g.  JAX_PLATFORMS= python tools/bench_step.py fast_int8_lite 64 16
      JAX_PLATFORMS= python tools/bench_step.py multiclass_fast 64 0 \
          '{"matting_precision": "bf16"}'
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


def main(preset_name: str, S: int, GS: int, overrides=None) -> None:
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        raise SystemExit(7)
    print("device:", dev, flush=True)
    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service.engine import Engine

    statics = preset(preset_name, **(overrides or {}))
    engine = Engine(num_streams=S, statics=statics, donate_state=False)
    for _ in range(S):
        engine.admit()

    key = jax.random.PRNGKey(0)
    if statics.frame_layout == "s2d":
        frames_dev = jax.jit(
            lambda k: ops.space_to_depth(
                (jax.random.uniform(k, (S, *statics.frame_hw, 3)) * 255
                 ).astype(jnp.uint8),
                statics.s2d_block,
            )
        )(key)
    else:
        frames_dev = jax.jit(
            lambda k: (jax.random.uniform(k, (S, *statics.frame_hw, 3)) * 255
                       ).astype(jnp.uint8)
        )(key)
    bgs = engine.backgrounds
    gate = jnp.ones((S,), bool)
    reducer = jax.jit(lambda f: jnp.sum(f[:2, :2, :2, 0].astype(jnp.int32)))

    def run_chain(n, state):
        for _ in range(n):
            state, out = engine._step(
                engine.bundle.params, state, frames_dev, bgs, engine.knobs, gate
            )
        return state, out

    state, out = run_chain(2, engine.state)
    _ = np.asarray(reducer(out["frame"]))
    t0 = time.perf_counter()
    _ = np.asarray(reducer(out["frame"]))
    rtt = (time.perf_counter() - t0) * 1e3

    n = 30
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, out = run_chain(n, state)
        _ = np.asarray(reducer(out["frame"]))
        samples.append(max((time.perf_counter() - t0) * 1e3 - rtt, 0.0) / n)
    samples.sort()
    p50 = samples[len(samples) // 2]
    res = {
        "preset": preset_name, "S": S,
        "step_ms_p50": round(p50, 2), "step_ms_min": round(samples[0], 2),
        "streams_sustained": round(S * min(33.333 / p50, 4.0), 1),
        "rtt_ms": round(rtt, 1),
    }
    if GS:
        rows = lambda tree: jax.tree_util.tree_map(lambda x: x[:GS], tree)
        gstate = rows(state)
        gframes, gbgs = frames_dev[:GS], bgs[:GS]
        gknobs, ggate = rows(engine.knobs), jnp.ones((GS,), bool)

        def g_chain(n, st):
            for _ in range(n):
                st, out = engine._step(
                    engine.bundle.params, st, gframes, gbgs, gknobs, ggate
                )
            return st, out

        gstate, gout = g_chain(2, gstate)
        _ = np.asarray(reducer(gout["frame"]))
        gs = []
        for _ in range(3):
            t0 = time.perf_counter()
            gstate, gout = g_chain(n, gstate)
            _ = np.asarray(reducer(gout["frame"]))
            gs.append(max((time.perf_counter() - t0) * 1e3 - rtt, 0.0) / n)
        gs.sort()
        res["group_step_ms_p50"] = round(gs[len(gs) // 2], 2)
        res["group_S"] = GS
    print(json.dumps(res))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "fast_int8",
        int(sys.argv[2]) if len(sys.argv) > 2 else 64,
        int(sys.argv[3]) if len(sys.argv) > 3 else 16,
        json.loads(sys.argv[4]) if len(sys.argv) > 4 else None,
    )
