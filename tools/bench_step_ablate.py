"""In-context step ablation: where the 64-stream step time goes.

Isolated jit micro-benches LIE on this machine (arg-layout conversions at
jit boundaries dominate; a gather that costs 16 ms standalone costs 1.4 ms
inside the step).  This tool times the REAL engine step under statics
variants instead -- differences between variants attribute cost to the
toggled stage.  Methodology per ARCHITECTURE.md (chained state-dependent
steps, one scalar sync).

Run: JAX_PLATFORMS= PYTHONPATH=. python tools/bench_step_ablate.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S = 64
N = 20


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops, runtime
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service.engine import Engine

    base = preset("fast_int8")
    key = jax.random.PRNGKey(0)
    fp = jax.jit(
        lambda k: ops.space_to_depth(
            (jax.random.uniform(k, (S, *base.frame_hw, 3)) * 255).astype(
                jnp.uint8
            ),
            base.s2d_block,
        )
    )(key)

    def timeit(name, statics):
        eng = Engine(num_streams=S, statics=statics, donate_state=False)
        for _ in range(S):
            eng.admit()
        bgs, gate = eng.backgrounds, jnp.ones((S,), bool)
        red = jax.jit(lambda f: jnp.sum(f.ravel()[:4].astype(jnp.int32)))

        def chain(n):
            st = eng.state
            for _ in range(n):
                st, out = eng._step(
                    eng.bundle.params, st, fp, bgs, eng.knobs, gate
                )
            return st, out

        st, out = chain(2)
        _ = np.asarray(red(out["frame"]))
        t0 = time.perf_counter()
        _ = np.asarray(red(out["frame"]))
        rtt = (time.perf_counter() - t0) * 1e3
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            st, out = chain(N)
            _ = np.asarray(red(out["frame"]))
            best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / N)
        print(f"{name:34s} {best:7.2f} ms", flush=True)
        return best

    full = timeit("full (fast_int8 preset)", base)
    timeit("matting bf16", dataclasses.replace(base, matting_precision="bf16"))
    timeit("no face", dataclasses.replace(base, face_path=False))
    timeit("face from frames", dataclasses.replace(base, face_input="frames"))
    timeit(
        "XLA refine chain",
        dataclasses.replace(base, use_fused_refine=False),
    )
    print(f"\nfull step = {full:.2f} ms -> "
          f"{S * min(33.33 / full, 4.0):.1f} sustained 720p30 streams/chip")


if __name__ == "__main__":
    main()
