"""Compiled-HLO / memory census of the FULL serving step.

Compiles Engine._step (the whole fused pipeline program: ingestion ->
trunk -> face subpath -> fused refine -> composite) for a preset and
prints the materialized-intermediate census (tools/hlo_census.py).
This is the ground-truth view of what actually hits HBM per step --
timing ladders over the axon tunnel mis-attribute (scan hoisting,
harness fusion changes), but the compiled module's temp allocations
don't lie.

Run: JAX_PLATFORMS= python tools/inspect_step_hlo.py [preset] [S] [min_mb]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from hlo_census import census
from video_stream_segmenetation_tpu.runtime.presets import preset
from video_stream_segmenetation_tpu.service.engine import Engine


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    min_mb = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    statics = preset(name)
    eng = Engine(num_streams=s, statics=statics, donate_state=False)
    fh, fw = statics.frame_hw
    if statics.frame_layout == "s2d":
        blk = statics.s2d_block
        frames = jnp.zeros((s, fh // blk, fw // blk, blk * blk * 3), jnp.uint8)
    else:
        frames = jnp.zeros((s, fh, fw, 3), jnp.uint8)
    gate = jnp.ones((s,), bool)
    lowered = eng._step.lower(
        eng.bundle.params, eng.state, frames, eng.backgrounds, eng.knobs, gate
    )
    census(lowered.compile(), min_mb=min_mb)


if __name__ == "__main__":
    main()
