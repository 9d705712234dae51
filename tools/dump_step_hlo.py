"""Dump the compiled ENTRY HLO of the full serving step to a file for
grepping (companion to inspect_step_hlo.py -- that prints the census,
this writes the raw text so big fusions can be identified by name).

Run: JAX_PLATFORMS= python tools/dump_step_hlo.py [preset] [S] [outfile]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from video_stream_segmenetation_tpu.runtime.presets import preset
from video_stream_segmenetation_tpu.service.engine import Engine


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/step_hlo.txt"
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
    txt = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
