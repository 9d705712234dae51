"""Compiled-HLO / memory inspection of the int8 serving trunk.

Answers one question: do the s32->f32->requant conv epilogues
MATERIALIZE at activation resolution (HBM traffic the MXU never needed),
or does XLA fuse them into the conv outputs?  Prints the compiled
module's memory analysis (temp allocation ~= materialized intermediates)
and the fusion/convolution instruction list with byte sizes.

Run: JAX_PLATFORMS= python tools/inspect_trunk_hlo.py [preset] [S] [decoder_impl]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models
from video_stream_segmenetation_tpu.models import quantized as Q
from video_stream_segmenetation_tpu.runtime.presets import preset


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    statics = preset(name)
    fh, fw = statics.frame_hw
    ss = statics.s2d_block
    uf = statics.mask_hw[0] // (-(-fh // ss))
    model = models.MatteNetHD(
        stem_stride=ss, head_upsample=uf, decoder=statics.matting_decoder
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, fh, fw, 3)))
    qp = Q.quantize_mattenet_hd(model, params)
    serving = Q.QuantizedMatteNetHD(
        stem_stride=ss, head_upsample=uf, decoder=statics.matting_decoder,
        decoder_impl=sys.argv[3] if len(sys.argv) > 3 else "xla",
        stem_impl=statics.int8_stem_impl,
        head_impl=statics.int8_head_impl,
    )

    x = jnp.zeros((s, fh // ss, fw // ss, ss * ss * 3), jnp.uint8)
    fn = jax.jit(lambda q, x: serving.apply(q, x)["alpha"])
    lowered = fn.lower(qp, x)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        print("== memory analysis ==")
        print(ma)
    except Exception as e:
        print("memory_analysis unavailable:", e)
    try:
        txt = compiled.as_text()
    except Exception as e:
        print("compiled text unavailable:", e)
        txt = lowered.as_text()

    # ENTRY-computation instructions are the ones whose outputs actually
    # materialize (fusion bodies are separate computations above it)
    entry = txt[txt.rindex("ENTRY"):] if "ENTRY" in txt else txt
    print("\n== ENTRY instructions with outputs >= 8 MB ==")
    rows = []
    for line in entry.splitlines():
        m = re.match(r"\s+\S+ = (\w+)\[([\d,]*)\]\S* (\w+)\(", line)
        if not m:
            continue
        dt, dims, op = m.groups()
        bpe = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
               "s8": 1, "u8": 1, "pred": 1}.get(dt)
        if bpe is None or not dims:
            continue
        n = 1
        for d in dims.split(","):
            n *= int(d)
        size = n * bpe
        if size >= 8 << 20:
            rows.append((size, f"{dt}[{dims}]", op))
    tot = 0
    agg = {}
    for size, shape, op in rows:
        key = (shape, op)
        c, s = agg.get(key, (0, 0))
        agg[key] = (c + 1, s + size)
        tot += size
    for (shape, op), (c, s) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s / (1 << 20):8.1f} MB  {shape:24s} {op}  x{c}")
    print(f"  total >= 8 MB entry outputs: {tot / (1 << 20):.1f} MB")

    print("\n== fusion kinds (entry) ==")
    kinds = {}
    for m in re.finditer(r"fusion\([^)]*\), kind=(\w+)", entry):
        kinds[m.group(1)] = kinds.get(m.group(1), 0) + 1
    print(kinds)
    n_conv = len(re.findall(r"= \S+ convolution", entry))
    print("entry convolution instructions:", n_conv)


if __name__ == "__main__":
    main()
