"""Per-stage cost attribution for the REAL serving int8 trunk.

Unlike tools/bench_trunk_layers.py (which mirrors the XLA
conv-below-upsample decoder + bf16 heads as a stable reference ladder),
this ladder runs the serving configuration: Pallas fused decoder levels
(kernels/decoder_int8.py) and int8 alpha heads (models/quantized.py,
int8_head_impl='int8').  Differences between consecutive prefixes
attribute in-context cost to one serving stage.

Stops: stem | enc (through d3b) | se (ctx+SE) | u2red | u1red | heads | full

Run: JAX_PLATFORMS= python tools/bench_serving_trunk.py [preset] [S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64

STOPS = ["stem", "enc", "se", "u2red", "u1red", "heads", "full"]
if len(sys.argv) > 3:
    STOPS = sys.argv[3].split(",")

_CHILD = r"""
import json, time, sys
sys.path.insert(0, %(root)r)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from video_stream_segmenetation_tpu import models
from video_stream_segmenetation_tpu.models import quantized as Q
from video_stream_segmenetation_tpu.kernels.decoder_int8 import fused_decoder_level
from video_stream_segmenetation_tpu.runtime.presets import preset

S, N, STOP = %(s)d, 20, %(stop)r
statics = preset(%(preset)r)
fh, fw = statics.frame_hw
ss = statics.s2d_block
mh = statics.mask_hw[0]
uf = mh // (-(-fh // ss))
model = models.MatteNetHD(
    stem_stride=ss, head_upsample=uf, decoder=statics.matting_decoder
)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, fh, fw, 3)))
q = Q.quantize_mattenet_hd(model, params)


def fwd(q, x, eps):
    # mirrors QuantizedMatteNetHD.apply (plan E) on the SERVING path
    # (pallas decoder levels + int8 heads), truncated at STOP
    y = x.astype(jnp.bfloat16) @ q["stem_w"]
    x0 = Q._requant(y.astype(jnp.float32) + (q["stem_b"] + eps))
    if STOP == "stem":
        return x0
    d2 = Q._requant(Q._conv_i8(x0, q["d2dn"], strides=(2, 2)))
    d2 = Q._qconv(d2, q["d2b"])
    d3 = Q._requant(Q._conv_i8(d2, q["d3dn"], strides=(2, 2)))
    d3 = Q._qconv(d3, q["d3b"])
    if STOP == "enc":
        return d3
    c3 = Q._conv_i8(d3, q["ctx"], dilation=(3, 3))
    ctx_f = jax.nn.relu6(c3 + d3.astype(jnp.float32) * Q.ACT_SCALE)
    ctx_f = Q._se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
    ctx = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)).astype(jnp.int8)
    if STOP == "se":
        return ctx
    u2 = fused_decoder_level(ctx, d2, q["u2red"])
    if STOP == "u2red":
        return u2
    u1 = fused_decoder_level(u2, x0, q["u1red"])
    if STOP == "u1red":
        return u1
    alpha_logit = Q._conv_i8(u1, q["alpha_q"])
    if STOP == "heads":
        return alpha_logit

    from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

    h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
    al = resize_bilinear_mxu(
        alpha_logit[..., 0].astype(jnp.float32), (uf * h0, uf * w0),
        method="half_pixel", channel_last=False,
        precision=jax.lax.Precision.DEFAULT,
    )
    return jax.nn.sigmoid(al)


def step(q, x, eps):
    out = fwd(q, x, eps)
    return jnp.sum(out, dtype=jnp.float32) * 0.0


@jax.jit
def chain_n(q, x, eps):
    def body(e, _):
        return step(q, x, e), None

    e, _ = jax.lax.scan(body, eps, None, length=N)
    return e


key = jax.random.PRNGKey(0)
hp, wp = statics.frame_hw[0] // ss, statics.frame_hw[1] // ss
x = jax.jit(
    lambda k: (jax.random.uniform(k, (S, hp, wp, ss * ss * 3)) * 255).astype(
        jnp.uint8
    )
)(key)

r = np.asarray(chain_n(q, x, jnp.float32(0.0)))
tiny = jax.jit(lambda e: e + 1.0)
tiny_v = tiny(jnp.float32(0.0))
_ = np.asarray(tiny_v)
t0 = time.perf_counter()
_ = np.asarray(tiny(tiny_v))
rtt = (time.perf_counter() - t0) * 1e3
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(chain_n(q, x, jnp.float32(0.0)))
    best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / N)
print("RESULT", json.dumps({"ms": best}))
"""


def main():
    prev = 0.0
    results = {}
    for stop in STOPS:
        code = _CHILD % {"root": ROOT, "s": S, "stop": stop, "preset": PRESET}
        r = subprocess.run(
            [sys.executable, "-u", "-c", code], capture_output=True, text=True,
            timeout=3000, env=dict(os.environ, JAX_PLATFORMS=""),
        )
        ms = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                ms = json.loads(line[len("RESULT "):])["ms"]
        if ms is None:
            print(f"{stop:10s}  FAILED: {(r.stderr or r.stdout)[-300:]}", flush=True)
            continue
        results[stop] = ms
        print(f"{stop:10s} {ms:7.2f} ms   (+{ms - prev:5.2f})", flush=True)
        prev = ms
    print(json.dumps(results))


if __name__ == "__main__":
    main()
