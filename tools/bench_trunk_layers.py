"""Per-layer cost attribution for the int8 serving trunk.

Times the QuantizedMatteNetHD forward truncated after each stage
(stop='stem' | 'd2dn' | ... | 'full'); the difference between
consecutive prefixes attributes in-context cost to one layer.  Each
prefix runs in its own subprocess (tunnel long-compile hazard -- see
tools/bench_step_ablate.py) with the chained-dispatch + single-scalar
sync methodology from bench.py.

Run: JAX_PLATFORMS= python tools/bench_trunk_layers.py [preset] [S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64

# ordered truncation points for the nano (plan E) graph
STOPS = [
    "stem", "d2dn", "d2b", "d3dn", "d3b", "ctx", "se",
    "u2red", "u1red", "heads", "full",
]
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
    # mirrors QuantizedMatteNetHD.apply (plan E), truncated at STOP;
    # eps (f32 scalar) threads the chain dependency through the stem bias
    y = x.astype(jnp.bfloat16) @ q["stem_w"]
    x0 = Q._requant(y.astype(jnp.float32) + (q["stem_b"] + eps))
    if STOP == "stem":
        return x0
    d2 = Q._requant(Q._conv_i8(x0, q["d2dn"], strides=(2, 2)))
    if STOP == "d2dn":
        return d2
    d2 = Q._qconv(d2, q["d2b"])
    if STOP == "d2b":
        return d2
    d3 = Q._requant(Q._conv_i8(d2, q["d3dn"], strides=(2, 2)))
    if STOP == "d3dn":
        return d3
    d3 = Q._qconv(d3, q["d3b"])
    if STOP == "d3b":
        return d3
    c3 = Q._conv_i8(d3, q["ctx"], dilation=(3, 3))
    ctx_f = jax.nn.relu6(c3 + d3.astype(jnp.float32) * Q.ACT_SCALE)
    if STOP == "ctx":
        return ctx_f
    ctx_f = Q._se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
    ctx = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)).astype(jnp.int8)
    if STOP == "se":
        return ctx

    def split_conv_up(small, skip, layer):
        # conv-below-upsample form (models/quantized.py::split_conv_up)
        ca = small.shape[-1]
        la = {"wq": layer["wq"][:, :, :ca], "mult": layer["mult"],
              "bias": layer["bias"]}
        lb = {"wq": layer["wq"][:, :, ca:], "mult": layer["mult"],
              "bias": jnp.zeros_like(layer["bias"])}
        ya = Q._nearest_x2(Q._conv_i8(small, la))[
            ..., : skip.shape[-3], : skip.shape[-2], :
        ]
        return Q._requant(ya + Q._conv_i8(skip, lb))

    u2 = split_conv_up(ctx, d2, q["u2red"])
    if STOP == "u2red":
        return u2
    u1 = split_conv_up(u2, x0, q["u1red"])
    if STOP == "u1red":
        return u1

    u1f = u1.astype(jnp.bfloat16) * jnp.bfloat16(Q.ACT_SCALE)
    alpha_logit = (
        jax.lax.conv_general_dilated(
            u1f, q["alpha"]["kernel"].astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + q["alpha"]["bias"].astype(jnp.bfloat16)
    )
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
    # FULL-tensor reduce: a corner-slice reduce lets XLA slice-propagate
    # backwards and skip most of the tail (observed: 'full' timed BELOW
    # 'heads'); *0.0 keeps the chain dependency without foldability
    return jnp.sum(out, dtype=jnp.float32) * 0.0


@jax.jit
def chain_n(q, x, eps):
    # N steps inside ONE jit: per-dispatch tunnel overhead (an HTTP call
    # per execute) otherwise floors short programs at the RTT
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
tiny = jax.jit(lambda e: e + 1.0)  # jitted sync probe (eager ops hang
tiny_v = tiny(jnp.float32(0.0))    # on this tunnel, bench_suite note)
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
