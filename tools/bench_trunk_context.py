"""Where the in-context trunk overhead lives.

The scan-harness step ablation reports the bare int8 nano trunk at
~5.3 ms in-context while the per-layer probe (bench_trunk_layers.py)
sums to ~2.2 ms with the fused decoder kernel.  This tool runs the REAL
serving forward (QuantizedMatteNetHD.apply, decoder kernel enabled on
TPU) under increasingly step-like scan harnesses to attribute the gap:

  fixed      one fixed input, eps-threaded chain (the per-layer probe's
             harness)
  rotating   NBUF rotating input buffers (fresh-frame reads, as serving
             does)
  stepio     rotating + the step's output contract: passthrough frame
             copy to a jit output + alpha carried as state

Differences between rows = the cost of each harness element; `stepio`
vs the step-ablation bare-trunk number = residual step-graph waste.

Run: JAX_PLATFORMS= python tools/bench_trunk_context.py [preset] [S]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PRESET = sys.argv[1] if len(sys.argv) > 1 else "fast_int8_nano"
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64

MODES = ["fixed", "rotating", "stepio", "xladec"]
if len(sys.argv) > 3:
    MODES = sys.argv[3].split(",")

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

S, N, MODE = %(s)d, 20, %(mode)r
statics = preset(%(preset)r)
fh, fw = statics.frame_hw
ss = statics.s2d_block
mh = statics.mask_hw[0]
uf = mh // (-(-fh // ss))
model = models.MatteNetHD(
    stem_stride=ss, head_upsample=uf, decoder=statics.matting_decoder
)
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, fh, fw, 3)))
qp = Q.quantize_mattenet_hd(model, params)
serving = Q.QuantizedMatteNetHD(
    stem_stride=ss, head_upsample=uf, decoder=statics.matting_decoder,
    decoder_impl="xla" if MODE == "xladec" else "auto",
)
if MODE == "xladec":
    MODE = "rotating"

key = jax.random.PRNGKey(0)
hp, wp = fh // ss, fw // ss
NBUF = 4
mk = lambda k, lead: (
    jax.random.uniform(k, lead + (hp, wp, ss * ss * 3)) * 255
).astype(jnp.uint8)

if MODE == "rotfwd":
    # rotating input + the per-layer ladder's hand-rolled forward
    # (bench_trunk_layers.py fwd, STOP='full'): isolates harness effects
    # from serving.apply-graph effects
    def fwd(q, x):
        y = x.astype(jnp.bfloat16) @ q["stem_w"]
        x0 = Q._requant(y.astype(jnp.float32) + q["stem_b"])
        d2 = Q._requant(Q._conv_i8(x0, q["d2dn"], strides=(2, 2)))
        d2 = Q._qconv(d2, q["d2b"])
        d3 = Q._requant(Q._conv_i8(d2, q["d3dn"], strides=(2, 2)))
        d3 = Q._qconv(d3, q["d3b"])
        c3 = Q._conv_i8(d3, q["ctx"], dilation=(3, 3))
        ctx_f = jax.nn.relu6(c3 + d3.astype(jnp.float32) * Q.ACT_SCALE)
        ctx_f = Q._se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
        ctx = jnp.round(
            jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)
        ).astype(jnp.int8)

        def split_conv_up(small, skip, layer):
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
        u1 = split_conv_up(u2, x0, q["u1red"])
        u1f = u1.astype(jnp.bfloat16) * jnp.bfloat16(Q.ACT_SCALE)
        alpha_logit = (
            jax.lax.conv_general_dilated(
                u1f, q["alpha"]["kernel"].astype(jnp.bfloat16), (1, 1),
                "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + q["alpha"]["bias"].astype(jnp.bfloat16)
        )
        from video_stream_segmenetation_tpu.ops.resize import (
            resize_bilinear_mxu,
        )

        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        al = resize_bilinear_mxu(
            alpha_logit[..., 0].astype(jnp.float32), (uf * h0, uf * w0),
            method="half_pixel", channel_last=False,
            precision=jax.lax.Precision.DEFAULT,
        )
        return jax.nn.sigmoid(al)

    stack = jax.jit(lambda k: mk(k, (NBUF, S)))(key)

    @jax.jit
    def chain_n(q, stack, eps):
        def body(e, i):
            f = jax.lax.dynamic_index_in_dim(stack, i %% NBUF, 0, keepdims=False)
            a = fwd(q, f)
            return e + jnp.sum(a, dtype=jnp.float32) * 0.0, None

        e, _ = jax.lax.scan(body, eps, jnp.arange(N, dtype=jnp.int32))
        return e

    args = (qp, stack, jnp.float32(0.0))
elif MODE == "fixed":
    x = jax.jit(lambda k: mk(k, (S,)))(key)

    @jax.jit
    def chain_n(q, x, eps):
        def body(e, _):
            q2 = dict(q)
            q2["stem_b"] = q["stem_b"] + e  # thread the chain dependency
            a = serving.apply(q2, x)["alpha"]
            return jnp.sum(a, dtype=jnp.float32) * 0.0, None

        e, _ = jax.lax.scan(body, eps, None, length=N)
        return e

    args = (qp, x, jnp.float32(0.0))
elif MODE == "rotating":
    stack = jax.jit(lambda k: mk(k, (NBUF, S)))(key)

    @jax.jit
    def chain_n(q, stack, eps):
        def body(e, i):
            f = jax.lax.dynamic_index_in_dim(stack, i %% NBUF, 0, keepdims=False)
            a = serving.apply(q, f)["alpha"]
            return e + jnp.sum(a, dtype=jnp.float32) * 0.0, None

        e, _ = jax.lax.scan(body, eps, jnp.arange(N, dtype=jnp.int32))
        return e

    args = (qp, stack, jnp.float32(0.0))
else:  # stepio: rotating + passthrough frame output + alpha carry
    stack = jax.jit(lambda k: mk(k, (NBUF, S)))(key)
    prev0 = jnp.zeros((S, mh, statics.mask_hw[1]), jnp.float32)

    @jax.jit
    def chain_n(q, stack, prev0):
        def body(carry, i):
            prev, acc = carry
            f = jax.lax.dynamic_index_in_dim(stack, i %% NBUF, 0, keepdims=False)
            a = serving.apply(q, f)["alpha"]
            out_frame = f  # the step's passthrough output contract
            acc = acc + jnp.sum(out_frame, dtype=jnp.float32)
            return (a, acc), None

        (prev, acc), _ = jax.lax.scan(
            body, (prev0, jnp.float32(0.0)), jnp.arange(N, dtype=jnp.int32)
        )
        # keep BOTH chains live (float x*0 is not folded; prev unused
        # would let XLA DCE the whole alpha path)
        return acc * 0.0 + jnp.sum(prev, dtype=jnp.float32) * 0.0

    args = (qp, stack, prev0)

r = np.asarray(chain_n(*args))
tiny = jax.jit(lambda e: e + 1.0)
tiny_v = tiny(jnp.float32(0.0))
_ = np.asarray(tiny_v)
t0 = time.perf_counter()
_ = np.asarray(tiny(tiny_v))
rtt = (time.perf_counter() - t0) * 1e3
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    _ = np.asarray(chain_n(*args))
    best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / N)
print("RESULT", json.dumps({"ms": best}))
"""


def main():
    results = {}
    for mode in MODES:
        code = _CHILD % {"root": ROOT, "s": S, "mode": mode, "preset": PRESET}
        r = subprocess.run(
            [sys.executable, "-u", "-c", code], capture_output=True, text=True,
            timeout=3000, env=dict(os.environ, JAX_PLATFORMS=""),
        )
        ms = None
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                ms = json.loads(line[len("RESULT "):])["ms"]
        if ms is None:
            print(f"{mode:10s}  FAILED: {(r.stderr or r.stdout)[-300:]}", flush=True)
            continue
        results[mode] = ms
        print(f"{mode:10s} {ms:7.2f} ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
