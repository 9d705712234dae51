"""Per-stage timing of the int8 MatteNetHD serving graph on the real TPU.

Methodology (tunnel-safe, see ARCHITECTURE.md): for each cumulative
PREFIX of the forward (stem; stem+b1; ...; full), jit a chain of N
data-dependent evaluations and sync once on a scalar; stage cost =
difference between consecutive prefixes.  Within a chain, the prefix
output is folded back to a fresh input via a cheap cast/slice so steps
stay serialized on device.

Run: JAX_PLATFORMS= python tools/bench_int8_layers.py [S]
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

from video_stream_segmenetation_tpu import models  # noqa: E402
from video_stream_segmenetation_tpu.models.quantized import (  # noqa: E402
    ACT_SCALE,
    QuantizedMatteNetHD,
    _block,
    _conv_i8,
    _requant,
    _se_f32,
    quantize_mattenet_hd,
)

S = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SS = 10
HW = (720, 1280)


def build_stages(q, uf):
    """Ordered list of (name, fn) where fn: carry dict -> carry dict."""

    def stem(c):
        y = c["x"].astype(jnp.bfloat16) @ q["stem_w"]
        c["x0"] = _requant(y.astype(jnp.float32) + q["stem_b"])
        return c

    def b1(c):
        c["b1"] = _block(c["x0"], q, None, "b1")
        return c

    def d2(c):
        d = _requant(_conv_i8(c["b1"], q["d2dn"], strides=(2, 2)))
        c["d2"] = _block(d, q, None, "d2b")
        return c

    def d3(c):
        d = _requant(_conv_i8(c["d2"], q["d3dn"], strides=(2, 2)))
        c["d3"] = _block(d, q, None, "d3b")
        return c

    def ctx(c):
        c2 = _requant(_conv_i8(c["d3"], q["ctx2"], dilation=(2, 2)))
        c4 = _conv_i8(c2, q["ctx4"], dilation=(4, 4))
        ctx_f = jax.nn.relu6(c4 + c["d3"].astype(jnp.float32) * ACT_SCALE)
        ctx_f = _se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
        c["ctx"] = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)).astype(jnp.int8)
        c["ctx_f"] = ctx_f
        return c

    def _nearest_x2(x):
        b = x.shape[:-3]
        h, w, ch = x.shape[-3:]
        return jnp.broadcast_to(
            x[..., :, None, :, None, :], b + (h, 2, w, 2, ch)
        ).reshape(b + (2 * h, 2 * w, ch))

    def split_conv(up, skip, layer):
        ca = up.shape[-1]
        la = {"wq": layer["wq"][:, :, :ca], "mult": layer["mult"],
              "bias": layer["bias"]}
        lb = {"wq": layer["wq"][:, :, ca:], "mult": layer["mult"],
              "bias": jnp.zeros_like(layer["bias"])}
        return _requant(_conv_i8(up, la) + _conv_i8(skip, lb))

    def u2(c):
        up = _nearest_x2(c["ctx"])[..., : c["d2"].shape[-3], : c["d2"].shape[-2], :]
        c["u2"] = split_conv(up, c["d2"], q["u2"])
        return c

    def u1(c):
        up = _nearest_x2(c["u2"])[..., : c["b1"].shape[-3], : c["b1"].shape[-2], :]
        c["u1"] = split_conv(up, c["b1"], q["u1"])
        return c

    def heads(c):
        u1f = c["u1"].astype(jnp.bfloat16) * jnp.bfloat16(ACT_SCALE)
        alpha_logit = (
            jax.lax.conv_general_dilated(
                u1f, q["alpha"]["kernel"].astype(jnp.bfloat16),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + q["alpha"]["bias"].astype(jnp.bfloat16)
        )
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        al = resize_bilinear_mxu(
            alpha_logit[..., 0].astype(jnp.float32), (uf * h0, uf * w0),
            method="half_pixel", channel_last=False,
            precision=jax.lax.Precision.DEFAULT,
        )
        c["alpha"] = jax.nn.sigmoid(al)
        return c

    return [
        ("stem", stem), ("b1", b1), ("d2", d2), ("d3", d3),
        ("ctx", ctx), ("u2", u2), ("u1", u1), ("heads+up", heads),
    ]


def main():
    model = models.MatteNetHD(stem_stride=SS, head_upsample=4)
    key = jax.random.PRNGKey(0)
    # init on the CPU backend: a fresh 720p init compile over the tunnel
    # is a mega-compile that degrades this process's dispatch ~100x for
    # life (see memory/ARCHITECTURE tunnel notes) -- keep the TPU's first
    # compile small and cached
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(key, jnp.zeros((1, *HW, 3)), train=False)
        params = jax.tree_util.tree_map(np.asarray, params)
    q = quantize_mattenet_hd(model, params)
    uf = 4

    x0 = jax.jit(
        lambda k: (jax.random.uniform(k, (S, HW[0] // SS, HW[1] // SS, SS * SS * 3)) * 255).astype(jnp.uint8)
    )(key)

    stages = build_stages(q, uf)
    N = 20
    results = {}
    prev = None

    for upto in range(1, len(stages) + 1):
        active = stages[:upto]

        def prefix(x):
            c = {"x": x}
            for _, fn in active:
                c = fn(c)
            # fold the deepest tensor into a scalar the next iteration's
            # input depends on -> serialized chain
            deep = c[[k for k in ("alpha", "u1", "u2", "ctx", "d3", "d2", "b1", "x0") if k in c][0]]
            return jnp.sum(deep.astype(jnp.float32) * 1e-9)

        @jax.jit
        def chain(x):
            # fori_loop keeps the compiled graph one-forward-sized (an
            # N-times unrolled 720p forward is a mega-compile over the
            # tunnel's HTTP path); the carry feeds back into the input so
            # iterations stay serialized on device
            def body(_, s):
                return s + prefix(x + (s * 0).astype(x.dtype))

            return jax.lax.fori_loop(0, N, body, jnp.float32(0))

        r = chain(x0)
        _ = float(r)  # warmup+compile, sync
        t0 = time.perf_counter()
        r = chain(x0)
        _ = float(r)
        total = (time.perf_counter() - t0) * 1e3
        # rtt estimate: re-fetch materialized scalar
        t0 = time.perf_counter()
        _ = float(r)
        rtt = (time.perf_counter() - t0) * 1e3
        per = max(total - rtt, 0.0) / N
        name = active[-1][0]
        results[name] = {
            "prefix_ms": round(per, 3),
            "stage_ms": round(per - (prev or 0.0), 3) if prev is not None else round(per, 3),
        }
        print(name, results[name], flush=True)
        prev = per

    print(json.dumps({"S": S, "stages": results}))


if __name__ == "__main__":
    main()
