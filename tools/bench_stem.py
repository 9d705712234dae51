"""Micro-benchmark: MatteNetHD stem formulations on real TPU.

The stem is a 5x5 stride-5 conv on uint8 720p frames -- non-overlapping
patches, so it is exactly a reshape + [75,32] matmul.  The question is
which lowering XLA executes fastest (the current lax.conv path costs
~7.7 ms of the 26.7 ms S=64 step, tools/bench_components.py):

  A conv        u8 -> bf16/255 -> lax.conv 5x5/5            (current)
  B patch_u8    u8 reshape -> u8 transpose -> bf16 matmul (W/255 folded)
  C patch_bf16  u8 -> bf16 -> transpose -> matmul
  D dotgen      dot_general over [S,144,5,256,15], contract (2,4) - XLA picks
  E slices      sum of 5 strided-slice [.,.,.,15] @ [15,32] matmuls

All variants end with folded BN scale/bias + relu6, out [S,144,256,32] bf16.
Run: JAX_PLATFORMS= python tools/bench_stem.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

S, H, W, KS, CO = 64, 720, 1280, 5, 32
HH, WW = H // KS, W // KS


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    frames = jax.jit(
        lambda k: (jax.random.uniform(k, (S, H, W, 3)) * 255).astype(jnp.uint8)
    )(key)
    kw, kb = jax.random.split(key)
    wconv = (jax.random.normal(kw, (KS, KS, 3, CO)) * 0.1).astype(jnp.float32)
    scale = jnp.ones((CO,), jnp.float32)
    bias = jnp.zeros((CO,), jnp.float32)

    def epilogue(y):
        return jnp.clip(y * scale.astype(y.dtype) + bias.astype(y.dtype), 0, 6)

    def v_conv(x, w):
        xf = x.astype(jnp.bfloat16) / 255.0
        y = jax.lax.conv_general_dilated(
            xf,
            w.astype(jnp.bfloat16),
            (KS, KS),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return epilogue(y)

    def v_patch_u8(x, w):
        w75 = (w.reshape(KS * KS * 3, CO) / 255.0).astype(jnp.bfloat16)
        xb = x.reshape(S, HH, KS, WW, KS * 3)
        xb = xb.transpose(0, 1, 3, 2, 4).reshape(S, HH, WW, KS * KS * 3)
        return epilogue(xb.astype(jnp.bfloat16) @ w75)

    def v_patch_bf16(x, w):
        w75 = (w.reshape(KS * KS * 3, CO) / 255.0).astype(jnp.bfloat16)
        xb = x.reshape(S, HH, KS, WW, KS * 3).astype(jnp.bfloat16)
        xb = xb.transpose(0, 1, 3, 2, 4).reshape(S, HH, WW, KS * KS * 3)
        return epilogue(xb @ w75)

    def v_dotgen(x, w):
        w515 = (w.reshape(KS, KS * 3, CO) / 255.0).astype(jnp.bfloat16)
        xb = x.reshape(S, HH, KS, WW, KS * 3).astype(jnp.bfloat16)
        y = jax.lax.dot_general(xb, w515, (((2, 4), (0, 1)), ((), ())))
        return epilogue(y)

    def v_slices(x, w):
        w515 = (w.reshape(KS, KS * 3, CO) / 255.0).astype(jnp.bfloat16)
        xb = x.reshape(S, HH, KS, WW, KS * 3)
        y = functools.reduce(
            lambda a, b: a + b,
            [xb[:, :, d].astype(jnp.bfloat16) @ w515[d] for d in range(KS)],
        )
        return epilogue(y)

    variants = {
        "A_conv": v_conv,
        "B_patch_u8": v_patch_u8,
        "C_patch_bf16": v_patch_bf16,
        "D_dotgen": v_dotgen,
        "E_slices": v_slices,
    }

    reducer = jax.jit(lambda y: jnp.sum(y[:2, :2, :2, 0].astype(jnp.float32)))
    ref = None
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        # serialization: next input depends on previous output via 1 byte
        def chain(x, w, n, jfn=jfn):
            for _ in range(n):
                y = jfn(x, w)
                x = x ^ (y[0, 0, 0, 0] > 1e9).astype(jnp.uint8)
            return y

        y = chain(frames, wconv, 2)
        got = float(np.asarray(reducer(y)))
        if ref is None:
            ref = got
        t0 = time.perf_counter()
        _ = np.asarray(reducer(y))
        rtt = (time.perf_counter() - t0) * 1e3

        n = 20
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            y = chain(frames, wconv, n)
            _ = np.asarray(reducer(y))
            best = min(best, ((time.perf_counter() - t0) * 1e3 - rtt) / n)
        print(
            f"{name:14s} {best:7.2f} ms  (check {got:+.3f} vs {ref:+.3f},"
            f" d={abs(got - ref):.4f})"
        )


if __name__ == "__main__":
    main()
