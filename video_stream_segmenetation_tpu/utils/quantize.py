"""Weight quantization: the q4f16/int8 story.

The reference's flagship ships as a 4-bit/f16 quantized ONNX
(model_q4f16.onnx, client/src/core/main.ts:6) and its u8 mask-output path
(squeezeMaskTo2D, frameProcessorTest.ts:193-197) exists because of it.
Here the equivalent capability: symmetric per-channel int8 (and int4)
quantization of conv/dense kernels for checkpoint compression and
bandwidth-bound serving, plus dequantize-on-load.  A Pallas stochastic-
rounding kernel covers on-device quantization (pallas_guide.md pattern).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tree(params, bits: int = 8, min_size: int = 1024):
    """Quantize every float leaf with >= min_size elements to intN with a
    per-output-channel (last axis) scale.  Returns a pytree of
    {'q': int8, 'scale': f32, 'dtype': str} dicts (small leaves pass
    through).  Structure is preserved for `dequantize_tree`.
    """
    qmax = 2 ** (bits - 1) - 1

    def quant(leaf):
        if not isinstance(leaf, (jnp.ndarray, np.ndarray)) or leaf.size < min_size:
            return leaf
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return leaf
        x = jnp.asarray(leaf, jnp.float32)
        axes = tuple(range(x.ndim - 1))
        amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
        scale = jnp.maximum(amax / qmax, 1e-12)
        q = jnp.clip(jnp.round(x / scale), -qmax - 1, qmax).astype(jnp.int8)
        return {
            "__quant__": True,
            "q": q,
            "scale": scale,
            "orig_dtype": str(leaf.dtype),
            "bits": bits,
        }

    return jax.tree_util.tree_map(quant, params)


def dequantize_tree(qparams):
    def dequant(leaf):
        if isinstance(leaf, dict) and leaf.get("__quant__"):
            x = leaf["q"].astype(jnp.float32) * leaf["scale"]
            return x.astype(leaf["orig_dtype"])
        return leaf

    return jax.tree_util.tree_map(
        dequant, qparams, is_leaf=lambda l: isinstance(l, dict) and l.get("__quant__")
    )


def quantization_error(params, bits: int = 8) -> float:
    """Max relative reconstruction error across quantized leaves."""
    deq = dequantize_tree(quantize_tree(params, bits))
    errs = []
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(deq)):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        denom = jnp.maximum(jnp.max(jnp.abs(a)), 1e-12)
        errs.append(float(jnp.max(jnp.abs(a - b)) / denom))
    return max(errs) if errs else 0.0


def stochastic_round_bf16(x: jnp.ndarray, seed: int = 0) -> jnp.ndarray:
    """On-device stochastic rounding f32 -> bf16 via the TPU PRNG
    (Pallas; interpreter off-TPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(seed_ref, x_ref, o_ref):
        pltpu.prng_seed(seed_ref[0])
        bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
        o_ref[...] = pltpu.stochastic_round(
            x_ref[...], bits, target_dtype=jnp.bfloat16
        )

    interpret = jax.default_backend() != "tpu"
    if interpret:
        # interpreter lacks the TPU PRNG; deterministic round is the stand-in
        return x.astype(jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
    )(jnp.asarray([seed], jnp.int32), x.astype(jnp.float32))
