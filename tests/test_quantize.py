"""Weight quantization: roundtrip accuracy, model-through-quant inference."""

import numpy as np

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models
from video_stream_segmenetation_tpu.utils import quantize as qz


def test_int8_roundtrip_error_small(rng):
    x = jnp.asarray(rng.normal(0, 0.1, (64, 32)).astype(np.float32))
    q = qz.quantize_tree({"w": x}, bits=8, min_size=1)
    d = qz.dequantize_tree(q)["w"]
    assert d.dtype == x.dtype
    rel = float(jnp.max(jnp.abs(d - x)) / jnp.max(jnp.abs(x)))
    assert rel < 1e-2  # int8 symmetric per-channel


def test_int4_roundtrip_coarser(rng):
    x = jnp.asarray(rng.normal(0, 0.1, (64, 32)).astype(np.float32))
    e8 = qz.quantization_error({"w": x}, bits=8)
    e4 = qz.quantization_error({"w": x}, bits=4)
    assert e4 > e8
    assert e4 < 0.1


def test_small_leaves_passthrough():
    p = {"bias": jnp.zeros((8,)), "big": jnp.ones((64, 64))}
    q = qz.quantize_tree(p, min_size=1024)
    assert isinstance(q["bias"], jnp.ndarray)
    assert isinstance(q["big"], dict) and q["big"]["__quant__"]


def test_model_inference_through_quantized_weights():
    model = models.MatteNet(width=0.5)
    x = jnp.ones((1, 32, 64, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x)
    a0 = np.asarray(model.apply(params, x)["alpha"])
    deq = qz.dequantize_tree(qz.quantize_tree(params, bits=8, min_size=256))
    a1 = np.asarray(model.apply(deq, x)["alpha"])
    # int8 weights perturb the output only slightly
    assert np.abs(a1 - a0).max() < 0.06


def test_stochastic_round_cpu_fallback(rng):
    x = jnp.asarray(rng.normal(0, 1, (8, 128)).astype(np.float32))
    out = qz.stochastic_round_bf16(x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(x), rtol=0.01, atol=0.01
    )
