"""Multiclass fast stack (BASELINE config 5 on the s2d/int8 path):
ops.multiclass_composite_s2d, the K-class int8 graph, and the s2d
multiclass engine step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops, runtime
from video_stream_segmenetation_tpu.service import Engine

FRAME_HW = (80, 160)
MASK_HW = (32, 64)
BLK = 5

EFFECTS = (
    {"blur": 4.0},
    {"keep": True},
    {"tint": (0.9, 0.2, 0.2), "strength": 0.4},
)


def _simplex(rng, s, k):
    a = rng.random((s, *MASK_HW, k)).astype(np.float32) + 0.1
    return a / a.sum(-1, keepdims=True)


def test_multiclass_composite_s2d_oracle(rng):
    """Packed per-class composite == natural-layout reference with the
    same documented semantics (ops/layout.py::multiclass_composite_s2d):
    out = up(w_f) * frame + up(R), where w_f = sum_k alpha_k a_k and
    R = blurred*255*sum_k beta_k a_k + sum_k c_k a_k are composed at
    class-map resolution from the re-normalized simplex and upsampled
    once (mxu taps); blur uses the nearest guide with sigma*mh/fh."""
    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    ca = jnp.asarray(_simplex(rng, 2, 3))
    fp = ops.space_to_depth(frames, BLK)

    got = ops.depth_to_space(
        ops.multiclass_composite_s2d(
            fp, ca, list(EFFECTS), FRAME_HW, BLK,
            method="half_pixel", precision=jax.lax.Precision.HIGHEST,
        ),
        BLK,
    )

    # natural-layout oracle of the same semantics
    # EFFECTS: blur 4.0 | keep | tint (0.9,0.2,0.2) strength 0.4
    can = ca / jnp.maximum(ca.sum(-1, keepdims=True), 1e-6)
    alpha_w = jnp.asarray([0.0, 1.0, 0.6])
    beta_w = jnp.asarray([1.0, 0.0, 0.0])
    cmat = jnp.zeros((3, 3)).at[2].set(
        jnp.asarray([0.9, 0.2, 0.2]) * 255.0 * 0.4
    )
    w_f = jnp.einsum("smwk,k->smw", can, alpha_w)
    w_b = jnp.einsum("smwk,k->smw", can, beta_w)
    rgb = jnp.einsum("smwk,kc->smwc", can, cmat)
    guide = ops.guide_from_s2d(fp, FRAME_HW, MASK_HW, BLK).astype(jnp.float32) / 255.0
    from video_stream_segmenetation_tpu.ops.blur import gaussian_blur_mxu

    sigma_small = max(4.0 * MASK_HW[0] / FRAME_HW[0], 0.5)
    blurred = jnp.clip(gaussian_blur_mxu(guide, sigma_small), 0.0, 1.0)
    rgb = rgb + blurred * 255.0 * w_b[..., None]

    up1 = lambda p: ops.resize_bilinear_mxu(
        p, FRAME_HW, method="half_pixel", channel_last=False,
        precision=jax.lax.Precision.HIGHEST,
    )
    wf_up = up1(w_f)
    rgb_up = jnp.stack([up1(rgb[..., c]) for c in range(3)], axis=-1)
    want = frames.astype(jnp.float32) * wf_up[..., None] + rgb_up
    want = np.clip(np.floor(np.asarray(want) + 0.5), 0, 255).astype(np.uint8)

    d = np.abs(np.asarray(got).astype(np.int16) - want.astype(np.int16))
    assert d.max() <= 1  # u8 rounding boundaries only


def test_multiclass_int8_matches_bf16(rng):
    model = models.MatteNetHD(
        width=0.5, stem_stride=10, head_upsample=4, num_classes=3
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 3)))
    from video_stream_segmenetation_tpu.models.quantized import (
        QuantizedMatteNetHD,
        quantize_mattenet_hd,
    )

    u8 = jnp.asarray((rng.random((2, 80, 160, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, 10)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(stem_stride=10, head_upsample=4, num_classes=3)
    got = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02
    # maps are a softmax simplex
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)


@pytest.fixture(scope="module")
def fast_engine():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        num_classes=3, class_effects=EFFECTS,
        # stride-10 stem (the int8 path is plan-B only): 80x160/10 ->
        # 8x16 grid, mask 32x64 = 4x upsample
        matting_input="native", frame_layout="s2d", s2d_block=10,
        matting_precision="int8", face_path=False,
    )
    return Engine(num_streams=2, statics=statics, donate_state=False)


def test_multiclass_s2d_engine_step(fast_engine, rng):
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = fast_engine.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    ca = np.asarray(out["class_alpha"])
    assert ca.shape == (2, *MASK_HW, 3)
    np.testing.assert_allclose(ca.sum(-1), 1.0, atol=1e-3)
    # temporal EMA state must evolve on the class maps
    out2 = fast_engine.process(frames)
    assert np.asarray(fast_engine.state.frame_idx).min() >= 2
    assert out2["frame"].shape == (2, *FRAME_HW, 3)


def test_multiclass_fast_preset():
    from video_stream_segmenetation_tpu.runtime.presets import preset

    p = preset("multiclass_fast")
    assert p.num_classes == 4
    assert p.frame_layout == "s2d"
    assert p.matting_precision == "int8"
    # must match the mattenet_hd10_mc checkpoint's architecture
    # (tools/train_variants.py::train_multiclass_hd: decoder='nano')
    assert p.matting_decoder == "nano"


def test_multiclass_fast_pico_preset():
    from video_stream_segmenetation_tpu.runtime.presets import preset

    p = preset("multiclass_fast_pico")
    assert p.num_classes == 4
    assert p.frame_layout == "s2d"
    assert p.matting_precision == "int8"
    # must match the mattenet_hd10_mc_pico checkpoint's architecture
    # (tools/train_variants.py::train_multiclass_hd: decoder='pico')
    assert p.matting_decoder == "pico"


def test_multiclass_pico_int8_matches_bf16(rng):
    """K-class plan-F (decoder='pico') int8 graph tracks bf16 — the
    multiclass megakernel route (fused_nano_trunk without the in-kernel
    head, then the XLA int8 K-class head)."""
    model = models.MatteNetHD(
        stem_stride=10, head_upsample=4, num_classes=3, decoder="pico",
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 3)))
    from video_stream_segmenetation_tpu.models.quantized import (
        QuantizedMatteNetHD,
        quantize_mattenet_hd,
    )

    u8 = jnp.asarray((rng.random((2, 80, 160, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, 10)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    for impl in ("xla", "trunk"):
        qm = QuantizedMatteNetHD(
            stem_stride=10, head_upsample=4, num_classes=3, decoder="pico",
            decoder_impl=impl,
        )
        got = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])
        assert got.shape == ref.shape
        assert np.mean(np.abs(got - ref)) < 0.02, impl
        np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)


def test_multiclass_pico_s2d_engine_step(rng):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        num_classes=3, class_effects=EFFECTS,
        matting_input="native", frame_layout="s2d", s2d_block=10,
        matting_precision="int8", matting_decoder="pico", face_path=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    ca = np.asarray(out["class_alpha"])
    assert ca.shape == (2, *MASK_HW, 3)
    np.testing.assert_allclose(ca.sum(-1), 1.0, atol=1e-3)


def test_multiclass_plan_c_int8_matches_bf16(rng):
    """K-class plan-C (decoder='light') int8 graph tracks bf16."""
    model = models.MatteNetHD(
        width=0.5, stem_stride=10, head_upsample=4, num_classes=3,
        decoder="light",
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 160, 3)))
    from video_stream_segmenetation_tpu.models.quantized import (
        QuantizedMatteNetHD,
        quantize_mattenet_hd,
    )

    u8 = jnp.asarray((rng.random((2, 80, 160, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, 10)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(
        stem_stride=10, head_upsample=4, num_classes=3, decoder="light"
    )
    got = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-3)
