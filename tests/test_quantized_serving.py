"""int8 serving graph (models/quantized.py): must track the bf16 flax
forward closely enough that the downstream refine chain sees the same
matte (the reference itself serves a quantized flagship,
model_q4f16.onnx, client/src/core/main.ts:6)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops, runtime
from video_stream_segmenetation_tpu.models.quantized import (
    QuantizedMatteNetHD,
    quantize_mattenet_hd,
)

FRAME_HW = (80, 160)
MASK_HW = (32, 64)
BLK = 10


@pytest.fixture(scope="module")
def hd_b():
    model = models.MatteNetHD(width=0.5, stem_stride=BLK, head_upsample=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    return model, params


def test_int8_matches_bf16(hd_b, rng):
    model, params = hd_b
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])

    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(stem_stride=BLK, head_upsample=4)
    got = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])

    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02
    assert np.max(np.abs(got - ref)) < 0.25


def test_int8_stem_matches_bf16_stem(hd_b, rng):
    """stem_impl='int8' (x-128 shift + s8 matmul): per-output-channel
    weight quantization is the same relative-error class as the bf16
    stem, so the matte must track the bf16-stem int8 graph closely."""
    model, params = hd_b
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    q = quantize_mattenet_hd(model, params)
    a_bf = np.asarray(
        jax.jit(QuantizedMatteNetHD(stem_stride=BLK, head_upsample=4).apply)(
            q, packed
        )["alpha"]
    )
    a_i8 = np.asarray(
        jax.jit(
            QuantizedMatteNetHD(
                stem_stride=BLK, head_upsample=4, stem_impl="int8"
            ).apply
        )(q, packed)["alpha"]
    )
    assert np.mean(np.abs(a_i8 - a_bf)) < 0.02
    assert np.max(np.abs(a_i8 - a_bf)) < 0.25


def test_int8_accepts_natural_input(hd_b, rng):
    model, params = hd_b
    u8 = jnp.asarray((rng.random((1, *FRAME_HW, 3)) * 255).astype(np.uint8))
    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(stem_stride=BLK, head_upsample=4)
    a_nat = np.asarray(qm.apply(q, u8)["alpha"])
    a_pk = np.asarray(qm.apply(q, ops.space_to_depth(u8, BLK))["alpha"])
    np.testing.assert_array_equal(a_nat, a_pk)


def test_plan_a_rejected(hd_b):
    model = models.MatteNetHD(width=0.5)  # stride 5 = plan A
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    with pytest.raises(ValueError):
        quantize_mattenet_hd(model, params)


def test_engine_int8_step(rng):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", matting_input="native", guide_impl="nearest_u8",
        frame_layout="s2d", s2d_block=BLK, face_input="guide",
        matting_precision="int8", use_fused_refine=False,
    )
    from video_stream_segmenetation_tpu.service.engine import Engine

    e = Engine(num_streams=2, statics=statics, rng_seed=0, donate_state=False)
    e.admit()
    e.admit()
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = e.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    assert out["metrics"]["health"]["state"] == "ok"
    a = np.asarray(out["alpha"])
    assert a.shape == (2, *MASK_HW) and np.isfinite(a).all()


def test_plan_c_int8_matches_bf16(rng):
    """Plan-C (decoder='light') int8 graph tracks its bf16 forward."""
    model = models.MatteNetHD(
        width=0.5, stem_stride=BLK, head_upsample=4, decoder="light"
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(
        stem_stride=BLK, head_upsample=4, decoder="light"
    )
    got = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02
    assert np.max(np.abs(got - ref)) < 0.25


def test_plan_c_engine_preset(rng):
    """fast_int8_lite preset builds and steps (small geometry)."""
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    statics = preset(
        "fast_int8_lite", frame_hw=FRAME_HW, mask_hw=MASK_HW,
        fd_size=64, lmk_size=48, face_path=False, background="color",
        use_fused_refine=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    assert out["metrics"]["health"]["state"] == "ok"


def test_pallas_conv_impl_matches_xla(hd_b, rng):
    """conv_impl='pallas' (kernels/conv_int8.py, interpret mode on CPU)
    must be numerically identical to the XLA int8 graph -- same lattice,
    same rounding -- for both decoder plans and the dilated ctx convs."""
    model, params = hd_b
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    q = quantize_mattenet_hd(model, params)
    a_xla = np.asarray(
        jax.jit(QuantizedMatteNetHD(stem_stride=BLK, head_upsample=4).apply)(
            q, packed
        )["alpha"]
    )
    a_pl = np.asarray(
        jax.jit(
            QuantizedMatteNetHD(
                stem_stride=BLK, head_upsample=4, conv_impl="pallas"
            ).apply
        )(q, packed)["alpha"]
    )
    np.testing.assert_allclose(a_pl, a_xla, atol=1e-6)


def test_pallas_conv_impl_plan_c(rng):
    model = models.MatteNetHD(
        width=0.5, stem_stride=BLK, head_upsample=4, decoder="light"
    )
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, *FRAME_HW, 3)))
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    q = quantize_mattenet_hd(model, params)
    kw = dict(stem_stride=BLK, head_upsample=4, decoder="light")
    a_xla = np.asarray(
        jax.jit(QuantizedMatteNetHD(**kw).apply)(q, packed)["alpha"]
    )
    a_pl = np.asarray(
        jax.jit(QuantizedMatteNetHD(conv_impl="pallas", **kw).apply)(
            q, packed
        )["alpha"]
    )
    np.testing.assert_allclose(a_pl, a_xla, atol=1e-6)


def test_plan_d_int8_matches_bf16(rng):
    """Plan-D (decoder='micro') int8 graph tracks its bf16 forward and
    the Pallas conv routing is exact."""
    model = models.MatteNetHD(
        width=0.5, stem_stride=BLK, head_upsample=4, decoder="micro"
    )
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, *FRAME_HW, 3)))
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    kw = dict(stem_stride=BLK, head_upsample=4, decoder="micro")
    got = np.asarray(jax.jit(QuantizedMatteNetHD(**kw).apply)(q, packed)["alpha"])
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02
    assert np.max(np.abs(got - ref)) < 0.25
    gp = np.asarray(
        jax.jit(QuantizedMatteNetHD(conv_impl="pallas", **kw).apply)(
            q, packed
        )["alpha"]
    )
    np.testing.assert_allclose(gp, got, atol=1e-6)


def test_plan_d_engine_preset(rng):
    """fast_int8_micro preset builds and steps (small geometry)."""
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    statics = preset(
        "fast_int8_micro", frame_hw=FRAME_HW, mask_hw=MASK_HW,
        fd_size=64, lmk_size=48, face_path=False, background="color",
        use_fused_refine=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    assert out["metrics"]["health"]["state"] == "ok"


def test_plan_e_int8_matches_bf16(rng):
    """Plan-E (decoder='nano') int8 graph tracks its bf16 forward; engine
    preset builds and steps."""
    model = models.MatteNetHD(
        width=0.5, stem_stride=BLK, head_upsample=4, decoder="nano"
    )
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, *FRAME_HW, 3)))
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)
    ref = np.asarray(jax.jit(model.apply)(params, packed)["alpha"])
    q = quantize_mattenet_hd(model, params)
    kw = dict(stem_stride=BLK, head_upsample=4, decoder="nano")
    got = np.asarray(jax.jit(QuantizedMatteNetHD(**kw).apply)(q, packed)["alpha"])
    assert got.shape == ref.shape
    assert np.mean(np.abs(got - ref)) < 0.02

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    statics = preset(
        "fast_int8_nano", frame_hw=FRAME_HW, mask_hw=MASK_HW,
        fd_size=64, lmk_size=48, face_path=False, background="color",
        use_fused_refine=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["metrics"]["health"]["state"] == "ok"


def test_stem_aux_guide_exact(rng):
    """The planar guide gather riding the stem matmul as extra one-hot
    columns (stem_aux_cols) is bit-exact vs the standalone lane-gather,
    and the alpha output is unchanged (each dot column is an independent
    contraction)."""
    from video_stream_segmenetation_tpu.ops.layout import (
        guide_from_gathered,
        guide_s2d_sel,
    )

    model = models.MatteNetHD(
        width=0.5, stem_stride=BLK, head_upsample=4, decoder="nano"
    )
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, *FRAME_HW, 3)))
    q = quantize_mattenet_hd(model, params)
    qm = QuantizedMatteNetHD(stem_stride=BLK, head_upsample=4, decoder="nano")
    assert qm.supports_stem_aux

    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    packed = ops.space_to_depth(u8, BLK)

    sel = guide_s2d_sel(FRAME_HW, MASK_HW, BLK, planar=True)
    assert sel is not None
    onehot = np.zeros((packed.shape[-1], len(sel)), np.float32)
    onehot[np.asarray(sel), np.arange(len(sel))] = 1.0

    out = jax.jit(qm.apply)(q, packed, stem_aux_cols=jnp.asarray(onehot, jnp.bfloat16))
    g_fused = np.asarray(
        guide_from_gathered(out["stem_aux"], FRAME_HW, MASK_HW, BLK, planar=True)
    )
    g_ref = np.asarray(
        ops.guide_from_s2d(packed, FRAME_HW, MASK_HW, BLK, planar=True)
    )
    np.testing.assert_array_equal(g_fused, g_ref)

    a_plain = np.asarray(jax.jit(qm.apply)(q, packed)["alpha"])
    np.testing.assert_array_equal(np.asarray(out["alpha"]), a_plain)


def test_stem_aux_engine_pipeline(rng):
    """Engine with guide_stem_aux=True (planar guide riding the stem
    matmul) matches the default separate-gather pipeline bit-for-bit.
    The fusion is OFF by default — measured slower on v5e (see
    PipelineStatics.guide_stem_aux) — but stays pinned here."""
    import dataclasses as _dc

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    statics = preset(
        "fast_int8_nano", frame_hw=FRAME_HW, mask_hw=MASK_HW,
        fd_size=64, lmk_size=48, background="color",
    )
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    eng = Engine(
        num_streams=2,
        statics=_dc.replace(statics, guide_stem_aux=True),
        rng_seed=0,
        donate_state=False,
    )
    out_fused = eng.process(frames)

    eng2 = Engine(num_streams=2, statics=statics, rng_seed=0,
                  donate_state=False)
    out_plain = eng2.process(frames)

    np.testing.assert_array_equal(
        np.asarray(out_fused["frame"]), np.asarray(out_plain["frame"])
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["alpha"]), np.asarray(out_plain["alpha"]),
        atol=1e-6,
    )
