"""Space-to-depth frame layout (ops/layout.py + PatchifiedConv + the
frame_layout='s2d' pipeline): the packed path must be numerically
interchangeable with the natural-layout path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops, runtime

FRAME_HW = (80, 160)
MASK_HW = (32, 64)
BLK = 5


def test_s2d_round_trip(rng):
    x = jnp.asarray((rng.random((2, 30, 40, 3)) * 255).astype(np.uint8))
    p = ops.space_to_depth(x, BLK)
    assert p.shape == (2, 6, 8, 75)
    np.testing.assert_array_equal(np.asarray(ops.depth_to_space(p, BLK)), np.asarray(x))


def test_s2d_patch_order_matches_hwio(rng):
    """Patch vector order must equal the HWIO kernel reshape: conv of the
    natural frame == packed @ kernel.reshape(-1, C)."""
    x = rng.random((1, 10, 15, 3)).astype(np.float32)
    k = rng.random((5, 5, 3, 4)).astype(np.float32)
    conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (5, 5), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    packed = ops.space_to_depth(jnp.asarray(x), 5)
    mm = packed @ jnp.asarray(k.reshape(75, 4))
    np.testing.assert_allclose(np.asarray(mm), np.asarray(conv), atol=1e-5)


def test_guide_from_s2d_matches_resize_nearest(rng):
    x = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    p = ops.space_to_depth(x, BLK)
    got = ops.guide_from_s2d(p, FRAME_HW, MASK_HW, BLK)
    want = ops.resize_nearest(x, MASK_HW, method="half_pixel")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_guide_lanes_s2d_matches_planar(rng):
    """The raw lane tensor reassembles (guide_from_gathered with block=1)
    to exactly the planar guide -- the contract the in-kernel unfold and
    the compact face path both rely on."""
    x = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    p = ops.space_to_depth(x, BLK)
    want = ops.guide_from_s2d(p, FRAME_HW, MASK_HW, BLK, planar=True)
    gl, (fy, fx) = ops.guide_lanes_s2d(p, FRAME_HW, MASK_HW, BLK)
    nl, s, hp, wp = gl.shape
    assert (nl, fy, fx) == (3 * fy * fx, MASK_HW[0] // hp, MASK_HW[1] // wp)
    got = ops.guide_from_gathered(
        jnp.moveaxis(gl, 0, -1), (hp, wp), MASK_HW, 1, planar=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_guide_from_s2d_720p_geometry():
    """The production 720p->288x512 taps are per-patch periodic (no
    fallback path)."""
    p = jnp.zeros((1, 144, 256, 75), jnp.uint8)
    g = ops.guide_from_s2d(p, (720, 1280), (288, 512), 5)
    assert g.shape == (1, 288, 512, 3)


def test_alpha_composite_s2d_matches_natural(rng):
    """Packed upsample+blend == natural-layout mxu upsample + composite
    (exact precision) within u8 rounding."""
    import jax.numpy as jnp

    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    alpha = jnp.asarray(rng.random((2, *MASK_HW)).astype(np.float32))

    a_up = jnp.clip(
        ops.resize_bilinear_mxu(
            alpha, FRAME_HW, method="half_pixel", channel_last=False,
            precision=jax.lax.Precision.HIGHEST,
        ), 0.0, 1.0,
    )
    want = ops.alpha_composite(
        frames.astype(jnp.float32) / 255.0, a_up,
        background=bg.astype(jnp.float32) / 255.0, out_u8=True,
    )
    got_p = ops.alpha_composite_s2d(
        ops.space_to_depth(frames, BLK), alpha, ops.space_to_depth(bg, BLK),
        FRAME_HW, BLK, method="half_pixel",
        precision=jax.lax.Precision.HIGHEST,
    )
    got = ops.depth_to_space(got_p, BLK)
    d = np.abs(np.asarray(got).astype(np.int16) - np.asarray(want).astype(np.int16))
    assert d.max() <= 1  # f32-vs-f32, only u8 rounding boundaries differ


def test_alpha_composite_s2d_dot30_matches_per_dy(rng):
    """The dot30 lowering (blend fused as the dot epilogue, the TPU
    serving default) is bit-identical to the per_dy reference form at
    both precisions."""
    import jax.numpy as jnp

    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    alpha = jnp.asarray(rng.random((2, *MASK_HW)).astype(np.float32))
    fp, bp = ops.space_to_depth(frames, BLK), ops.space_to_depth(bg, BLK)
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        ref = np.asarray(ops.alpha_composite_s2d(
            fp, alpha, bp, FRAME_HW, BLK, precision=prec, impl="per_dy"
        ))
        got = np.asarray(ops.alpha_composite_s2d(
            fp, alpha, bp, FRAME_HW, BLK, precision=prec, impl="dot30"
        ))
        np.testing.assert_array_equal(got, ref)


def test_alpha_composite_s2d_s_chunk_identical(rng):
    """Stream-axis chunking (the S>64 relayout-copy workaround) is pure
    slicing -- bit-identical to the unchunked form, including an uneven
    tail chunk and a shared (broadcast-1) background."""
    import jax.numpy as jnp

    s = 5
    frames = jnp.asarray((rng.random((s, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.asarray((rng.random((s, *FRAME_HW, 3)) * 255).astype(np.uint8))
    alpha = jnp.asarray(rng.random((s, *MASK_HW)).astype(np.float32))
    fp, bp = ops.space_to_depth(frames, BLK), ops.space_to_depth(bg, BLK)
    for impl in ("per_dy", "dot30"):
        ref = np.asarray(ops.alpha_composite_s2d(
            fp, alpha, bp, FRAME_HW, BLK, impl=impl
        ))
        got = np.asarray(ops.alpha_composite_s2d(
            fp, alpha, bp, FRAME_HW, BLK, impl=impl, s_chunk=2
        ))
        np.testing.assert_array_equal(got, ref)


@pytest.fixture(scope="module")
def hd():
    model = models.MatteNetHD(width=0.5)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *FRAME_HW, 3)))
    return model, params


def test_hd_packed_input_matches_natural(hd, rng):
    """Same params, packed vs natural input -> same alpha (bf16 tolerance:
    the stem contraction order differs between conv and matmul)."""
    model, params = hd
    u8 = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    nat = jax.jit(model.apply)(params, u8)["alpha"]
    packed = jax.jit(model.apply)(params, ops.space_to_depth(u8, BLK))["alpha"]
    np.testing.assert_allclose(np.asarray(packed), np.asarray(nat), atol=2e-2)


def _mk_engine(frame_layout):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", matting_input="native", guide_impl="nearest_u8",
        frame_layout=frame_layout, use_fused_refine=False,
    )
    from video_stream_segmenetation_tpu.service.engine import Engine

    return Engine(num_streams=4, statics=statics, rng_seed=0, donate_state=False)


def test_pipeline_step_s2d_matches_natural(rng):
    frames = (rng.random((4, *FRAME_HW, 3)) * 255).astype(np.uint8)
    e_nat = _mk_engine("natural")
    e_s2d = _mk_engine("s2d")
    # same init => same params
    for _ in range(4):
        e_nat.admit()
        e_s2d.admit()
    for _ in range(3):  # a few steps: temporal state must track identically
        out_n = e_nat.process(frames)
        out_s = e_s2d.process(frames)
        np.testing.assert_allclose(
            np.asarray(out_s["alpha"]), np.asarray(out_n["alpha"]), atol=3e-2
        )
        f_n = np.asarray(out_n["frame"]).astype(np.int16)
        f_s = np.asarray(out_s["frame"]).astype(np.int16)
        assert np.abs(f_s - f_n).max() <= 8  # u8 quantization of bf16 deltas
        assert np.mean(np.abs(f_s - f_n)) < 1.0


def test_engine_accepts_prepacked_frames(rng):
    frames = (rng.random((4, *FRAME_HW, 3)) * 255).astype(np.uint8)
    e = _mk_engine("s2d")
    for _ in range(4):
        e.admit()
    out_nat_in = e.process(frames)
    e2 = _mk_engine("s2d")
    for _ in range(4):
        e2.admit()
    packed = np.asarray(ops.space_to_depth(jnp.asarray(frames), BLK))
    out_packed_in = e2.process(packed)
    np.testing.assert_array_equal(
        np.asarray(out_nat_in["frame"]), np.asarray(out_packed_in["frame"])
    )


def test_face_input_guide_step(rng):
    """face_input='guide': the face subpath samples the mask-res guide;
    the step runs and face tracking still fires."""
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", matting_input="native", guide_impl="nearest_u8",
        frame_layout="s2d", face_input="guide", use_fused_refine=False,
    )
    from video_stream_segmenetation_tpu.service.engine import Engine

    e = Engine(num_streams=2, statics=statics, rng_seed=0, donate_state=False)
    e.admit()
    e.admit()
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = e.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    assert np.asarray(out["alpha"]).shape == (2, *MASK_HW)


def test_guide_from_s2d_block10_matches_resize_nearest(rng):
    x = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    p = ops.space_to_depth(x, 10)
    got = ops.guide_from_s2d(p, FRAME_HW, MASK_HW, 10)
    want = ops.resize_nearest(x, MASK_HW, method="half_pixel")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_alpha_composite_s2d_block10(rng):
    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    alpha = jnp.asarray(rng.random((2, *MASK_HW)).astype(np.float32))
    a_up = jnp.clip(
        ops.resize_bilinear_mxu(
            alpha, FRAME_HW, method="half_pixel", channel_last=False,
            precision=jax.lax.Precision.HIGHEST,
        ), 0.0, 1.0,
    )
    want = ops.alpha_composite(
        frames.astype(jnp.float32) / 255.0, a_up,
        background=bg.astype(jnp.float32) / 255.0, out_u8=True,
    )
    got = ops.depth_to_space(
        ops.alpha_composite_s2d(
            ops.space_to_depth(frames, 10), alpha, ops.space_to_depth(bg, 10),
            FRAME_HW, 10, method="half_pixel",
            precision=jax.lax.Precision.HIGHEST,
        ), 10,
    )
    d = np.abs(np.asarray(got).astype(np.int16) - np.asarray(want).astype(np.int16))
    assert d.max() <= 1
