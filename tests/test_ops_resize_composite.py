"""Golden tests: resize conventions, color, compositing, blur."""

import numpy as np

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops
from tests import oracles

H, W = 24, 32


def test_resize_tfjs_asymmetric(rng):
    img = rng.random((12, 16, 3), dtype=np.float32)
    expect = oracles.resize_bilinear_tfjs_oracle(img, H, W)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(img), (H, W), method="asymmetric"))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_resize_tfjs_downscale(rng):
    img = rng.random((48, 64, 3), dtype=np.float32)
    expect = oracles.resize_bilinear_tfjs_oracle(img, H, W)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(img), (H, W), method="asymmetric"))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_resize_align_corners_matches_js_upscale(rng):
    src = rng.random((9, 12), dtype=np.float32)
    expect = oracles.bilinear_upscale_align_corners_oracle(src, W, H)
    got = np.asarray(
        jnp.clip(
            ops.resize_bilinear(jnp.asarray(src), (H, W), method="align_corners", channel_last=False),
            0.0,
            1.0,
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_resize_half_pixel_identity(rng):
    img = rng.random((H, W), dtype=np.float32)
    got = np.asarray(
        ops.resize_bilinear(jnp.asarray(img), (H, W), method="half_pixel", channel_last=False)
    )
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_resize_batched(rng):
    img = rng.random((2, 3, 12, 16, 3), dtype=np.float32)
    got = np.asarray(ops.resize_bilinear(jnp.asarray(img), (H, W)))
    assert got.shape == (2, 3, H, W, 3)
    expect = oracles.resize_bilinear_tfjs_oracle(img[1, 2], H, W)
    np.testing.assert_allclose(got[1, 2], expect, rtol=1e-5, atol=1e-6)


def test_crop_and_resize_full_box_is_resize(rng):
    img = rng.random((48, 64, 3), dtype=np.float32)
    got = np.asarray(
        ops.crop_and_resize(jnp.asarray(img), jnp.asarray([0.0, 0.0, 64.0, 48.0]), (H, W))
    )
    expect = np.asarray(
        ops.resize_bilinear(jnp.asarray(img), (H, W), method="half_pixel")
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_crop_and_resize_subbox(rng):
    img = rng.random((48, 64, 3), dtype=np.float32)
    box = jnp.asarray([10.0, 8.0, 42.0, 32.0])
    got = np.asarray(ops.crop_and_resize(jnp.asarray(img), box, (24, 32)))
    crop = img[8:32, 10:42]
    expect = np.asarray(
        ops.resize_bilinear(jnp.asarray(crop), (24, 32), method="half_pixel")
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_normalize_modes(rng):
    u8 = (rng.random((4, 4, 3)) * 255).astype(np.uint8)
    unit = np.asarray(ops.normalize_frame(jnp.asarray(u8)))
    np.testing.assert_allclose(unit, u8 / 255.0, rtol=1e-6)
    cen = np.asarray(ops.normalize_frame(jnp.asarray(u8), "centered"))
    np.testing.assert_allclose(cen, u8 / 255.0 * 2 - 1, rtol=1e-5, atol=1e-6)
    imn = np.asarray(ops.normalize_frame(jnp.asarray(u8), "imagenet"))
    np.testing.assert_allclose(
        imn,
        (u8 / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225],
        rtol=1e-4,
        atol=1e-5,
    )


def test_quantize_alpha_matches_js_round():
    a = jnp.asarray([0.0, 0.001, 0.5, 0.998, 1.0, 1.5, -0.2])
    got = np.asarray(ops.quantize_alpha_u8(a))
    expect = np.array([round(min(max(v, 0.0), 1.0) * 255) / 255 for v in np.asarray(a)])
    np.testing.assert_allclose(got, expect, atol=1e-7)


def test_denormalize_u8_round_half_up():
    x = jnp.asarray([0.5 / 255, 1.49 / 255, 1.5 / 255, 254.5 / 255])
    got = np.asarray(ops.denormalize_to_u8(x))
    np.testing.assert_array_equal(got, [1, 1, 2, 255])


def test_alpha_composite_solid_color(rng):
    frame = (rng.random((12, 16, 3)) * 255).astype(np.float32)
    alpha = rng.random((12, 16), dtype=np.float32)
    got = np.asarray(
        ops.alpha_composite(jnp.asarray(frame), jnp.asarray(alpha), bg_color=(20, 25, 30))
    )
    expect = frame * alpha[..., None] + np.array([20, 25, 30]) * (1 - alpha[..., None])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-4)


def test_alpha_composite_reference_explicit_blend(rng):
    """Parity with explicitAlphaBlend (frameProcessor.ts:422-448):
    align_corners upscale + constant bg + Math.round u8 output."""
    frame = (rng.random((12, 16, 3)) * 255).astype(np.float32)
    alpha = rng.random((6, 8), dtype=np.float32)
    got = np.asarray(
        ops.alpha_composite(
            jnp.asarray(frame / 255.0),
            jnp.asarray(alpha),
            bg_color=(20 / 255.0, 25 / 255.0, 30 / 255.0),
            upsample_method="align_corners",
            out_u8=True,
        )
    )
    up = oracles.bilinear_upscale_align_corners_oracle(alpha, 16, 12)
    expect = np.floor(
        (frame * up[..., None] + np.array([20.0, 25.0, 30.0]) * (1 - up[..., None])) + 0.5
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, expect)


def test_alpha_composite_image_bg_and_upsample(rng):
    frame = rng.random((2, 12, 16, 3), dtype=np.float32)
    bg = rng.random((2, 12, 16, 3), dtype=np.float32)
    alpha = rng.random((2, 6, 8), dtype=np.float32)
    got = np.asarray(
        ops.alpha_composite(jnp.asarray(frame), jnp.asarray(alpha), background=jnp.asarray(bg))
    )
    up = np.asarray(ops.upsample_alpha(jnp.asarray(alpha), (12, 16)))
    expect = frame * up[..., None] + bg * (1 - up[..., None])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_alpha_composite_blur_bg(rng):
    frame = rng.random((12, 16, 3), dtype=np.float32)
    alpha = np.zeros((12, 16), dtype=np.float32)  # all background
    got = np.asarray(
        ops.alpha_composite(jnp.asarray(frame), jnp.asarray(alpha), bg_blur_sigma=2.0)
    )
    expect = np.asarray(ops.gaussian_blur(jnp.asarray(frame), 2.0))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_gaussian_blur_preserves_mean(rng):
    img = rng.random((32, 32, 3), dtype=np.float32)
    out = np.asarray(ops.gaussian_blur(jnp.asarray(img), 1.5))
    assert abs(out.mean() - img.mean()) < 5e-3
    assert out.std() < img.std()  # smoothing


def test_box_blur_constant_invariant():
    img = jnp.full((16, 16, 3), 0.5)
    out = np.asarray(ops.box_blur(img, 2))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_crop_and_resize_mxu_matches_gather(rng):
    """Matmul crop == gather crop exactly (same taps/clamp/fill),
    including boxes partly outside the frame."""
    import jax
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops

    img = jnp.asarray(rng.random((3, 36, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(
        [
            [5.0, 3.0, 40.0, 30.0],
            [-10.0, -5.0, 20.0, 20.0],  # partly out of frame (fill)
            [50.0, 20.0, 80.0, 45.0],   # off right/bottom edge
        ],
        jnp.float32,
    )
    want = jax.vmap(
        lambda im, b: ops.crop_and_resize(im, b, (24, 24))
    )(img, boxes)
    got = ops.crop_and_resize_mxu(img, boxes, (24, 24))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
