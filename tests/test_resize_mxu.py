"""MXU-matmul resize must match the gather path tap-for-tap."""

import numpy as np

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops


def test_mxu_matches_gather_all_methods(rng):
    img = jnp.asarray(rng.random((2, 48, 64, 3), dtype=np.float32))
    for method in ("asymmetric", "half_pixel", "align_corners"):
        for out_hw in ((24, 32), (96, 128), (30, 50)):
            g = ops.resize_bilinear(img, out_hw, method=method)
            m = ops.resize_bilinear_mxu(img, out_hw, method=method)
            np.testing.assert_allclose(
                np.asarray(m), np.asarray(g), rtol=1e-5, atol=1e-5,
                err_msg=f"{method} {out_hw}",
            )


def test_mxu_channelless(rng):
    a = jnp.asarray(rng.random((3, 36, 64), dtype=np.float32))
    g = ops.resize_bilinear(a, (72, 128), method="half_pixel", channel_last=False)
    m = ops.resize_bilinear_mxu(a, (72, 128), method="half_pixel", channel_last=False)
    np.testing.assert_allclose(np.asarray(m), np.asarray(g), rtol=1e-5, atol=1e-5)


def test_mxu_default_precision_close(rng):
    """DEFAULT precision (fast path for preprocess) stays within bf16-ish
    tolerance of the exact result."""
    img = jnp.asarray(rng.random((1, 72, 128, 3), dtype=np.float32))
    g = ops.resize_bilinear(img, (36, 64))
    m = ops.resize_bilinear_mxu(img, (36, 64), precision=jax.lax.Precision.DEFAULT)
    np.testing.assert_allclose(np.asarray(m), np.asarray(g), rtol=0.02, atol=0.01)


def test_pipeline_mxu_vs_gather_consistency(rng):
    """Full step with resize_impl='mxu' stays close to the gather build."""
    from video_stream_segmenetation_tpu import models, runtime

    MASK_HW, FRAME_HW = (32, 64), (64, 128)
    model = models.MatteNet(width=0.5)
    mp = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *MASK_HW, 3)))
    bundle = runtime.ModelBundle(model, mp)
    frames = jnp.asarray((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.zeros((2, *FRAME_HW, 3))
    knobs = runtime.default_knobs(2)
    gate = jnp.zeros((2,), bool)

    outs = {}
    for impl in ("gather", "mxu"):
        statics = runtime.PipelineStatics(
            frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
            background="color", face_path=False, resize_impl=impl,
            preprocess_precision="exact", upsample_precision="exact",
        )
        step = jax.jit(runtime.make_step(bundle, statics))
        state = runtime.init_state(2, MASK_HW)
        _, out = step(bundle.params, state, frames, bg, knobs, gate)
        outs[impl] = np.asarray(out["frame"]).astype(np.int16)
    assert np.abs(outs["gather"] - outs["mxu"]).max() <= 1
