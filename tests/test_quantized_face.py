"""int8 face-subpath serving graphs vs the float models.

Parity stance mirrors test_quantized_serving.py: the int8 graphs must
reproduce the float models' *decisions* (box choice, scores, landmark
positions) to within the int8 lattice noise, on the repo's trained
checkpoints when present (random init otherwise -- the quantization
algebra is weight-agnostic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _trained(model_name):
    import os

    from video_stream_segmenetation_tpu.models.registry import get_spec
    from video_stream_segmenetation_tpu.utils.checkpoint import restore_params

    model, params = get_spec(model_name).init_params()
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", model_name,
    )
    if os.path.isdir(ckpt):
        try:
            params = restore_params(ckpt)
        except Exception:
            pass
    return model, params


@pytest.fixture(scope="module")
def face_img(rng_module):
    # a face-ish bright blob on structured background
    h = w = 256
    yy, xx = np.mgrid[:h, :w]
    img = rng_module.random((2, h, w, 3)).astype(np.float32) * 0.3
    blob = np.exp(-(((yy - 120) / 50.0) ** 2 + ((xx - 130) / 40.0) ** 2))
    img[0, ..., :] += 0.6 * blob[..., None]
    img[1, ..., :] += 0.5 * np.roll(blob, 40, axis=1)[..., None]
    return np.clip(img, 0.0, 1.0)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_facefinder_int8_parity(face_img):
    from video_stream_segmenetation_tpu.models.quantized_face import (
        QuantizedFaceFinder,
        quantize_face_finder,
    )

    model, params = _trained("facefinder")
    ref = model.apply(params, jnp.asarray(face_img))
    q = quantize_face_finder(model, params)
    got = QuantizedFaceFinder(input_size=model.input_size).apply(
        q, jnp.asarray(face_img)
    )

    rs, gs = np.asarray(ref["box_scores"]), np.asarray(got["box_scores"])
    # the chosen anchor and its score must agree
    assert (rs.argmax(1) == gs.argmax(1)).all()
    np.testing.assert_allclose(
        np.take_along_axis(gs, gs.argmax(1)[:, None], 1),
        np.take_along_axis(rs, rs.argmax(1)[:, None], 1),
        atol=0.05,
    )
    # the full score field within the logit-lattice noise (sigmoid mid-
    # range amplifies int8 logit error; 0.09 max observed on the trained
    # checkpoint)
    np.testing.assert_allclose(gs, rs, atol=0.15)
    # the winning box must agree to a few pixels at 256^2
    rb = np.take_along_axis(
        np.asarray(ref["box_coords"]), rs.argmax(1)[:, None, None], axis=1
    )
    gb = np.take_along_axis(
        np.asarray(got["box_coords"]), gs.argmax(1)[:, None, None], axis=1
    )
    np.testing.assert_allclose(gb[..., :4], rb[..., :4], atol=0.02)


def test_landmarknet_int8_parity(rng_module):
    from video_stream_segmenetation_tpu.models.quantized_face import (
        QuantizedLandmarkNet,
        quantize_landmark_net,
    )

    model, params = _trained("landmarknet")
    x = rng_module.random((2, 192, 192, 3)).astype(np.float32)
    ref = model.apply(params, jnp.asarray(x))
    q = quantize_landmark_net(model, params)
    got = QuantizedLandmarkNet().apply(q, jnp.asarray(x))

    # landmarks are normalized [0,1]: 0.02 = ~4 px at 192
    np.testing.assert_allclose(
        np.asarray(got["landmarks"])[..., :2],
        np.asarray(ref["landmarks"])[..., :2],
        atol=0.02,
    )
    np.testing.assert_allclose(
        np.asarray(got["scores"]), np.asarray(ref["scores"]), atol=0.05
    )


def test_engine_face_int8_end_to_end(rng):
    """face_precision='int8' serves through the full step and the face
    path still fires (prior/affine machinery unchanged)."""
    from video_stream_segmenetation_tpu import runtime
    from video_stream_segmenetation_tpu.service.engine import Engine

    statics = runtime.PipelineStatics(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_precision="int8",
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    from video_stream_segmenetation_tpu.models.quantized_face import (
        QuantizedFaceFinder,
        QuantizedLandmarkNet,
    )

    assert isinstance(eng.bundle.face_model, QuantizedFaceFinder)
    assert isinstance(eng.bundle.lmk_model, QuantizedLandmarkNet)
    for _ in range(2):
        eng.admit()
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["frame"].shape == (2, 80, 160, 3)
    assert np.isfinite(np.asarray(out["alpha"])).all()
