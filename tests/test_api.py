"""Public functional API: segment / composite / process_frame."""

import numpy as np
import pytest

import video_stream_segmenetation_tpu as vst


def test_segment_single_and_batched(rng):
    frame = (rng.random((96, 160, 3)) * 255).astype(np.uint8)
    m = vst.segment(frame, mask_hw=(32, 64))
    assert m.shape == (32, 64)
    mb = vst.segment(np.stack([frame, frame]), mask_hw=(32, 64))
    assert mb.shape == (2, 32, 64)
    np.testing.assert_allclose(np.asarray(mb[0]), np.asarray(m), atol=1e-6)


def test_composite_color_blur_image(rng):
    frame = (rng.random((64, 96, 3)) * 255).astype(np.uint8)
    mask = rng.random((32, 48)).astype(np.float32)
    out_c = vst.composite(frame, mask, background=(0.1, 0.2, 0.3))
    assert out_c.shape == frame.shape and out_c.dtype == np.uint8
    out_b = vst.composite(frame, mask, bg_blur_sigma=3.0)
    assert out_b.shape == frame.shape
    bg = (rng.random((40, 50, 3)) * 255).astype(np.uint8)  # any size
    out_i = vst.composite(frame, mask, background=bg)
    assert out_i.shape == frame.shape
    # black default
    out_k = vst.composite(frame, np.zeros((32, 48), np.float32))
    assert int(np.asarray(out_k).max()) == 0


def test_process_frame_roundtrip(rng):
    frame = (rng.random((96, 160, 3)) * 255).astype(np.uint8)
    out, mask = vst.process_frame(frame, bg_blur_sigma=2.0)
    assert out.shape == frame.shape
    assert mask.shape == (288, 512)  # default mask contract


def test_lazy_top_level_exports():
    assert hasattr(vst, "Engine")
    assert callable(vst.default_knobs)
    with pytest.raises(AttributeError):
        vst.not_a_thing


def test_face_checkpoint_paths():
    """Geometry-keyed face checkpoint naming (tools/train_face.py
    convention: facefinder by FD, landmarknet by LMK)."""
    from video_stream_segmenetation_tpu.utils import face_checkpoint_paths

    assert face_checkpoint_paths("c", 256, 192) == (
        "c/facefinder", "c/landmarknet"
    )
    assert face_checkpoint_paths("c", 128, 128) == (
        "c/facefinder_128", "c/landmarknet_128"
    )
    assert face_checkpoint_paths("c", 128, 96) == (
        "c/facefinder_128", "c/landmarknet_96"
    )
