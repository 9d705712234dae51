"""Clip harness: synthetic clips, parity metrics, engine integration."""

import numpy as np
import pytest

from video_stream_segmenetation_tpu import runtime, utils
from video_stream_segmenetation_tpu.service import Engine


def test_synthetic_clip_shapes():
    clip = utils.synthetic_clip(n_frames=5, hw=(48, 64))
    assert clip.frames.shape == (5, 48, 64, 3)
    assert clip.alpha.shape == (5, 48, 64)
    assert clip.frames.dtype == np.uint8
    assert 0.0 <= clip.alpha.min() and clip.alpha.max() <= 1.0
    # motion: the mask moves between frames
    assert (clip.alpha[0] != clip.alpha[4]).any()


def test_mask_iou_and_stability():
    a = np.zeros((3, 8, 8))
    a[:, :4] = 1.0
    assert np.allclose(utils.mask_iou(a, a), 1.0)
    b = np.roll(a, 2, axis=1)
    assert utils.mask_iou(a, b)[0] == pytest.approx(2 / 6)
    assert utils.temporal_stability(a) == 1.0
    flip = a.copy()
    flip[1] = 1 - flip[1]
    assert utils.temporal_stability(flip) < 1.0


def test_parity_report_keys():
    a = (np.random.default_rng(0).random((4, 8, 8)) > 0.5).astype(float)
    rep = utils.parity_report(a, a)
    assert rep["iou_mean"] == 1.0 and rep["frames"] == 4
    assert set(rep) >= {"iou_mean", "iou_min", "iou_p05", "temporal_stability"}


def test_reference_masks_roundtrip(tmp_path):
    masks = (np.random.default_rng(1).random((3, 16, 16)) > 0.5).astype(np.float32)
    p = tmp_path / "ref.npz"
    np.savez(p, masks=masks)
    loaded = utils.load_reference_masks(str(p))
    np.testing.assert_array_equal(loaded, masks)


def test_engine_clip_integration(rng):
    """End-to-end: clip through the engine; untrained weights give no
    meaningful IoU, but the harness must run and the mask must respond to
    the input (not constant)."""
    statics = runtime.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.admit()
    clip = utils.synthetic_clip(n_frames=4, hw=(48, 64))
    masks = utils.run_clip_through_engine(eng, clip)
    assert masks.shape == (4, 32, 64)
    rep = utils.parity_report(masks, masks)  # self-parity: plumbing check
    assert rep["iou_mean"] == 1.0
    assert np.isfinite(masks).all()
