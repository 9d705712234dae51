"""Multi-class engine mode (BASELINE config 5)."""

import numpy as np
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Engine

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture(scope="module")
def engine():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        num_classes=3,
        class_effects=(
            {"blur": 3.0},            # background
            {"keep": True},            # person
            {"tint": (1.0, 0.2, 0.2), "strength": 0.5},  # hair
        ),
    )
    return Engine(num_streams=2, statics=statics, donate_state=False)


def test_multiclass_process(engine, rng):
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out = engine.process(frames)
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    ca = np.asarray(out["class_alpha"])
    assert ca.shape == (2, *MASK_HW, 3)
    np.testing.assert_allclose(ca.sum(-1), 1.0, atol=1e-3)  # simplex
    # temporal smoothing: second step with same frames stays consistent
    out2 = engine.process(frames)
    ca2 = np.asarray(out2["class_alpha"])
    np.testing.assert_allclose(ca2.sum(-1), 1.0, atol=1e-3)
    assert np.isfinite(np.asarray(out2["frame"])).all()


def test_multiclass_evict_resets(engine, rng):
    s = engine.admit()
    engine.process((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    engine.evict(s)
    assert float(np.abs(np.asarray(engine.state.rec[s])).max()) == 0.0
