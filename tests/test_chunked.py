"""Chunked (latency-mode) processing matches full-batch processing."""

import numpy as np
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Engine

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture()
def engine():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    return Engine(num_streams=4, statics=statics, donate_state=False)


def test_chunked_matches_full(engine, rng):
    frames = (rng.random((4, *FRAME_HW, 3)) * 255).astype(np.uint8)
    full = engine.process(frames)
    full_state = np.asarray(engine.state.prev_alpha).copy()

    # reset and replay chunked
    engine.state = runtime.init_state(4, MASK_HW)
    chunked = engine.process_chunked(frames, chunk_size=2)
    np.testing.assert_array_equal(
        np.asarray(chunked["frame"]), np.asarray(full["frame"])
    )
    np.testing.assert_allclose(
        np.asarray(engine.state.prev_alpha), full_state, atol=1e-6
    )


def test_chunk_size_must_divide(engine, rng):
    with pytest.raises(ValueError):
        engine.process_chunked(np.zeros((4, *FRAME_HW, 3), np.uint8), 3)
