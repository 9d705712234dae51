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


def test_chunked_host_guide_lanes(rng):
    """process_chunked with guide_source='host' (tuple step input) slices
    the lane tensor per chunk and matches process()."""
    import numpy as np

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    # face_path off: cadence compaction picks K = ceil(S/interval)
    # streams per BATCH, so chunking legitimately changes which streams'
    # faces run in a given step (same as the reference's in-flight gate);
    # the lanes slicing under test is face-independent
    st = preset(
        "fast_int8_micro", frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64,
        lmk_size=48, background="color", use_fused_refine=True,
        guide_kernel_unfold=True, guide_source="host", face_path=False,
    )
    frames = (rng.random((4, 80, 160, 3)) * 255).astype(np.uint8)
    e1 = Engine(num_streams=4, statics=st, rng_seed=0, donate_state=False)
    e2 = Engine(num_streams=4, statics=st, rng_seed=0, donate_state=False)
    for e in (e1, e2):
        for _ in range(4):
            e.admit()
    for _ in range(2):
        o1 = e1.process(frames)
        o2 = e2.process_chunked(frames, chunk_size=2)
    assert o2["metrics"]["health"]["state"] == "ok"
    # one-ulp f32 noise: XLA reduction order differs with batch size
    np.testing.assert_allclose(
        np.asarray(o1["alpha"]), np.asarray(o2["alpha"]), atol=1e-6
    )
    d = np.abs(
        np.asarray(o1["frame"], np.int32) - np.asarray(o2["frame"], np.int32)
    )
    assert d.max() <= 1 and (d > 0).mean() < 1e-3
