"""Concurrency policy (SURVEY.md §5 race detection): knob writes race
against processing but are snapshotted per step; concurrent producers and
control-plane calls must not corrupt the engine."""

import threading

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
    return Engine(num_streams=2, statics=statics, donate_state=False)


def test_concurrent_knob_writes_during_processing(engine, rng):
    """The reference accepts UI writes racing the frame (script.ts:20-25);
    here updates are staged and applied at step boundaries -- hammer the
    control plane from threads while processing and verify consistency."""
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    engine.process(frames)  # compile once
    stop = threading.Event()
    errors = []

    def hammer():
        import time as _t

        i = 0
        while not stop.is_set():
            try:
                engine.set_knobs(i % 2, gamma=0.3 + (i % 10) * 0.1)
                engine.reset_knobs((i + 1) % 2)
                i += 1
                _t.sleep(0.001)  # 1-core runner: let the consumer breathe
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    for _ in range(6):
        out = engine.process(frames)
        assert np.isfinite(np.asarray(out["alpha"])).all()
    stop.set()
    for t in threads:
        t.join(timeout=5)
    assert not errors
    # knobs end in a consistent state: scalar per stream, finite
    assert np.isfinite(np.asarray(engine.knobs.gamma)).all()
    assert engine.health.state.value == "ok"


def test_admission_race(engine):
    """Concurrent admits never hand out the same slot."""
    got = []
    lock = threading.Lock()

    def admit():
        try:
            s = engine.admit()
            with lock:
                got.append(s)
        except RuntimeError:
            pass  # full -- acceptable

    threads = [threading.Thread(target=admit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(got) == len(set(got)) <= 2
