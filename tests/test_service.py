"""Engine: admission, knobs, degradation, counters."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Counters, Engine, EngineHealth

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture(scope="module")
def engine():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW,
        mask_hw=MASK_HW,
        fd_size=64,
        lmk_size=48,
        background="image",
        face_path=False,  # keep the CPU test light
    )
    return Engine(num_streams=2, statics=statics, donate_state=False)


def _frames(rng, n=2):
    return (rng.random((n, *FRAME_HW, 3)) * 255).astype(np.uint8)


def test_admit_evict(engine):
    s0 = engine.admit()
    s1 = engine.admit()
    assert {s0, s1} == {0, 1}
    with pytest.raises(RuntimeError):
        engine.admit()
    engine.evict(s1)
    assert engine.admit() == s1


def test_process_shapes_and_metrics(engine, rng):
    out = engine.process(_frames(rng))
    assert out["frame"].shape == (2, *FRAME_HW, 3)
    m = out["metrics"]
    assert m["health"]["state"] == "ok"
    assert m["total_ms_p50"] > 0
    assert "inference_ms_p50" in m and "thread_load_pct" in m


def test_live_knobs_applied_at_step_boundary(engine, rng):
    f = _frames(rng)
    base = np.asarray(engine.process(f)["alpha"])
    engine.set_knobs(0, gamma=2.5, use_bilateral=False)
    out = np.asarray(engine.process(f)["alpha"])
    assert not np.allclose(out[0], base[0])  # stream 0 changed
    engine.reset_knobs(0)
    engine.process(f)
    assert float(engine.knobs.gamma[0]) == pytest.approx(0.4)


def test_set_background_resizes(engine):
    img = (np.random.default_rng(1).random((24, 24, 3)) * 255).astype(np.uint8)
    engine.set_background(0, img)
    assert engine.backgrounds.shape == (2, *FRAME_HW, 3)
    assert float(jnp.abs(engine.backgrounds[0]).max()) > 0


def test_degradation_and_recovery(engine, rng):
    f = _frames(rng)
    # poison the step to force failures
    real_step = engine._step
    engine._step = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    for _ in range(engine.health.max_consecutive_failures):
        out = engine.process(f)
    assert engine.health.state is EngineHealth.DEGRADED
    # degraded mode: passthrough frames
    np.testing.assert_array_equal(np.asarray(out["frame"]), f)
    # restore; probe timer forces a retry
    engine._step = real_step
    engine.health._degraded_at = 0.0  # make should_probe true
    out = engine.process(f)
    assert engine.health.state is EngineHealth.OK


def test_counters_percentiles():
    c = Counters()
    for ms in [1, 2, 3, 4, 100]:
        c.record_step(4, ms, ms + 1)
    snap = c.snapshot()
    assert snap["inference_ms_p50"] == 3
    assert snap["total_ms_p95"] == 101
    assert snap["frames_total"] == 20


def test_group_step_degrades_to_passthrough(engine, rng):
    """A poisoned group step must drop to passthrough (health failure),
    not propagate and kill the scheduler thread (process_group mirrors
    process()'s recovery path)."""
    f = _frames(rng)
    real_step = engine._step
    engine._step = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    try:
        for _ in range(engine.health.max_consecutive_failures):
            out = engine.process_group(0, 2, f[:1])  # must not raise
        assert engine.health.state is EngineHealth.DEGRADED
        np.testing.assert_array_equal(np.asarray(out["frame"]), f[:1])
        assert np.asarray(out["alpha"]).shape[0] == 1
    finally:
        engine._step = real_step
        engine.health._degraded_at = 0.0
    out = engine.process_group(0, 2, f[:1])
    assert engine.health.state is EngineHealth.OK


def test_chunked_step_degrades_to_passthrough(engine, rng):
    f = _frames(rng)
    real_step = engine._step
    engine._step = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    try:
        for _ in range(engine.health.max_consecutive_failures):
            out = engine.process_chunked(f, chunk_size=1)  # must not raise
        assert engine.health.state is EngineHealth.DEGRADED
        np.testing.assert_array_equal(np.asarray(out["frame"]), f)
    finally:
        engine._step = real_step
        engine.health._degraded_at = 0.0
    out = engine.process_chunked(f, chunk_size=1)
    assert engine.health.state is EngineHealth.OK


def test_packed_output_layout_matches_unpacked(rng):
    """Engine(output_layout='packed') serves the s2d packed composite
    (the native-encode production contract); depth_to_space of it must
    equal the 'natural' engine's output bit-exactly."""
    import dataclasses

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime.presets import preset

    statics = dataclasses.replace(
        preset("fast_int8_pico"),
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        s2d_block=10, background="color", face_path=False,
    )
    f = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)

    def run(layout):
        eng = Engine(num_streams=2, statics=statics, rng_seed=0,
                     donate_state=False, output_layout=layout)
        for _ in range(2):
            eng.admit()
        return eng.process(f)["frame"]

    nat = np.asarray(run("natural"))
    packed = run("packed")
    assert packed.shape[-1] == 300  # still packed
    np.testing.assert_array_equal(
        np.asarray(ops.depth_to_space(packed, 10)), nat
    )
