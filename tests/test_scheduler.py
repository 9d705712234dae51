"""Stream scheduler: staggered cadence, ingestion, ticking."""

import numpy as np
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Engine
from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture()
def sched():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=4, statics=statics, donate_state=False)
    s = StreamScheduler(eng, use_native_pool=True)
    yield s
    s.stop()


def test_staggered_phases(sched):
    slots = [sched.admit() for _ in range(4)]
    idx = np.asarray(sched.engine.state.frame_idx)
    interval = sched.engine.statics.lmk_interval
    assert sorted(idx[slots].tolist()) == sorted(s % interval for s in slots)


def test_push_and_step(sched, rng):
    slots = [sched.admit() for _ in range(2)]
    for s in slots:
        sched.push_frame(s, (rng.random((*FRAME_HW, 3)) * 255).astype(np.uint8))
    seen = []
    sched.on_batch = lambda out, ids: seen.append((np.asarray(out["frame"]).shape, ids))
    out = sched.step()
    assert out["frame"].shape == (4, *FRAME_HW, 3)
    assert len(seen) == 1
    shape, ids = seen[0]
    assert shape == (4, *FRAME_HW, 3)
    if ids is not None:
        assert ids[slots[0]] == 1 and ids[slots[1]] == 1


def test_run_and_stop(sched, rng):
    sched.admit()
    sched.push_frame(0, (rng.random((*FRAME_HW, 3)) * 255).astype(np.uint8))
    sched.step()  # compile before timing the thread
    sched.tick_s = 0.01
    sched.start()
    import time

    time.sleep(0.5)
    sched.stop()
    assert sched.ticks >= 2


def test_group_scheduling_latency_mode(rng):
    """groups=2: each tick steps one group; state advances per group and
    results match full-batch processing stream-for-stream."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import runtime
    from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler
    from video_stream_segmenetation_tpu.service.engine import Engine

    statics = runtime.PipelineStatics(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False, use_fused_refine=False,
    )
    frames = (rng.random((4, 80, 160, 3)) * 255).astype(np.uint8)

    eng_g = Engine(num_streams=4, statics=statics, rng_seed=0, donate_state=False)
    sch = StreamScheduler(eng_g, use_native_pool=False, groups=2)
    for _ in range(4):
        sch.admit()
    sch._frames[:] = frames
    out0 = sch.step()   # group 0 -> slots (0, 2)
    out1 = sch.step()   # group 1 -> slots (2, 4)
    assert out0["slots"] == (0, 2) and out1["slots"] == (2, 4)
    idx = np.asarray(eng_g.state.frame_idx)
    # every stream advanced exactly once past its staggered phase
    # (scheduler.admit sets frame_idx = slot % lmk_interval)
    assert (idx == np.arange(4) % 6 + 1).all()

    eng_f = Engine(num_streams=4, statics=statics, rng_seed=0, donate_state=False)
    for _ in range(4):
        eng_f.admit()
    out_f = eng_f.process(frames)
    got = np.concatenate([np.asarray(out0["frame"]), np.asarray(out1["frame"])])
    np.testing.assert_array_equal(got, np.asarray(out_f["frame"]))


def test_heterogeneous_group_sizes(rng):
    """group_sizes=[2,1,1]: unequal round-robin groups (the capacity-
    packing schedule, e.g. 4x96+16 on v5e) must step every stream exactly
    once per round and match full-batch processing stream-for-stream."""
    from video_stream_segmenetation_tpu import runtime
    from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler
    from video_stream_segmenetation_tpu.service.engine import Engine

    statics = runtime.PipelineStatics(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False, use_fused_refine=False,
    )
    frames = (rng.random((4, 80, 160, 3)) * 255).astype(np.uint8)

    eng_g = Engine(num_streams=4, statics=statics, rng_seed=0, donate_state=False)
    sch = StreamScheduler(eng_g, use_native_pool=False, group_sizes=[2, 1, 1])
    assert sch.groups == 3 and sch.group_offsets == [0, 2, 3, 4]
    for _ in range(4):
        sch.admit()
    sch._frames[:] = frames
    outs = [sch.step() for _ in range(3)]
    assert [o["slots"] for o in outs] == [(0, 2), (2, 3), (3, 4)]
    idx = np.asarray(eng_g.state.frame_idx)
    assert (idx == np.arange(4) % 6 + 1).all()

    eng_f = Engine(num_streams=4, statics=statics, rng_seed=0, donate_state=False)
    for _ in range(4):
        eng_f.admit()
    out_f = eng_f.process(frames)
    got = np.concatenate([np.asarray(o["frame"]) for o in outs])
    np.testing.assert_array_equal(got, np.asarray(out_f["frame"]))

    with pytest.raises(ValueError):
        StreamScheduler(eng_g, use_native_pool=False, group_sizes=[2, 1])
    with pytest.raises(ValueError):
        StreamScheduler(eng_g, use_native_pool=False, group_sizes=[5, -1])


def test_pipelined_matches_sequential(rng):
    """Double-buffered serving (dispatch N+1 before collecting N) must
    produce byte-identical per-tick results to the synchronous path --
    streams are independent and state chains on device, so 2-in-flight
    cannot change numerics."""
    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    frames = [
        (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8) for _ in range(4)
    ]

    seq_eng = Engine(num_streams=2, statics=statics, donate_state=False)
    seq_out = [np.asarray(seq_eng.process(f)["frame"]) for f in frames]

    pipe_eng = Engine(num_streams=2, statics=statics, donate_state=False)
    sched = StreamScheduler(pipe_eng, use_native_pool=False)
    outs = []
    for f in frames:
        sched._frames[:] = f
        out = sched.step_pipelined()
        if out is not None:
            outs.append(np.asarray(out["frame"]))
    out = sched.drain()
    outs.append(np.asarray(out["frame"]))

    assert len(outs) == len(seq_out)
    for a, b in zip(outs, seq_out):
        np.testing.assert_array_equal(a, b)


def test_pipelined_collect_failure_degrades(rng):
    """An async failure surfacing at collect() must passthrough + record
    a health failure, not corrupt the loop."""
    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    f = (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8)
    token = eng.dispatch(f)
    # poison the collected output to force a materialization failure
    class Boom:
        shape = (2, 32, 64)
        def __getattr__(self, k):
            raise RuntimeError("boom")
    token["out"] = {"frame": Boom(), "alpha": None, "face_applied": None}
    out = eng.collect(token)
    np.testing.assert_array_equal(np.asarray(out["frame"]), f)
    assert eng.health.consecutive_failures >= 1
    # next dispatch/collect works again (state rolled back)
    out = eng.collect(eng.dispatch(f))
    assert out["frame"].shape == (2, 48, 64, 3)


def test_scheduler_host_guide_lanes(rng):
    """guide_source='host' end to end through the native pool: the
    scheduler feeds (packed, lanes) tuples and the result matches the
    gather-path scheduler bit-exactly."""
    from video_stream_segmenetation_tpu.runtime import native
    from video_stream_segmenetation_tpu.runtime.presets import preset

    if not native.native_available():
        pytest.skip("native lib unavailable")
    kw = dict(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", use_fused_refine=True, guide_kernel_unfold=True,
    )
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    outs = []
    for src in ("gather", "host"):
        eng = Engine(
            num_streams=2,
            statics=preset("fast_int8_micro", guide_source=src, **kw),
            rng_seed=0, donate_state=False,
        )
        sch = StreamScheduler(eng, use_native_pool=True, tick_hz=1000.0)
        assert sch.pool is not None
        if src == "host":
            assert sch.pool.num_lanes > 0
        sch.admit(); sch.admit()
        for s in range(2):
            sch.push_frame(s, frames[s])
        for _ in range(2):
            out = sch.step()
        outs.append(np.asarray(out["alpha"]))
        sch.stop()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_group_pipelined_matches_sequential(rng):
    """Group-mode pipelining (dispatch_range keeps one group step in
    flight; the production rotation) must preserve per-group state and
    produce the same per-tick results as the synchronous group step()
    path (VERDICT r2 item 2)."""
    import jax

    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False, use_fused_refine=False,
    )
    ticks = 6  # 2 full rounds of the [2,1,1] rotation
    frames = [
        (rng.random((4, 80, 160, 3)) * 255).astype(np.uint8)
        for _ in range(ticks)
    ]

    def run(pipelined):
        eng = Engine(num_streams=4, statics=statics, rng_seed=0,
                     donate_state=False)
        sch = StreamScheduler(eng, use_native_pool=False,
                              group_sizes=[2, 1, 1])
        for _ in range(4):
            sch.admit()
        outs = []
        for f in frames:
            sch._frames[:] = f
            out = sch.step_pipelined() if pipelined else sch.step()
            if out is not None:
                outs.append((out["slots"], np.asarray(out["frame"])))
        if pipelined:
            out = sch.drain()
            outs.append((out["slots"], np.asarray(out["frame"])))
        return eng, outs

    eng_s, outs_s = run(pipelined=False)
    eng_p, outs_p = run(pipelined=True)

    assert [s for s, _ in outs_p] == [s for s, _ in outs_s]
    for (_, a), (_, b) in zip(outs_p, outs_s):
        np.testing.assert_array_equal(a, b)
    # per-group state identical after the rotation
    for a, b in zip(jax.tree_util.tree_leaves(eng_p.state),
                    jax.tree_util.tree_leaves(eng_s.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_range_dispatch_failure_recovers_per_stream(rng):
    """A poisoned group step in donated dispatch mode must NOT
    cold-restart every stream: recovery restores the last host snapshot,
    so surviving streams keep their cadence/affine identity (and their
    EMA when full-state snapshots are on) -- VERDICT r2 item 8."""
    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=4, statics=statics, donate_state=True)
    eng.snapshot_every = 1
    eng.state_snapshot_every = 1  # full snapshots: EMA must survive too
    for _ in range(4):
        eng.admit()
    f = (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8)

    # two clean rounds over both 2-stream groups
    for _ in range(2):
        for i0 in (0, 2):
            eng.collect_range(eng.dispatch_range(i0, i0 + 2, f))
    idx_before = np.asarray(eng.state.frame_idx).copy()
    ema_before = np.asarray(eng.state.prev_alpha).copy()
    assert (idx_before >= 2).all() and (np.abs(ema_before).sum() > 0)

    token = eng.dispatch_range(0, 2, f)

    class Boom:
        shape = (2, 32, 64)

        def __getattr__(self, k):
            raise RuntimeError("injected device fault")

    token["out"] = {"frame": Boom(), "alpha": None, "face_applied": None}
    out = eng.collect_range(token)
    np.testing.assert_array_equal(np.asarray(out["frame"]), f)
    assert eng.health.consecutive_failures >= 1

    # surviving streams (rows 2:4) keep their temporal state; the state
    # is at worst one snapshot interval stale (here: the pre-dispatch
    # snapshot, which the poisoned step never advanced)
    idx_after = np.asarray(eng.state.frame_idx)
    ema_after = np.asarray(eng.state.prev_alpha)
    np.testing.assert_array_equal(idx_after[2:], idx_before[2:])
    np.testing.assert_allclose(ema_after[2:], ema_before[2:])
    # and the engine keeps serving
    out = eng.collect_range(eng.dispatch_range(0, 2, f))
    assert out["frame"].shape[0] == 2


def test_range_dispatch_cheap_snapshot_recovery(rng):
    """Default (cheap) snapshots: cadence counters survive a donated
    failure, EMA cold-restarts with first-frame-copy semantics."""
    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=4, statics=statics, donate_state=True)
    eng.snapshot_every = 1  # state_snapshot_every stays 0 (cheap only)
    for _ in range(4):
        eng.admit()
    f = (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8)
    for _ in range(2):
        for i0 in (0, 2):
            eng.collect_range(eng.dispatch_range(i0, i0 + 2, f))
    idx_before = np.asarray(eng.state.frame_idx).copy()

    token = eng.dispatch_range(0, 2, f)

    class Boom:
        shape = (2, 32, 64)

        def __getattr__(self, k):
            raise RuntimeError("injected device fault")

    token["out"] = {"frame": Boom(), "alpha": None, "face_applied": None}
    eng.collect_range(token)
    idx_after = np.asarray(eng.state.frame_idx)
    np.testing.assert_array_equal(idx_after[2:], idx_before[2:])
    # EMA is cold (re-warms via first-frame copy), not stale garbage
    assert np.abs(np.asarray(eng.state.prev_alpha)).sum() == 0
    assert not np.asarray(eng.state.initialized).any()


def test_async_face_gate_matches_sync_semantics(rng):
    """The async (dispatch/collect) paths gate the face min-interval ON
    DEVICE (engine._face_gate_async: zero per-tick host readbacks -- the
    production-rotation requirement); the gate decisions must match the
    synchronous process() path's host-side bookkeeping."""
    import time as _time

    from video_stream_segmenetation_tpu import runtime as rt
    from video_stream_segmenetation_tpu.service import Engine

    statics = rt.PipelineStatics(
        frame_hw=(48, 64), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", lmk_interval=1,  # cadence fires every step
    )

    def run(use_async):
        eng = Engine(num_streams=2, statics=statics, rng_seed=0,
                     donate_state=False)
        eng.face_min_interval_s = 10.0  # one face round, then gated shut
        for _ in range(2):
            eng.admit()
        f = (rng.random((2, 48, 64, 3)) * 255).astype(np.uint8)
        applied = []
        for _ in range(3):
            if use_async:
                tok = eng.dispatch_range(0, 2, f)
                eng.collect_range(tok)
                applied.append(np.asarray(eng.state.has_center).copy())
            else:
                eng.process(f)
                applied.append(np.asarray(eng.state.has_center).copy())
        return applied, eng

    ap_async, eng_a = run(True)
    ap_sync, _ = run(False)
    for a, b in zip(ap_async, ap_sync):
        np.testing.assert_array_equal(a, b)

    # the mirror saw the application: an immediate re-dispatch is gated
    gate = np.asarray(eng_a._face_gate_async(0, 2, _time.monotonic()))
    det = np.asarray(eng_a.state.has_center)
    assert (~gate[det]).all() if det.any() else True
