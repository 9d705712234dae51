"""Fused-round serving (Engine.dispatch_round / StreamScheduler
fused_rounds): one dispatch per rotation round must produce the same
per-stream state and outputs as the per-group dispatch_range rotation."""

import dataclasses

import numpy as np
import jax
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler
from video_stream_segmenetation_tpu.service.engine import Engine

FRAME_HW = (80, 160)
MASK_HW = (32, 64)


def _statics():
    return runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )


def _run(rng, fused: bool):
    S, group_sizes = 6, [4, 2]
    frames = (rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8)
    eng = Engine(
        num_streams=S, statics=_statics(), rng_seed=0, donate_state=True,
    )
    sch = StreamScheduler(
        eng, use_native_pool=False, group_sizes=group_sizes,
        frame_source=lambda i0, i1: frames[i0:i1], fused_rounds=fused,
    )
    sch.admit_all()
    outs = []
    for _ in range(3):
        if fused:
            r = sch.step_round()
            if r is not None:
                outs.extend(r)
        else:
            for _g in range(sch.groups):
                r = sch.step_pipelined()
                if r is not None:
                    outs.append(r)
    tail = sch.drain()
    return eng, outs, tail


def test_fused_round_matches_per_group(rng):
    rng2 = np.random.default_rng(0)
    eng_f, outs_f, _ = _run(np.random.default_rng(7), fused=True)
    eng_g, outs_g, _ = _run(np.random.default_rng(7), fused=False)

    np.testing.assert_array_equal(
        np.asarray(eng_f.state.frame_idx), np.asarray(eng_g.state.frame_idx)
    )
    np.testing.assert_allclose(
        np.asarray(eng_f.state.prev_alpha),
        np.asarray(eng_g.state.prev_alpha), atol=1e-5,
    )
    # collected group results line up slot-for-slot, round-for-round
    # (the two modes collect with different latencies, so compare the
    # common prefix of each slot's result sequence)
    def by_slot(outs):
        d = {}
        for o in outs:
            d.setdefault(o["slots"], []).append(np.asarray(o["alpha"]))
        return d

    f_seq, g_seq = by_slot(outs_f), by_slot(outs_g)
    assert set(f_seq) == set(g_seq)
    for k in f_seq:
        n = min(len(f_seq[k]), len(g_seq[k]))
        assert n >= 1
        for a, b in zip(f_seq[k][:n], g_seq[k][:n]):
            np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_round_native_pool_no_aliasing(rng):
    """Regression (ADVICE r4 high): step_round assembles EVERY group from
    the native pool before one dispatch, so the pool's zero-copy views
    must survive a whole round of further assembles.  With the old
    depth-2 double buffer, >=3 groups clobbered group 0's frames within
    the round and every group's guide lanes aliased the last assemble.
    The pool ring (depth=2*groups) fixes it: the native-pool fused run
    must match the frame_source fused run bit-exactly, with per-round
    fresh frames to also catch cross-round clobbering."""
    from video_stream_segmenetation_tpu.runtime import native
    from video_stream_segmenetation_tpu.runtime.presets import preset

    if not native.native_available():
        pytest.skip("native lib unavailable")
    S, group_sizes, rounds = 6, [2, 2, 2], 4
    statics = preset(
        "fast_int8_micro", guide_source="host",
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", use_fused_refine=True, guide_kernel_unfold=True,
    )
    per_round = [
        (rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8)
        for _ in range(rounds)
    ]

    def run(use_pool: bool):
        eng = Engine(
            num_streams=S, statics=statics, rng_seed=0, donate_state=True,
        )
        cur = {"f": per_round[0]}
        sch = StreamScheduler(
            eng, use_native_pool=use_pool, group_sizes=group_sizes,
            frame_source=(
                None if use_pool else (lambda i0, i1: cur["f"][i0:i1])
            ),
            fused_rounds=True,
        )
        if use_pool:
            assert sch.pool is not None and sch.pool.depth == 2 * len(group_sizes)
            assert sch.pool.num_lanes > 0  # the lanes-aliasing hazard is live
        sch.admit_all()
        outs = []
        for r in range(rounds):
            cur["f"] = per_round[r]
            if use_pool:
                for s in range(S):
                    sch.push_frame(s, per_round[r][s])
            got = sch.step_round()
            if got is not None:
                outs.extend(got)
        tail = sch.drain()
        if tail is not None:
            outs.extend(tail)
        sch.stop()
        return outs

    outs_pool, outs_src = run(True), run(False)
    assert len(outs_pool) == len(outs_src) == rounds * len(group_sizes)
    for a, b in zip(outs_pool, outs_src):
        assert a["slots"] == b["slots"]
        np.testing.assert_array_equal(
            np.asarray(a["alpha"]), np.asarray(b["alpha"])
        )


def test_fused_round_counters_and_recovery(rng):
    eng, outs, _ = _run(np.random.default_rng(3), fused=True)
    assert eng.health.state.name == "OK"
    assert len(outs) >= 4  # 2 collected rounds x 2 groups
    m = outs[-1]["metrics"]
    assert m["fps"] >= 0
