"""The production group rotation over a sharded Engine (VERDICT r3 #7):
StreamScheduler(group_sizes=...) -> Engine.dispatch_range must execute
over an 8-device mesh -- the in-jit dynamic slice/scatter rides the
SHARDED stream axis, with group boundaries unaligned to shards -- and
produce the same per-stream state as a single-device engine."""

import dataclasses

import numpy as np
import jax
import pytest

from video_stream_segmenetation_tpu import parallel, runtime
from video_stream_segmenetation_tpu.runtime.scheduler import StreamScheduler
from video_stream_segmenetation_tpu.service.engine import Engine

FRAME_HW = (80, 160)
MASK_HW = (32, 64)


def _statics():
    from video_stream_segmenetation_tpu.runtime.presets import preset

    return dataclasses.replace(
        preset("fast_int8_pico"),
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        s2d_block=10, background="color",
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_rotation_matches_single_device(rng):
    S = 16
    group_sizes = [11, 5]  # unaligned with the 8-way shard grid (2 rows/dev)
    frames = (rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8)
    statics = _statics()

    def run(mesh):
        eng = Engine(
            num_streams=S, statics=statics, rng_seed=0,
            donate_state=True, mesh=mesh,
        )
        sch = StreamScheduler(
            eng, use_native_pool=False, group_sizes=group_sizes,
            frame_source=lambda i0, i1: frames[i0:i1],
        )
        sch.admit_all()
        for _ in range(3 * len(group_sizes)):
            sch.step_pipelined()
        sch.drain()
        return eng

    mesh = parallel.make_mesh(n_data=8)
    eng_m = run(mesh)
    eng_s = run(None)

    assert len(eng_m.state.prev_alpha.sharding.device_set) == 8
    fi_m = np.asarray(eng_m.state.frame_idx)
    fi_s = np.asarray(eng_s.state.frame_idx)
    np.testing.assert_array_equal(fi_m, fi_s)
    assert fi_m.min() >= 3  # every group stepped every round
    np.testing.assert_allclose(
        np.asarray(eng_m.state.prev_alpha),
        np.asarray(eng_s.state.prev_alpha),
        atol=2e-2,
    )
    # per-stream temporal identity advanced only via its own group's
    # steps: groups are disjoint, so alphas differ across the group
    # boundary unless streams are identical by construction
    assert np.asarray(eng_m.state.initialized).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_fused_round_matches_single_device(rng):
    """The FUSED-ROUND production mode (VERDICT r4 #3) on the mesh:
    StreamScheduler(fused_rounds=True).step_round -> Engine.dispatch_round
    runs the whole rotation as one program whose unrolled multi-group
    dynamic slice/scatter rides the SHARDED stream axis with
    shard-unaligned group sizes -- state must match single-device."""
    S = 16
    group_sizes = [11, 5]  # unaligned with the 8-way shard grid
    frames = (rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8)
    statics = _statics()

    def run(mesh):
        eng = Engine(
            num_streams=S, statics=statics, rng_seed=0,
            donate_state=True, mesh=mesh,
        )
        sch = StreamScheduler(
            eng, use_native_pool=False, group_sizes=group_sizes,
            frame_source=lambda i0, i1: frames[i0:i1], fused_rounds=True,
        )
        sch.admit_all()
        outs = []
        for _ in range(3):
            r = sch.step_round()
            if r is not None:
                outs.extend(r)
        tail = sch.drain()
        if tail is not None:
            outs.extend(tail)
        return eng, outs

    mesh = parallel.make_mesh(n_data=8)
    eng_m, outs_m = run(mesh)
    eng_s, outs_s = run(None)

    assert len(eng_m.state.prev_alpha.sharding.device_set) == 8
    np.testing.assert_array_equal(
        np.asarray(eng_m.state.frame_idx), np.asarray(eng_s.state.frame_idx)
    )
    assert np.asarray(eng_m.state.frame_idx).min() >= 3
    np.testing.assert_allclose(
        np.asarray(eng_m.state.prev_alpha),
        np.asarray(eng_s.state.prev_alpha),
        atol=2e-2,
    )
    # collected per-group results line up too (same mode both sides)
    assert len(outs_m) == len(outs_s) == 3 * len(group_sizes)
    for a, b in zip(outs_m, outs_s):
        assert a["slots"] == b["slots"]
        np.testing.assert_allclose(
            np.asarray(a["alpha"]), np.asarray(b["alpha"]), atol=2e-2
        )
