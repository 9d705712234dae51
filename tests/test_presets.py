"""Every named preset builds an engine and serves a step."""

import numpy as np
import pytest

from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Engine

SMALL = dict(frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48)


def test_list_and_describe():
    names = runtime.list_presets()
    assert {"active", "fast", "blaze_tracking", "branch", "rvm", "u2", "multiclass"} <= set(names)
    for n in names:
        assert n in runtime.describe(n)
    with pytest.raises(KeyError):
        runtime.preset("nope")


@pytest.mark.parametrize("name", ["active", "fast", "blaze_tracking", "branch", "rvm", "multiclass"])
def test_preset_serves(name, rng):
    over = dict(SMALL)
    if name == "fast":
        pass  # native matting: frame 80x160 / mask 32x64 satisfies 2*ceil(/5)
    statics = runtime.preset(name, **over)
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.admit()
    frames = (rng.random((1, *statics.frame_hw, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert out["frame"].shape == (1, *statics.frame_hw, 3)
    assert eng.health.state.value == "ok"
    out2 = eng.process(frames)
    assert np.isfinite(np.asarray(out2["alpha"])).all()


def test_u2_preset_serves(rng):
    statics = runtime.preset("u2", frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48)
    assert statics.temporal_filter == "none"
    eng = Engine(num_streams=1, statics=statics, donate_state=False)
    eng.admit()
    frames = (rng.random((1, 80, 160, 3)) * 255).astype(np.uint8)
    out = eng.process(frames)
    assert eng.health.state.value == "ok"
    # no temporal stage: two identical frames give identical masks
    out2 = eng.process(frames)
    np.testing.assert_array_equal(np.asarray(out["alpha"]), np.asarray(out2["alpha"]))