"""Pipeline variants: recurrent matting engine, multiclass/hard composite,
checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops, runtime, utils
from video_stream_segmenetation_tpu.service import Engine

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


def test_recurrent_engine_mode(rng):
    """The frameProcessorRVM.ts variant as an engine configuration:
    recurrent matting + EMA, no face path."""
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False, matting_arch="recurrent",
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    eng.admit()
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    out1 = eng.process(frames)
    rec_after_1 = jax.tree_util.tree_leaves(eng.state.rec)
    assert any(float(jnp.abs(x).max()) > 0 for x in rec_after_1)
    out2 = eng.process(frames)
    # recurrence: same frame, evolving state -> alpha changes
    assert not np.allclose(np.asarray(out1["alpha"]), np.asarray(out2["alpha"]))
    # eviction zero-fills the recurrent state (RVM cold start)
    eng.evict(0)
    assert all(
        float(jnp.abs(x[0]).max()) == 0.0
        for x in jax.tree_util.tree_leaves(eng.state.rec)
    )


def test_reset_preserves_identity_affine():
    state = runtime.init_state(2, MASK_HW)
    state = runtime.reset_stream(state, 0)
    np.testing.assert_allclose(
        np.asarray(state.affine[0]), [1, 0, 0, 0, 1, 0]
    )


def test_binarize_alpha():
    a = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_array_equal(np.asarray(ops.binarize_alpha(a)), [0, 1, 1])


def test_multiclass_composite(rng):
    frame = jnp.asarray(rng.random((8, 8, 3), dtype=np.float32))
    # 3 classes: bg, person, hair
    logits = rng.random((8, 8, 3)).astype(np.float32)
    ca = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    out = ops.multiclass_composite(
        frame,
        ca,
        [{"blur": 2.0}, {"keep": True}, {"tint": (1.0, 0.0, 0.0), "strength": 0.3}],
    )
    assert out.shape == frame.shape
    # convexity: output within [0, 1+] range of inputs
    assert float(out.min()) >= 0.0
    with pytest.raises(ValueError):
        ops.multiclass_composite(frame, ca, [{"keep": True}])


def test_multiclass_composite_upsamples(rng):
    frame = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    ca = jnp.asarray(rng.random((8, 8, 2)).astype(np.float32))
    ca = ca / ca.sum(-1, keepdims=True)
    out = ops.multiclass_composite(frame, ca, [{"keep": True}, {"color": (0, 0, 0)}])
    assert out.shape == (16, 16, 3)


def test_checkpoint_roundtrip(tmp_path, rng):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", face_path=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    eng.admit()
    frames = (rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8)
    eng.process(frames)
    eng.set_knobs(0, gamma=1.7)
    eng.process(frames)
    utils.save_engine(str(tmp_path / "ck"), eng)

    before = np.asarray(eng.state.prev_alpha).copy()
    eng.state = runtime.init_state(2, MASK_HW)
    eng.knobs = runtime.default_knobs(2)
    utils.restore_engine(str(tmp_path / "ck"), eng)
    np.testing.assert_array_equal(np.asarray(eng.state.prev_alpha), before)
    assert float(eng.knobs.gamma[0]) == pytest.approx(1.7)
    # restored engine keeps serving
    out = eng.process(frames)
    assert np.isfinite(np.asarray(out["alpha"])).all()
