"""End-to-end pipeline step: state evolution, cadence, knobs, composite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, runtime

S = 2
FRAME_HW = (72, 128)  # tiny geometry for CPU; divisible by 16 after /2.5? no: mask 32x64
MASK_HW = (32, 64)


@pytest.fixture(scope="module")
def setup():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW,
        mask_hw=MASK_HW,
        fd_size=64,
        lmk_size=48,
        background="color",
    )
    key = jax.random.PRNGKey(0)
    matte = models.MatteNet(width=0.5)
    matte_p = matte.init(key, jnp.zeros((1, *MASK_HW, 3)))
    face = models.FaceFinder(input_size=64)
    face_p = face.init(key, jnp.zeros((1, 64, 64, 3)))
    lmk = models.LandmarkNet()
    lmk_p = lmk.init(key, jnp.zeros((1, 48, 48, 3)))
    bundle = runtime.ModelBundle(matte, matte_p, face, face_p, lmk, lmk_p)
    step = jax.jit(runtime.make_step(bundle, statics))
    return bundle, statics, step


def _frames(rng, n=S):
    return jnp.asarray((rng.random((n, *FRAME_HW, 3)) * 255).astype(np.uint8))


def test_step_shapes_and_types(setup, rng):
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    frames = _frames(rng)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.ones((S,), bool)
    new_state, out = step(bundle.params, state, frames, bg, knobs, gate)
    assert out["frame"].shape == (S, *FRAME_HW, 3)
    assert out["frame"].dtype == jnp.uint8
    assert out["alpha"].shape == (S, *MASK_HW)
    assert new_state.frame_idx.tolist() == [1, 1]
    assert bool(new_state.initialized.all())


def test_state_evolves_and_ema_warms(setup, rng):
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)  # no face path -> pure temporal chain
    frames = _frames(rng)
    state1, out1 = step(bundle.params, state, frames, bg, knobs, gate)
    # first frame: prev_alpha == base (cold start copy semantics)
    state2, out2 = step(bundle.params, state1, frames, bg, knobs, gate)
    # same input frame -> EMA converges toward the same alpha; prev changes
    a1 = np.asarray(state1.prev_alpha)
    a2 = np.asarray(state2.prev_alpha)
    assert not np.array_equal(a1, a2) or np.allclose(a1, a2)  # smoke: runs
    assert state2.frame_idx.tolist() == [2, 2]


def test_ema_fixed_point_on_constant_input(setup, rng):
    """With a constant frame and no face path, prev_alpha must converge to
    the raw alpha (EMA fixed point)."""
    bundle, statics, step = setup
    state = runtime.init_state(1, MASK_HW)
    knobs = runtime.default_knobs(1)
    frames = _frames(rng, 1)
    bg = jnp.zeros((1, *FRAME_HW, 3))
    gate = jnp.zeros((1,), bool)
    state, _ = step(bundle.params, state, frames, bg, knobs, gate)
    first = np.asarray(state.prev_alpha).copy()
    for _ in range(30):
        state, _ = step(bundle.params, state, frames, bg, knobs, gate)
    last = np.asarray(state.prev_alpha)
    # contraction toward fixed point: prev at step1 equals raw alpha (cold
    # start), then stays (no affine -> base == alpha_raw each step)
    np.testing.assert_allclose(last, first, atol=1e-5)


def test_face_cadence_gating(setup, rng):
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    frames = _frames(rng)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    # frame_idx 0 fires cadence; host gate off for stream 1
    gate = jnp.asarray([True, False])
    state1, out1 = step(bundle.params, state, frames, bg, knobs, gate)
    assert not bool(out1["face_applied"][1])  # gated off
    # next step: frame_idx=1, cadence (interval 6) does not fire
    state2, out2 = step(bundle.params, state1, frames, bg, knobs, jnp.ones((S,), bool))
    assert not bool(out2["face_applied"].any())


def test_per_stream_knobs_differ(setup, rng):
    """Stream 0 with heavy gamma vs stream 1 defaults on identical input
    must produce different masks -- live knobs are per-stream."""
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    knobs = knobs.replace_stream(0, gamma=jnp.float32(2.5), use_bilateral=False)
    f = _frames(rng, 1)
    frames = jnp.concatenate([f, f])
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)
    _, out = step(bundle.params, state, frames, bg, knobs, gate)
    a = np.asarray(out["alpha"])
    assert not np.allclose(a[0], a[1])


def test_knob_update_no_retrace(setup, rng):
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    frames = _frames(rng)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)
    knobs = runtime.default_knobs(S)
    step(bundle.params, state, frames, bg, knobs, gate)
    traces_before = step._cache_size()
    knobs2 = knobs.replace_stream(1, ema=jnp.float32(0.9))
    step(bundle.params, state, frames, bg, knobs2, gate)
    assert step._cache_size() == traces_before  # slider moves don't retrace


def test_reset_streams(setup, rng):
    bundle, statics, step = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    frames = _frames(rng)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    state, _ = step(bundle.params, state, frames, bg, knobs, jnp.zeros((S,), bool))
    state = runtime.reset_stream(state, 0)
    assert int(state.frame_idx[0]) == 0 and int(state.frame_idx[1]) == 1
    assert not bool(state.initialized[0]) and bool(state.initialized[1])
    assert float(jnp.abs(state.prev_alpha[0]).max()) == 0.0


def test_segment_once(setup, rng):
    bundle, statics, _ = setup
    seg = jax.jit(runtime.segment_once(bundle, statics))
    frames = _frames(rng)
    a = seg(bundle.params, frames)
    assert a.shape == (S, *MASK_HW)
    assert a.dtype == jnp.float32


def test_debug_stage_truncations(setup, rng):
    """Bench-only stage-truncation hooks (PipelineStatics.debug_stage,
    tools/bench_step_ablate.py): 'model_only' serves the raw model alpha,
    'no_composite' passes frames through, and the comma-combined form
    applies both.  These must keep shapes/dtypes so ablation variants
    compile against the same harness."""
    import dataclasses

    bundle, statics, _ = setup
    state = runtime.init_state(S, MASK_HW)
    knobs = runtime.default_knobs(S)
    frames = _frames(rng)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)

    full_step = jax.jit(runtime.make_step(bundle, statics))
    _, out_full = full_step(bundle.params, state, frames, bg, knobs, gate)

    for ds in ("model_only", "no_composite", "model_only,no_composite"):
        st = dataclasses.replace(statics, debug_stage=ds)
        step = jax.jit(runtime.make_step(bundle, st))
        new_state, out = step(bundle.params, state, frames, bg, knobs, gate)
        assert out["frame"].shape == (S, *FRAME_HW, 3)
        assert out["frame"].dtype == jnp.uint8
        assert out["alpha"].shape == (S, *MASK_HW)
        if "no_composite" in ds:
            np.testing.assert_array_equal(np.asarray(out["frame"]), np.asarray(frames))
        if "model_only" in ds:
            # refine chain skipped: state carries the raw model alpha
            np.testing.assert_array_equal(
                np.asarray(new_state.prev_alpha), np.asarray(out["alpha"])
            )
        else:
            # truncating the composite must not change the refine chain
            np.testing.assert_allclose(
                np.asarray(out["alpha"]), np.asarray(out_full["alpha"]), atol=1e-6
            )
