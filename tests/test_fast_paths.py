"""Fast-path equivalences: separable warp, face-path compaction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, ops, runtime

MASK_HW = (32, 64)
FRAME_HW = (64, 128)


def test_separable_matches_exact_for_diagonal_affine(rng):
    src = jnp.asarray(rng.random((3, *MASK_HW), dtype=np.float32))
    aff = jnp.asarray(
        [[1.05, 0.0, 2.0, 0.0, 0.95, -1.5]] * 3
    )
    exact = ops.warp_affine_nearest(src, aff)
    sep = ops.warp_affine_separable(src, aff)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(exact))


def test_separable_translate_matches_translate(rng):
    src = jnp.asarray(rng.random(MASK_HW, dtype=np.float32))
    aff = jnp.asarray([1.0, 0.0, 3.0, 0.0, 1.0, -2.0])
    sep = ops.warp_affine_separable(src, aff)
    tr = ops.warp_translate(src, 3.0, -2.0)
    np.testing.assert_array_equal(np.asarray(sep), np.asarray(tr))


def test_separable_close_to_exact_for_small_rotation(rng):
    src = jnp.asarray(
        ops.gaussian_blur(
            jnp.asarray(rng.random((*MASK_HW, 1), dtype=np.float32)), 2.0
        )[..., 0]
    )
    theta = 0.02  # ~1.1 degrees
    aff = jnp.asarray(
        [np.cos(theta), -np.sin(theta), 1.0, np.sin(theta), np.cos(theta), 0.5]
    )
    exact = np.asarray(ops.warp_affine_nearest(src, aff))
    sep = np.asarray(ops.warp_affine_separable(src, aff))
    # smooth field + tiny rotation -> small pointwise difference
    interior = (slice(4, -4), slice(4, -4))
    assert np.abs(exact[interior] - sep[interior]).mean() < 0.02


@pytest.fixture(scope="module")
def face_setup():
    statics_kw = dict(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color",
    )
    key = jax.random.PRNGKey(0)
    matte = models.MatteNet(width=0.5)
    mp = matte.init(key, jnp.zeros((1, *MASK_HW, 3)))
    face = models.FaceFinder(input_size=64)
    fp = face.init(key, jnp.zeros((1, 64, 64, 3)))
    lmk = models.LandmarkNet()
    lp = lmk.init(key, jnp.zeros((1, 48, 48, 3)))
    bundle = runtime.ModelBundle(matte, mp, face, fp, lmk, lp)
    return bundle, statics_kw


def test_face_compaction_matches_full(face_setup, rng):
    """Compact gather/scatter face path == full-batch face path when the
    firing subset fits the compact batch."""
    bundle, statics_kw = face_setup
    S = 6
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    bg = jnp.zeros((S, *FRAME_HW, 3))
    knobs = runtime.default_knobs(S)
    gate = jnp.ones((S,), bool)

    outs = {}
    states = {}
    for compact in (False, True):
        statics = runtime.PipelineStatics(
            face_compact=compact, lmk_interval=6, **statics_kw
        )
        step = jax.jit(runtime.make_step(bundle, statics))
        state = runtime.init_state(S, MASK_HW)
        # staggered phases 0..5 -> exactly one stream fires per step
        state.frame_idx = jnp.arange(S, dtype=jnp.int32)
        st, out = step(bundle.params, state, frames, bg, knobs, gate)
        outs[compact] = out
        states[compact] = st

    np.testing.assert_array_equal(
        np.asarray(outs[True]["face_applied"]), np.asarray(outs[False]["face_applied"])
    )
    np.testing.assert_allclose(
        np.asarray(states[True].affine), np.asarray(states[False].affine),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(outs[True]["det_score"]), np.asarray(outs[False]["det_score"]),
        rtol=1e-4, atol=1e-5,
    )
    a = np.asarray(outs[True]["frame"]).astype(np.int16)
    b = np.asarray(outs[False]["frame"]).astype(np.int16)
    assert np.abs(a - b).max() <= 1


def test_face_compaction_overflow_drops_gracefully(face_setup, rng):
    """All streams on the same phase: only face_batch streams run; the
    rest skip the round (and nothing crashes)."""
    bundle, statics_kw = face_setup
    S = 6
    statics = runtime.PipelineStatics(
        face_compact=True, face_batch=2, lmk_interval=6, **statics_kw
    )
    step = jax.jit(runtime.make_step(bundle, statics))
    state = runtime.init_state(S, MASK_HW)  # all phase 0 -> all fire
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    st, out = step(
        bundle.params, state, frames, jnp.zeros((S, *FRAME_HW, 3)),
        runtime.default_knobs(S), jnp.ones((S,), bool),
    )
    assert int(np.asarray(out["face_applied"]).sum()) <= 2
    assert np.isfinite(np.asarray(out["alpha"])).all()
