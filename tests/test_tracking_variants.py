"""Reference pipeline variants as configurations: translation tracking,
hole-fill EMA, morphology-off."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import models, runtime

FRAME_HW = (64, 128)
MASK_HW = (32, 64)


@pytest.fixture(scope="module")
def bundle():
    key = jax.random.PRNGKey(0)
    matte = models.MatteNet(width=0.5)
    mp = matte.init(key, jnp.zeros((1, *MASK_HW, 3)))
    face = models.FaceFinder(input_size=64)
    fp = face.init(key, jnp.zeros((1, 64, 64, 3)))
    lmk = models.LandmarkNet()
    lp = lmk.init(key, jnp.zeros((1, 48, 48, 3)))
    return runtime.ModelBundle(matte, mp, face, fp, lmk, lp)


def _mkstep(bundle, **kw):
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="color", **kw,
    )
    return jax.jit(runtime.make_step(bundle, statics)), statics


def test_translation_tracking_updates_center(bundle, rng):
    step, statics = _mkstep(
        bundle, face_tracking="translation", lmk_interval=1, morphology=False,
    )
    S = 2
    state = runtime.init_state(S, MASK_HW)
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    knobs = runtime.default_knobs(S)
    gate = jnp.ones((S,), bool)
    bg = jnp.zeros((S, *FRAME_HW, 3))

    st1, out1 = step(bundle.params, state, frames, bg, knobs, gate)
    # first detection: center stored, but no delta yet (no prev center)
    if bool(np.asarray(st1.has_center).any()):
        assert not bool(np.asarray(out1["face_applied"]).any())
        st2, out2 = step(bundle.params, st1, frames, bg, knobs, gate)
        # second detection: delta available -> translation affine applied
        applied = np.asarray(out2["face_applied"])
        centers = np.asarray(st2.face_center)
        assert np.isfinite(centers).all()
        # the affine stays a pure translation
        aff = np.asarray(st2.affine)
        np.testing.assert_allclose(aff[:, 0], 1.0)
        np.testing.assert_allclose(aff[:, 1], 0.0)
        np.testing.assert_allclose(aff[:, 3], 0.0)
        np.testing.assert_allclose(aff[:, 4], 1.0)
    assert np.isfinite(np.asarray(out1["alpha"])).all()


def test_translation_affine_is_one_shot(bundle, rng):
    """Without a new detection, the stored affine must reset to identity
    (a displacement is applied once, not accumulated)."""
    step, _ = _mkstep(
        bundle, face_tracking="translation", lmk_interval=1, morphology=False,
    )
    S = 1
    state = runtime.init_state(S, MASK_HW)
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    knobs = runtime.default_knobs(S)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    st, _ = step(bundle.params, state, frames, bg, knobs, jnp.ones((S,), bool))
    # gate off -> no detection -> affine must be identity / has_affine False
    st2, _ = step(bundle.params, st, frames, bg, knobs, jnp.zeros((S,), bool))
    np.testing.assert_allclose(np.asarray(st2.affine)[0], [1, 0, 0, 0, 1, 0])
    assert not bool(st2.has_affine[0])


def test_hole_fill_filter_plugs_dropouts(rng):
    """A constant low-alpha matting model forces 'holes'; the hole_fill
    filter must retain prev*0.9 where plain EMA would blend down."""
    import flax.linen as nn

    class ConstMatte(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            dummy = self.param("w", nn.initializers.zeros, (1,))
            a = jnp.full(x.shape[:-1], 0.01, jnp.float32) + 0.0 * dummy[0]
            return {"alpha": a}

    matte = ConstMatte()
    mp = matte.init(jax.random.PRNGKey(0), jnp.zeros((1, *MASK_HW, 3)))
    fake = runtime.ModelBundle(matte, mp)
    step, _ = _mkstep(fake, face_path=False, temporal_filter="hole_fill")
    step_ema, _ = _mkstep(fake, face_path=False, temporal_filter="ema")
    S = 1
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    knobs = runtime.default_knobs(S)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)
    import dataclasses

    high = jnp.full((S, *MASK_HW), 0.9)
    sh = dataclasses.replace(
        runtime.init_state(S, MASK_HW), prev_alpha=high,
        initialized=jnp.ones((S,), bool),
    )
    se = dataclasses.replace(
        runtime.init_state(S, MASK_HW), prev_alpha=high,
        initialized=jnp.ones((S,), bool),
    )
    sh2, _ = step(fake.params, sh, frames, bg, knobs, gate)
    se2, _ = step_ema(fake.params, se, frames, bg, knobs, gate)
    ph = np.asarray(sh2.prev_alpha)
    pe = np.asarray(se2.prev_alpha)
    np.testing.assert_allclose(ph, 0.9 * 0.90, rtol=1e-5)  # decay branch
    np.testing.assert_allclose(pe, 0.55 * 0.9 + 0.45 * 0.01, rtol=1e-5)


def test_max_blend_warp_mode(bundle, rng):
    """branch-variant blend: base = max(cur, warped*0.75)."""
    import dataclasses

    step, _ = _mkstep(
        bundle, face_path=False, morphology=False,
        warp_blend_mode="max", warp_blend_weight=0.75,
        use_fused_refine=False,
    )
    S = 1
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    knobs = runtime.default_knobs(S)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    state = runtime.init_state(S, MASK_HW)
    # prime: high prev alpha + identity affine present
    state = dataclasses.replace(
        state,
        prev_alpha=jnp.full((S, *MASK_HW), 0.95),
        has_affine=jnp.ones((S,), bool),
        initialized=jnp.ones((S,), bool),
    )
    st, out = step(bundle.params, state, frames, bg, knobs, jnp.zeros((S,), bool))
    # max-blend floor: base >= warped*0.75 = 0.7125 -> EMA(0.55) of
    # prev 0.95 and base>=0.7125 keeps prev_alpha >= 0.843 in the warp's
    # valid region (identity warp -> everywhere)
    assert float(np.asarray(st.prev_alpha).min()) >= 0.55 * 0.95 + 0.45 * 0.7125 - 1e-5


def test_morphology_off_variant(bundle, rng):
    step_on, _ = _mkstep(bundle, face_path=False, morphology=True)
    step_off, _ = _mkstep(bundle, face_path=False, morphology=False)
    S = 1
    frames = jnp.asarray((rng.random((S, *FRAME_HW, 3)) * 255).astype(np.uint8))
    knobs = runtime.default_knobs(S)
    bg = jnp.zeros((S, *FRAME_HW, 3))
    gate = jnp.zeros((S,), bool)
    _, o1 = step_on(bundle.params, runtime.init_state(S, MASK_HW), frames, bg, knobs, gate)
    _, o2 = step_off(bundle.params, runtime.init_state(S, MASK_HW), frames, bg, knobs, gate)
    # opening zeroes the border ring; the no-morphology variant keeps it
    a1 = np.asarray(o1["alpha"])
    a2 = np.asarray(o2["alpha"])
    assert not np.allclose(a1, a2)
