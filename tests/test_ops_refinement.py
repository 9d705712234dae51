"""Golden tests: mask-refinement ops vs straight-line NumPy oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops
from tests import oracles

H, W = 24, 32  # small enough for per-pixel oracles


def test_temporal_ema_first_frame(rng):
    cur = rng.random((2, H, W), dtype=np.float32)
    prev = np.zeros_like(cur)
    init = np.zeros((2,), dtype=bool)
    new_prev, out = ops.temporal_ema(jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(out), cur, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(new_prev), cur, rtol=0, atol=0)


def test_temporal_ema_warm(rng):
    prev = rng.random((H, W), dtype=np.float32)
    cur = rng.random((H, W), dtype=np.float32)
    expect_prev, expect_out = oracles.ema_oracle(prev, cur, 0.55)
    new_prev, out = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(True)
    )
    np.testing.assert_allclose(np.asarray(out), expect_out, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_prev), expect_prev, rtol=1e-6)


def test_temporal_ema_per_stream_knob(rng):
    prev = rng.random((3, H, W), dtype=np.float32)
    cur = rng.random((3, H, W), dtype=np.float32)
    ks = np.array([0.25, 0.55, 0.9], dtype=np.float32)
    init = np.array([True, True, False])
    new_prev, out = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(ks), jnp.asarray(init)
    )
    for s in range(2):
        ep, _ = oracles.ema_oracle(prev[s], cur[s], float(ks[s]))
        np.testing.assert_allclose(np.asarray(new_prev)[s], ep, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[2], cur[2])


def test_temporal_ema_adaptive(rng):
    """Motion-adaptive mode: adapt=0 is bit-exact reference EMA; below
    the T0 gate smoothing is untouched; above T1 the output tracks the
    current frame (effective EMA k*(1-adapt))."""
    from video_stream_segmenetation_tpu.runtime.config import (
        EMA_ADAPT_T0,
        EMA_ADAPT_T1,
    )

    prev = rng.random((2, H, W), dtype=np.float32)
    cur = rng.random((2, H, W), dtype=np.float32)
    init = np.array([True, True])
    fixed, _ = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(init)
    )
    zero_adapt, _ = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(init),
        adapt=0.0,
    )
    np.testing.assert_array_equal(np.asarray(zero_adapt), np.asarray(fixed))

    # static pixels: |cur - prev| <= T0 everywhere -> same as fixed EMA
    small = prev + rng.uniform(
        -EMA_ADAPT_T0, EMA_ADAPT_T0, prev.shape
    ).astype(np.float32) * 0.99
    f2, _ = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(small), 0.55, jnp.asarray(init)
    )
    a2, _ = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(small), 0.55, jnp.asarray(init),
        adapt=1.0,
    )
    np.testing.assert_allclose(np.asarray(a2), np.asarray(f2), atol=1e-6)

    # saturated motion: |cur - prev| >= T1 -> output == current at adapt=1
    big_prev = np.zeros((1, H, W), np.float32)
    big_cur = np.full((1, H, W), EMA_ADAPT_T1 + 0.1, np.float32)
    a3, out3 = ops.temporal_ema(
        jnp.asarray(big_prev), jnp.asarray(big_cur), 0.55,
        jnp.asarray([True]), adapt=1.0,
    )
    np.testing.assert_allclose(np.asarray(out3), big_cur, atol=1e-6)

    # per-stream knob: stream 0 adaptive, stream 1 reference
    ad = np.array([1.0, 0.0], np.float32)
    a4, _ = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(init),
        adapt=jnp.asarray(ad),
    )
    np.testing.assert_array_equal(np.asarray(a4)[1], np.asarray(fixed)[1])

    # first-frame copy semantics unchanged
    a5, out5 = ops.temporal_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55,
        jnp.asarray([False, False]), adapt=1.0,
    )
    np.testing.assert_array_equal(np.asarray(out5), cur)


def test_hole_filling_ema(rng):
    prev = rng.random((H, W), dtype=np.float32)
    cur = rng.random((H, W), dtype=np.float32)
    # force some holes
    cur[:5, :5] = 0.01
    prev[:5, :5] = 0.9
    new_prev, _ = ops.hole_filling_ema(
        jnp.asarray(prev), jnp.asarray(cur), 0.55, jnp.asarray(True)
    )
    got = np.asarray(new_prev)
    # hole region: prev * 0.9
    np.testing.assert_allclose(got[:5, :5], prev[:5, :5] * 0.9, rtol=1e-6)
    # elsewhere standard EMA (pick a pixel that is not a hole)
    assert abs(got[10, 10] - (0.55 * prev[10, 10] + 0.45 * cur[10, 10])) < 1e-6


def test_morphological_opening(rng):
    a = rng.random((H, W), dtype=np.float32)
    expect = oracles.opening_oracle(a)
    got = np.asarray(ops.morphological_opening(jnp.asarray(a)))
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-7)


def test_morphological_opening_batched(rng):
    a = rng.random((3, H, W), dtype=np.float32)
    got = np.asarray(ops.morphological_opening(jnp.asarray(a)))
    for s in range(3):
        np.testing.assert_allclose(got[s], oracles.opening_oracle(a[s]), atol=1e-7)


def test_closing_in_prior(rng):
    a = rng.random((H, W), dtype=np.float32)
    prior = oracles.face_prior_oracle((5.0, 4.0, 25.0, 20.0), 64, 48, W, H)
    expect = oracles.closing_in_prior_oracle(a, prior)
    got = np.asarray(
        ops.morphological_closing_in_prior(jnp.asarray(a), jnp.asarray(prior), True)
    )
    np.testing.assert_allclose(got, expect, atol=1e-7)


def test_closing_no_prior_identity(rng):
    a = rng.random((H, W), dtype=np.float32)
    got = np.asarray(
        ops.morphological_closing_in_prior(jnp.asarray(a), jnp.zeros((H, W)), False)
    )
    np.testing.assert_allclose(got, a)  # exact pass-through incl. borders


def test_joint_bilateral(rng):
    a = rng.random((H, W), dtype=np.float32)
    guide = (rng.random((H, W, 3)) * 255).astype(np.float32)
    expect = oracles.bilateral_oracle(a.astype(np.float64), guide.astype(np.float64), 1.0, 12.0)
    got = np.asarray(ops.joint_bilateral3x3(jnp.asarray(a), jnp.asarray(guide), 1.0, 12.0))
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-6)


def test_joint_bilateral_per_stream_sigmas(rng):
    a = rng.random((2, H, W), dtype=np.float32)
    guide = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    ss = np.array([0.7, 1.5], dtype=np.float32)
    sr = np.array([8.0, 20.0], dtype=np.float32)
    got = np.asarray(
        ops.joint_bilateral3x3(jnp.asarray(a), jnp.asarray(guide), jnp.asarray(ss), jnp.asarray(sr))
    )
    for s in range(2):
        expect = oracles.bilateral_oracle(
            a[s].astype(np.float64), guide[s].astype(np.float64), float(ss[s]), float(sr[s])
        )
        np.testing.assert_allclose(got[s], expect, rtol=2e-5, atol=2e-6)


def test_refine_no_prior(rng):
    a = rng.random((H, W), dtype=np.float32)
    expect = oracles.refine_oracle(a.astype(np.float64), 0.06, 0.95, 0.4)
    got = np.asarray(ops.refine_alpha(jnp.asarray(a), 0.06, 0.95, 0.4))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_refine_with_prior(rng):
    a = rng.random((H, W), dtype=np.float32)
    prior = oracles.face_prior_oracle((5.0, 4.0, 25.0, 20.0), 64, 48, W, H)
    expect = oracles.refine_oracle(a.astype(np.float64), 0.06, 0.95, 0.4, prior)
    got = np.asarray(
        ops.refine_alpha(jnp.asarray(a), 0.06, 0.95, 0.4, jnp.asarray(prior), True)
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_refine_prior_gated_off(rng):
    a = rng.random((H, W), dtype=np.float32)
    prior = np.full((H, W), 0.9, dtype=np.float32)
    got = np.asarray(
        ops.refine_alpha(jnp.asarray(a), 0.06, 0.95, 0.4, jnp.asarray(prior), False)
    )
    expect = oracles.refine_oracle(a.astype(np.float64), 0.06, 0.95, 0.4, None)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_refine_edge_cases():
    a = np.array([[0.0, 0.06, 0.0600001, 0.95, 0.949999, 1.0]], dtype=np.float32)
    got = np.asarray(ops.refine_alpha(jnp.asarray(a), 0.06, 0.95, 0.4))
    assert got[0, 0] == 0.0
    assert got[0, 1] == 0.0  # v <= low
    assert got[0, 3] == 1.0  # v >= high
    assert got[0, 5] == 1.0


def test_face_prior(rng):
    expect = oracles.face_prior_oracle((100.0, 80.0, 400.0, 380.0), 640, 480, W, H)
    got = np.asarray(
        ops.face_prior_mask(jnp.asarray([100.0, 80.0, 400.0, 380.0]), (480, 640), (H, W))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_face_prior_batched(rng):
    boxes = np.array([[100.0, 80.0, 400.0, 380.0], [10.0, 10.0, 100.0, 120.0]])
    got = np.asarray(ops.face_prior_mask(jnp.asarray(boxes), (480, 640), (H, W)))
    for s in range(2):
        expect = oracles.face_prior_oracle(tuple(boxes[s]), 640, 480, W, H)
        np.testing.assert_allclose(got[s], expect, rtol=1e-5, atol=1e-6)


def test_warp_affine_nearest(rng):
    src = rng.random((H, W), dtype=np.float32)
    aff = (1.02, 0.05, 2.5, -0.05, 1.02, -1.5)
    expect = oracles.warp_affine_nearest_oracle(src, aff)
    got = np.asarray(ops.warp_affine_nearest(jnp.asarray(src), jnp.asarray(aff)))
    np.testing.assert_allclose(got, expect, atol=1e-7)


def test_warp_identity(rng):
    src = rng.random((H, W), dtype=np.float32)
    got = np.asarray(
        ops.warp_affine_nearest(jnp.asarray(src), jnp.asarray([1.0, 0, 0, 0, 1.0, 0]))
    )
    np.testing.assert_allclose(got, src)


def test_warp_translate(rng):
    src = rng.random((H, W), dtype=np.float32)
    for dx, dy in [(3.7, -2.2), (-1.0, 4.0), (0.0, 0.0)]:
        expect = oracles.warp_translate_oracle(src, dx, dy)
        got = np.asarray(ops.warp_translate(jnp.asarray(src), dx, dy))
        np.testing.assert_allclose(got, expect, atol=0, err_msg=f"dx={dx} dy={dy}")


def test_invert_affine_roundtrip(rng):
    aff = jnp.asarray([1.1, 0.2, 5.0, -0.15, 0.95, -3.0])
    inv = ops.invert_affine(aff)
    ident = ops.invert_affine(inv)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(aff), rtol=1e-5, atol=1e-5)


def test_affine_lowpass():
    last = jnp.zeros((2, 6))
    upd = jnp.ones((2, 6))
    has_last = jnp.asarray([True, False])
    has_upd = jnp.asarray([True, True])
    new, has = ops.affine_lowpass(last, upd, 0.7, has_last, has_upd)
    np.testing.assert_allclose(np.asarray(new)[0], np.full(6, 0.7), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new)[1], np.ones(6))  # taken verbatim
    assert bool(np.asarray(has).all())


def test_affine_lowpass_no_update():
    last = jnp.full((1, 6), 0.5)
    upd = jnp.ones((1, 6))
    new, has = ops.affine_lowpass(
        last, upd, 0.7, jnp.asarray([True]), jnp.asarray([False])
    )
    np.testing.assert_allclose(np.asarray(new)[0], np.full(6, 0.5))


def test_ops_jit_compatible(rng):
    """The whole refinement chain under one jit."""
    a = jnp.asarray(rng.random((2, H, W), dtype=np.float32))
    guide = jnp.asarray((rng.random((2, H, W, 3)) * 255).astype(np.float32))
    prior = jnp.asarray(
        np.stack(
            [oracles.face_prior_oracle((5, 4, 25, 20), 64, 48, W, H)] * 2
        )
    )

    @jax.jit
    def chain(a, guide, prior):
        a = ops.morphological_opening(a)
        a = ops.morphological_closing_in_prior(a, prior, jnp.asarray([True, False]))
        a = ops.joint_bilateral3x3(a, guide)
        return ops.refine_alpha(a, 0.06, 0.95, 0.4, prior, jnp.asarray([True, False]))

    out = chain(a, guide, prior)
    assert out.shape == (2, H, W)
    assert np.isfinite(np.asarray(out)).all()
