"""Fused temporal+refine kernel (stages 3-9) vs the ops chain."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops, runtime
from video_stream_segmenetation_tpu.kernels.refine_fused import fused_temporal_refine

S, H, W = 2, 24, 128


def _ops_chain(alpha_raw, prev, affine, use_warp, init, wb, guide, prior,
               ema, low, high, gamma, use_bi, ss, sr, has_prior):
    warped = ops.warp_affine_separable(prev, affine)
    base = jnp.where(use_warp[:, None, None], warped * wb + alpha_raw * (1 - wb), alpha_raw)
    new_prev, a = ops.temporal_ema(prev, base, ema, init)
    a = ops.morphological_opening(a)
    a = ops.morphological_closing_in_prior(a, prior, has_prior)
    ab = ops.joint_bilateral3x3(a, guide, ss, sr)
    a = jnp.where(use_bi[:, None, None], ab, a)
    return new_prev, ops.refine_alpha(a, low, high, gamma, prior, has_prior)


@pytest.fixture
def data(rng):
    alpha_raw = jnp.asarray(rng.random((S, H, W), dtype=np.float32))
    prev = jnp.asarray(rng.random((S, H, W), dtype=np.float32))
    affine = jnp.asarray([[1.02, 0.0, 1.5, 0.0, 0.98, -1.0], [1.0, 0, 0, 0, 1.0, 0]])
    guide = jnp.asarray(np.round(rng.random((S, H, W, 3)) * 255).astype(np.float32))
    prior = ops.face_prior_mask(
        jnp.asarray([[30.0, 20.0, 90.0, 70.0]] * S), (96, 160), (H, W)
    )
    return alpha_raw, prev, affine, guide, prior


def test_fused_temporal_refine_matches_ops(data):
    alpha_raw, prev, affine, guide, prior = data
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])

    want_prev, want = _ops_chain(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range, has_prior,
    )
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range, has_prior,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_prev), np.asarray(want_prev), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_temporal_refine_cold_start(data):
    """Uninitialized streams copy the base (first-frame semantics)."""
    alpha_raw, prev, affine, guide, prior = data
    knobs = runtime.default_knobs(S)
    got_prev, _ = fused_temporal_refine(
        alpha_raw, jnp.zeros_like(prev), affine,
        jnp.zeros((S,), bool), jnp.zeros((S,), bool), 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        jnp.zeros((S,), bool), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_prev), np.asarray(alpha_raw), atol=1e-6)


def test_fused_temporal_refine_out_of_range_zero_fill(data):
    """A large translation pushes sources out of range -> warped zeros."""
    alpha_raw, prev, _, guide, prior = data
    knobs = runtime.default_knobs(S)
    big = jnp.asarray([[1.0, 0.0, 1000.0, 0.0, 1.0, 1000.0]] * S)
    want_prev, _ = _ops_chain(
        alpha_raw, prev, big, jnp.ones((S,), bool), jnp.ones((S,), bool),
        0.3, guide, prior, knobs.ema, knobs.noise_cutoff,
        knobs.high_threshold, knobs.gamma, knobs.use_bilateral,
        knobs.sigma_spatial, knobs.sigma_range, jnp.zeros((S,), bool),
    )
    got_prev, _ = fused_temporal_refine(
        alpha_raw, prev, big, jnp.ones((S,), bool), jnp.ones((S,), bool),
        0.3, guide, prior, knobs.ema, knobs.noise_cutoff,
        knobs.high_threshold, knobs.gamma, knobs.use_bilateral,
        knobs.sigma_spatial, knobs.sigma_range, jnp.zeros((S,), bool),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_prev), np.asarray(want_prev), atol=2e-5)
