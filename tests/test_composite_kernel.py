"""Fused composite kernel vs the XLA composite path (interpret on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.kernels.composite_fused import fused_composite

S, H, W = 2, 160, 128  # H multiple of 80; W*3 = 384 = 3x128 lanes
MH, MW = 64, 64


def test_fused_composite_matches_xla(rng):
    frames = jnp.asarray((rng.random((S, H, W, 3)) * 255).astype(np.uint8))
    alpha = jnp.asarray(rng.random((S, MH, MW), dtype=np.float32))
    bg = jnp.asarray((rng.random((S, H, W, 3)) * 255).astype(np.uint8))

    got = np.asarray(fused_composite(frames, alpha, bg, interpret=True))

    a_up = jnp.clip(
        ops.resize_bilinear_mxu(alpha, (H, W), method="half_pixel", channel_last=False),
        0.0, 1.0,
    )
    expect = np.asarray(
        ops.alpha_composite(
            frames.astype(jnp.float32) / 255.0,
            a_up,
            background=bg.astype(jnp.float32) / 255.0,
            out_u8=True,
        )
    )
    # Wc rides in bf16 (weights <= 1): at most 1 u8 step of difference,
    # on a small fraction of pixels
    diff = np.abs(got.astype(np.int16) - expect.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.08


def test_fused_composite_extremes(rng):
    frames = jnp.asarray((rng.random((S, H, W, 3)) * 255).astype(np.uint8))
    bg = jnp.asarray((rng.random((S, H, W, 3)) * 255).astype(np.uint8))
    # alpha all 1 -> frame passthrough; all 0 -> background
    ones = jnp.ones((S, MH, MW))
    zeros = jnp.zeros((S, MH, MW))
    np.testing.assert_array_equal(
        np.asarray(fused_composite(frames, ones, bg, interpret=True)),
        np.asarray(frames),
    )
    np.testing.assert_array_equal(
        np.asarray(fused_composite(frames, zeros, bg, interpret=True)),
        np.asarray(bg),
    )
