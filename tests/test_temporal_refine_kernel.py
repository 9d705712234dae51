"""Fused temporal+refine kernel (stages 3-9) vs the ops chain."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops, runtime
from video_stream_segmenetation_tpu.kernels.refine_fused import fused_temporal_refine

S, H, W = 2, 24, 128


def _ops_chain(alpha_raw, prev, affine, use_warp, init, wb, guide, prior,
               ema, low, high, gamma, use_bi, ss, sr, has_prior,
               ema_adapt=None):
    warped = ops.warp_affine_separable(prev, affine)
    base = jnp.where(use_warp[:, None, None], warped * wb + alpha_raw * (1 - wb), alpha_raw)
    new_prev, a = ops.temporal_ema(prev, base, ema, init, adapt=ema_adapt)
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


def test_fused_temporal_refine_adaptive_ema_matches_ops(data):
    """The motion-adaptive EMA knob (kernel stage 4) vs the ops chain,
    with one stream adaptive and one at reference semantics."""
    alpha_raw, prev, affine, guide, prior = data
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    adapt = jnp.asarray([1.0, 0.0], jnp.float32)

    want_prev, want = _ops_chain(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior, ema_adapt=adapt,
    )
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior, knobs_ema_adapt=adapt, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_prev), np.asarray(want_prev), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    # the adaptive stream really differs from fixed-EMA on this data
    fixed_prev, _ = _ops_chain(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior,
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    assert np.abs(np.asarray(got_prev)[0] - np.asarray(fixed_prev)[0]).max() > 1e-3
    np.testing.assert_allclose(
        np.asarray(got_prev)[1], np.asarray(fixed_prev)[1], atol=2e-5
    )


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


def test_fused_temporal_refine_planar_guide_matches_hwc(data, rng):
    """guide_planar=True (channel-leading u8 planes) must be bit-identical
    to the HWC float guide path: u8 values are exact in bf16 either way."""
    alpha_raw, prev, affine, guide, prior = data
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    args = (
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    want_prev, want = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior, *args,
        interpret=True,
    )
    guide_pl = jnp.moveaxis(guide.astype(jnp.uint8), -1, -3)  # [S,3,H,W]
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide_pl, prior, *args,
        interpret=True, guide_planar=True,
    )
    np.testing.assert_array_equal(np.asarray(got_prev), np.asarray(want_prev))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_temporal_refine_analytic_prior_matches_plane(data):
    """prior_params (in-kernel ellipse rasterization) must match the
    plane-fed prior exactly: same formula, f32, interpret mode."""
    alpha_raw, prev, affine, guide, prior = data
    box = jnp.asarray([[30.0, 20.0, 90.0, 70.0]] * S)
    pp = ops.face_prior_params(box, (96, 160), (H, W))
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    args = (
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    want_prev, want = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior, *args,
        interpret=True,
    )
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, None, *args,
        interpret=True, prior_params=pp,
    )
    np.testing.assert_array_equal(np.asarray(got_prev), np.asarray(want_prev))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_temporal_refine_guide_lanes_matches_planar(data):
    """guide_lanes_geom (raw gathered lanes + in-VMEM unfold) must be
    bit-identical to the planar-guide path: the unfold is u8-exact
    (one-hot bf16 dots + sublane stack interleave)."""
    alpha_raw, prev, affine, guide, prior = data
    box = jnp.asarray([[30.0, 20.0, 90.0, 70.0]] * S)
    pp = ops.face_prior_params(box, (96, 160), (H, W))
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    args = (
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    guide_pl = jnp.moveaxis(guide.astype(jnp.uint8), -1, -3)  # [S,3,H,W]
    want_prev, want = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide_pl, None, *args,
        interpret=True, guide_planar=True, prior_params=pp,
    )
    fy, fx = 4, 4
    hp, wp = H // fy, W // fx
    # lanes[k = (c*fy+yy)*fx+xx, s, i, j] = guide[s, c, fy*i+yy, fx*j+xx]
    gl = (
        np.asarray(guide)
        .astype(np.uint8)
        .reshape(S, hp, fy, wp, fx, 3)
        .transpose(5, 2, 4, 0, 1, 3)
        .reshape(3 * fy * fx, S, hp, wp)
    )
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, jnp.asarray(gl), None,
        *args, interpret=True, prior_params=pp, guide_lanes_geom=(fy, fx),
    )
    np.testing.assert_array_equal(np.asarray(got_prev), np.asarray(want_prev))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_temporal_refine_lowres_alpha_matches_xla(data):
    """alpha_lowres_hw (head-grid logits, in-VMEM bilinear upsample +
    sigmoid) must match the XLA path (resize_bilinear_mxu(DEFAULT,
    half_pixel) + sigmoid) feeding the same kernel."""
    import jax

    _, prev, affine, guide, prior = data
    rng2 = np.random.default_rng(7)
    h0, w0 = H // 4, W // 4
    logits = jnp.asarray(
        (rng2.random((S, h0, w0)).astype(np.float32) - 0.5) * 8.0
    )
    alpha_full = jax.nn.sigmoid(
        ops.resize_bilinear_mxu(
            logits, (H, W), method="half_pixel", channel_last=False,
            precision=jax.lax.Precision.DEFAULT,
        )
    )
    box = jnp.asarray([[30.0, 20.0, 90.0, 70.0]] * S)
    pp = ops.face_prior_params(box, (96, 160), (H, W))
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    args = (
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    want_prev, want = fused_temporal_refine(
        alpha_full, prev, affine, use_warp, init, 0.3, guide, None, *args,
        interpret=True, prior_params=pp,
    )
    got_prev, got = fused_temporal_refine(
        logits, prev, affine, use_warp, init, 0.3, guide, None, *args,
        interpret=True, prior_params=pp, alpha_lowres_hw=(H, W),
    )
    np.testing.assert_allclose(
        np.asarray(got_prev), np.asarray(want_prev), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_fused_temporal_refine_bf16_out(data):
    """out_dtype=bf16: new_prev (state) stays exact f32; the refined
    output only rounds to bf16."""
    alpha_raw, prev, affine, guide, prior = data
    knobs = runtime.default_knobs(S)
    use_warp = jnp.asarray([True, False])
    init = jnp.asarray([True, True])
    has_prior = jnp.asarray([True, False])
    args = (
        knobs.ema, knobs.noise_cutoff, knobs.high_threshold, knobs.gamma,
        knobs.use_bilateral, knobs.sigma_spatial, knobs.sigma_range,
        has_prior,
    )
    want_prev, want = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior, *args,
        interpret=True,
    )
    got_prev, got = fused_temporal_refine(
        alpha_raw, prev, affine, use_warp, init, 0.3, guide, prior, *args,
        interpret=True, out_dtype=jnp.bfloat16,
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got_prev), np.asarray(want_prev))
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), atol=4e-3
    )


def test_engine_lowres_alpha_and_guide_lanes(rng):
    """refine_alpha_src='lowres' + guide_kernel_unfold=True through the
    full engine step == the default ('full' alpha, planar guide) engine
    (interpret kernel on CPU; the lane unfold is u8-exact and the lowres
    upsample matches the XLA taps)."""
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    kw = dict(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", use_fused_refine=True,
    )
    st_fast = preset(
        "fast_int8_micro", refine_alpha_src="lowres",
        guide_kernel_unfold=True, **kw,
    )
    st_base = preset(
        "fast_int8_micro", refine_alpha_src="full",
        guide_kernel_unfold=False, **kw,
    )
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    outs = []
    for st in (st_fast, st_base):
        eng = Engine(num_streams=2, statics=st, rng_seed=0, donate_state=False)
        eng.admit(); eng.admit()
        for _ in range(3):
            out = eng.process(frames)
        assert out["metrics"]["health"]["state"] == "ok"
        outs.append((np.asarray(out["alpha"]), np.asarray(out["frame"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=2e-5, atol=2e-5)
    assert np.mean(np.abs(outs[0][1].astype(np.int32) - outs[1][1])) < 0.02


def test_engine_analytic_prior_matches_plane(rng):
    """prior_impl='auto' (analytic in-kernel prior) == prior_impl='plane'
    through the full engine step (interpret kernel on CPU)."""
    import dataclasses

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    kw = dict(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", use_fused_refine=True,
    )
    st_an = preset("fast_int8_micro", prior_impl="auto", **kw)
    st_pl = preset("fast_int8_micro", prior_impl="plane", **kw)
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    outs = []
    for st in (st_an, st_pl):
        eng = Engine(num_streams=2, statics=st, rng_seed=0, donate_state=False)
        eng.admit(); eng.admit()
        for _ in range(3):
            out = eng.process(frames)
        assert out["metrics"]["health"]["state"] == "ok"
        outs.append(np.asarray(out["alpha"]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_engine_planar_guide_branch(rng):
    """fast_int8_micro with use_fused_refine=True routes the planar-u8
    guide end to end (interpret kernel on CPU) and matches the XLA-chain
    configuration of the same engine."""
    import dataclasses

    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    kw = dict(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color",
    )
    st_pl = preset("fast_int8_micro", use_fused_refine=True, **kw)
    st_xla = preset("fast_int8_micro", use_fused_refine=False, **kw)
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    outs = []
    for st in (st_pl, st_xla):
        eng = Engine(num_streams=2, statics=st, rng_seed=0, donate_state=False)
        eng.admit(); eng.admit()
        for _ in range(2):
            out = eng.process(frames)
        assert out["metrics"]["health"]["state"] == "ok"
        outs.append(np.asarray(out["alpha"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=3e-5, atol=3e-5)


def test_engine_host_guide_lanes_matches_gather(rng):
    """guide_source='host' (frames as a (packed, lanes) tuple, or natural
    input with the convenience device gather) == guide_source='gather',
    bit-exact: the lanes carry the identical u8 taps."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops
    from video_stream_segmenetation_tpu.runtime.presets import preset
    from video_stream_segmenetation_tpu.service import Engine

    kw = dict(
        frame_hw=(80, 160), mask_hw=(32, 64), fd_size=64, lmk_size=48,
        background="color", use_fused_refine=True, guide_kernel_unfold=True,
    )
    st_gather = preset("fast_int8_micro", guide_source="gather", **kw)
    st_host = preset("fast_int8_micro", guide_source="host", **kw)
    frames = (rng.random((2, 80, 160, 3)) * 255).astype(np.uint8)
    packed = ops.space_to_depth(jnp.asarray(frames), st_host.s2d_block)
    lanes, _ = ops.guide_lanes_s2d(
        packed, st_host.frame_hw, st_host.mask_hw, st_host.s2d_block
    )

    def run(st, feed):
        eng = Engine(num_streams=2, statics=st, rng_seed=0, donate_state=False)
        eng.admit(); eng.admit()
        for _ in range(2):
            out = eng.process(feed)
        assert out["metrics"]["health"]["state"] == "ok"
        return np.asarray(out["alpha"]), np.asarray(out["frame"])

    a0, f0 = run(st_gather, frames)
    a1, f1 = run(st_host, (np.asarray(packed), np.asarray(lanes)))
    a2, f2 = run(st_host, frames)  # natural input -> device-side lanes
    np.testing.assert_array_equal(a1, a0)
    np.testing.assert_array_equal(a2, a0)
    if f1.shape[-1] != 3:  # tuple-input output may stay packed
        f1 = np.asarray(ops.depth_to_space(jnp.asarray(f1), st_host.s2d_block))
    np.testing.assert_array_equal(f1, f0)
    np.testing.assert_array_equal(f2, f0)
