"""Pallas fused kernels vs the pure-XLA ops chain (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.kernels.refine_fused import fused_refine

S, H, W = 2, 24, 128  # W multiple of 128 lanes; H multiple of 8


def _reference_chain(alpha, guide, prior, low, high, gamma, use_bi, ss, sr, has_prior):
    a = ops.morphological_opening(alpha)
    a = ops.morphological_closing_in_prior(a, prior, has_prior)
    a_bi = ops.joint_bilateral3x3(a, guide, ss, sr)
    a = jnp.where(use_bi[:, None, None], a_bi, a)
    return ops.refine_alpha(a, low, high, gamma, prior, has_prior)


@pytest.fixture
def inputs(rng):
    alpha = jnp.asarray(rng.random((S, H, W), dtype=np.float32))
    # integer-valued guide: the pipeline quantizes to u8 canvas parity
    guide = jnp.asarray(np.round(rng.random((S, H, W, 3)) * 255).astype(np.float32))
    prior = ops.face_prior_mask(
        jnp.asarray([[30.0, 20.0, 90.0, 70.0]] * S), (96, 160), (H, W)
    )
    return alpha, guide, prior


def test_fused_matches_ops_chain(inputs):
    alpha, guide, prior = inputs
    low = jnp.full((S,), 0.06)
    high = jnp.full((S,), 0.95)
    gamma = jnp.full((S,), 0.4)
    use_bi = jnp.asarray([True, False])
    ss = jnp.full((S,), 1.0)
    sr = jnp.full((S,), 12.0)
    has_prior = jnp.asarray([True, False])

    expect = _reference_chain(alpha, guide, prior, low, high, gamma, use_bi, ss, sr, has_prior)
    got = fused_refine(
        alpha, guide, prior, low, high, gamma, use_bi, ss, sr, has_prior,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-5, atol=2e-5)


def test_fused_per_stream_knobs(inputs):
    alpha, guide, prior = inputs
    low = jnp.asarray([0.02, 0.2])
    high = jnp.asarray([0.9, 0.99])
    gamma = jnp.asarray([0.4, 1.8])
    use_bi = jnp.asarray([True, True])
    ss = jnp.asarray([0.8, 1.4])
    sr = jnp.asarray([8.0, 20.0])
    has_prior = jnp.asarray([False, True])

    expect = _reference_chain(alpha, guide, prior, low, high, gamma, use_bi, ss, sr, has_prior)
    got = fused_refine(
        alpha, guide, prior, low, high, gamma, use_bi, ss, sr, has_prior,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=2e-5, atol=2e-5)


def test_gaussian_blur_mxu_matches_shifted(rng):
    """Planar matmul blur == shifted-slice blur (same taps/edges)."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu import ops

    x = jnp.asarray(rng.random((2, 24, 40, 3)).astype(np.float32))
    a = ops.gaussian_blur(x, 2.5)
    b = ops.gaussian_blur_mxu(x, 2.5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


def test_conv3x3_i8_fused_matches_quantized_ops(rng):
    """Pallas fused int8 conv (kernels/conv_int8.py) == the XLA int8
    serving ops (models/quantized.py) bit-exactly, with and without the
    residual epilogue."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu.kernels.conv_int8 import (
        conv3x3_i8_fused,
    )
    from video_stream_segmenetation_tpu.models.quantized import (
        _conv_i8,
        _requant,
    )

    S, H, W, C, CO = 2, 16, 32, 128, 128
    x = jnp.asarray(rng.integers(0, 127, (S, H, W, C)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-127, 127, (3, 3, C, CO)).astype(np.int8))
    mult = jnp.asarray(rng.random(CO).astype(np.float32) * 1e-3)
    bias = jnp.asarray((rng.random(CO).astype(np.float32) - 0.5))
    layer = {"wq": wq, "mult": mult, "bias": bias}

    ref = np.asarray(_requant(_conv_i8(x, layer)))
    got = np.asarray(conv3x3_i8_fused(x, wq, mult, bias, interpret=True))
    np.testing.assert_array_equal(got, ref)

    res = jnp.asarray(rng.integers(0, 127, (S, H, W, CO)).astype(np.int8))
    ref = np.asarray(
        _requant(_conv_i8(x, layer) + res.astype(jnp.float32) * (6.0 / 127.0))
    )
    got = np.asarray(
        conv3x3_i8_fused(
            x, wq, mult, bias, residual=res, with_residual=True, interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_decoder_level_fused_matches_xla(rng):
    """Fused decoder-level kernel (kernels/decoder_int8.py) == the XLA
    split_conv_up path (models/quantized.py) bit-exactly."""
    import jax.numpy as jnp

    from video_stream_segmenetation_tpu.kernels.decoder_int8 import (
        fused_decoder_level,
    )
    from video_stream_segmenetation_tpu.models.quantized import (
        _conv_i8,
        _nearest_x2,
        _requant,
    )

    S, SH, SW, CA, CB, CO = 2, 8, 16, 192, 128, 128
    small = jnp.asarray(rng.integers(0, 127, (S, SH, SW, CA)).astype(np.int8))
    skip = jnp.asarray(
        rng.integers(0, 127, (S, 2 * SH, 2 * SW, CB)).astype(np.int8)
    )
    wq = jnp.asarray(
        rng.integers(-127, 127, (1, 1, CA + CB, CO)).astype(np.int8)
    )
    mult = jnp.asarray(rng.random(CO).astype(np.float32) * 1e-3)
    bias = jnp.asarray((rng.random(CO).astype(np.float32) - 0.5))
    layer = {"wq": wq, "mult": mult, "bias": bias}

    la = {"wq": wq[:, :, :CA], "mult": mult, "bias": bias}
    lb = {"wq": wq[:, :, CA:], "mult": mult, "bias": jnp.zeros_like(bias)}
    ya = _nearest_x2(_conv_i8(small, la))
    ref = np.asarray(_requant(ya + _conv_i8(skip, lb)))

    got = np.asarray(fused_decoder_level(small, skip, layer, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_nano_trunk_megakernel_matches_xla(rng):
    """Whole-trunk megakernel (kernels/trunk_int8.py) == the XLA d2dn..
    u1red chain bit-exactly (interpret mode), via both the raw kernel
    and the QuantizedMatteNetHD decoder_impl='trunk' route."""
    import jax

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.kernels.trunk_int8 import (
        fused_nano_trunk,
    )
    from video_stream_segmenetation_tpu.models import quantized as Q

    fh, fw, ss = 240, 320, 10  # x0 24x32 (divisible by 4)
    model = models.MatteNetHD(stem_stride=ss, head_upsample=4, decoder="nano")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, fh, fw, 3)))
    q = Q.quantize_mattenet_hd(model, params)
    x = jnp.asarray(
        rng.integers(0, 255, (2, fh // ss, fw // ss, ss * ss * 3)).astype(
            np.uint8
        )
    )

    y = x.astype(jnp.bfloat16) @ q["stem_w"]
    x0 = Q._requant(y.astype(jnp.float32) + q["stem_b"])
    d2 = Q._requant(Q._conv_i8(x0, q["d2dn"], strides=(2, 2)))
    d2 = Q._qconv(d2, q["d2b"])
    d3 = Q._requant(Q._conv_i8(d2, q["d3dn"], strides=(2, 2)))
    d3 = Q._qconv(d3, q["d3b"])
    c3 = Q._conv_i8(d3, q["ctx"], dilation=(3, 3))
    ctx_f = jax.nn.relu6(c3 + d3.astype(jnp.float32) * Q.ACT_SCALE)
    ctx_f = Q._se_f32(ctx_f, q["ctxse/Dense_0"], q["ctxse/Dense_1"])
    ctx = jnp.round(jnp.clip(ctx_f, 0.0, 6.0) * (127.0 / 6.0)).astype(jnp.int8)

    def scu(small, skip, layer):
        ca = small.shape[-1]
        la = {"wq": layer["wq"][:, :, :ca], "mult": layer["mult"],
              "bias": layer["bias"]}
        lb = {"wq": layer["wq"][:, :, ca:], "mult": layer["mult"],
              "bias": jnp.zeros_like(layer["bias"])}
        ya = Q._nearest_x2(Q._conv_i8(small, la))[
            ..., : skip.shape[-3], : skip.shape[-2], :
        ]
        return Q._requant(ya + Q._conv_i8(skip, lb))

    u1_ref = np.asarray(scu(scu(ctx, d2, q["u2red"]), x0, q["u1red"]))
    u1_got = np.asarray(fused_nano_trunk(x0, q, interpret=True))
    np.testing.assert_array_equal(u1_got, u1_ref)

    a_xla = Q.QuantizedMatteNetHD(ss, 4, decoder="nano", decoder_impl="xla")
    a_trk = Q.QuantizedMatteNetHD(ss, 4, decoder="nano", decoder_impl="trunk")
    d = np.abs(
        np.asarray(a_xla.apply(q, x)["alpha"])
        - np.asarray(a_trk.apply(q, x)["alpha"])
    )
    assert d.max() < 1e-6


@pytest.mark.parametrize("decoder", ["nano", "pico", "femto"])
def test_nano_trunk_fused_alpha_head_matches_xla(rng, decoder):
    """The in-kernel int8 3x3 alpha head (fused_nano_trunk_alpha) ==
    _conv_i8(u1, alpha_q) bit-exactly: the s32 tap sums are
    order-independent and the f32 epilogue is the same ops.  Also pins
    the QuantizedMatteNetHD head_impl='int8' + decoder_impl='trunk'
    route end-to-end, at both nano (c2 192/c3 256) and pico (128/192)
    widths -- the megakernel reads widths from the weights."""
    import jax

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.kernels.trunk_int8 import (
        fused_nano_trunk,
        fused_nano_trunk_alpha,
    )
    from video_stream_segmenetation_tpu.models import quantized as Q

    fh, fw, ss = 240, 320, 10
    model = models.MatteNetHD(stem_stride=ss, head_upsample=4, decoder=decoder)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, fh, fw, 3)))
    q = Q.quantize_mattenet_hd(model, params)
    x = jnp.asarray(
        rng.integers(0, 255, (2, fh // ss, fw // ss, ss * ss * 3)).astype(
            np.uint8
        )
    )
    y = x.astype(jnp.bfloat16) @ q["stem_w"]
    x0 = Q._requant(y.astype(jnp.float32) + q["stem_b"])

    u1 = fused_nano_trunk(x0, q, interpret=True)
    ref = np.asarray(Q._conv_i8(u1, q["alpha_q"]))[..., 0]
    got = np.asarray(fused_nano_trunk_alpha(x0, q, interpret=True))
    np.testing.assert_array_equal(got, ref)

    a_xla = Q.QuantizedMatteNetHD(
        ss, 4, decoder="nano", decoder_impl="xla", head_impl="int8"
    )
    a_trk = Q.QuantizedMatteNetHD(
        ss, 4, decoder="nano", decoder_impl="trunk", head_impl="int8"
    )
    np.testing.assert_array_equal(
        np.asarray(a_xla.apply(q, x)["alpha"]),
        np.asarray(a_trk.apply(q, x)["alpha"]),
    )


def test_nano_trunk_rowfold_matches_quadfold(rng):
    """The in-VMEM column-fold route (fused_nano_trunk_alpha_rowfold:
    free row-fold bitcast in, one-hot MXU permutation dots inside the
    kernel) == the XLA-quad-folded route bit-exactly -- the permutation
    is an exact s8 selection.  Also pins the QuantizedMatteNetHD
    trunk_fold='vmem' route end-to-end."""
    import jax

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.kernels.trunk_int8 import (
        fused_nano_trunk_alpha_q,
        fused_nano_trunk_alpha_rowfold,
    )
    from video_stream_segmenetation_tpu.models import quantized as Q

    fh, fw, ss = 240, 320, 10
    model = models.MatteNetHD(stem_stride=ss, head_upsample=4, decoder="pico")
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, fh, fw, 3)))
    q = Q.quantize_mattenet_hd(model, params)
    x = jnp.asarray(
        rng.integers(0, 255, (2, fh // ss, fw // ss, ss * ss * 3)).astype(
            np.uint8
        )
    )
    y = x.astype(jnp.bfloat16) @ q["stem_w"]
    x0 = Q._requant(y.astype(jnp.float32) + q["stem_b"])

    s, h, w, c0 = x0.shape
    ref = np.asarray(
        fused_nano_trunk_alpha_q(
            x0.reshape(s, h // 4, 4, w // 4, 4 * c0), q, interpret=True
        )
    )
    got = np.asarray(
        fused_nano_trunk_alpha_rowfold(
            x0.reshape(s, h // 4, 4, w, c0), q, interpret=True
        )
    )
    np.testing.assert_array_equal(got, ref)

    a_xla = Q.QuantizedMatteNetHD(
        ss, 4, decoder="pico", decoder_impl="trunk", head_impl="int8",
        trunk_fold="xla",
    )
    a_vm = Q.QuantizedMatteNetHD(
        ss, 4, decoder="pico", decoder_impl="trunk", head_impl="int8",
        trunk_fold="vmem",
    )
    np.testing.assert_array_equal(
        np.asarray(a_xla.apply(q, x)["alpha"]),
        np.asarray(a_vm.apply(q, x)["alpha"]),
    )


def test_rowfold_perm_reusable_across_traces(rng):
    """The lru-cached column-fold permutation must be host data: caching
    a jnp constant created inside the FIRST trace leaks a tracer into
    every later program that reuses the cache entry (the bench's group
    step after the full step -- UnexpectedTracerError, 2026-08-19)."""
    import jax

    from video_stream_segmenetation_tpu import models
    from video_stream_segmenetation_tpu.kernels.trunk_int8 import (
        fused_nano_trunk_alpha_rowfold,
    )
    from video_stream_segmenetation_tpu.models import quantized as Q

    fh, fw, ss = 240, 320, 10
    model = models.MatteNetHD(stem_stride=ss, head_upsample=4, decoder="pico")
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, fh, fw, 3)))
    q = Q.quantize_mattenet_hd(model, params)

    def make_fn(s):
        x = jnp.asarray(
            rng.integers(-8, 8, (s, fh // ss * 4, fw // ss * 4, 128)).astype(
                np.int8
            )
        )
        h, w = x.shape[1], x.shape[2]
        xr = x.reshape(s, h // 4, 4, w, 128)
        return jax.jit(
            lambda a: fused_nano_trunk_alpha_rowfold(a, q, interpret=True)
        ), xr

    # two distinct jit programs (different batch sizes) share the cache
    f1, x1 = make_fn(1)
    f2, x2 = make_fn(2)
    a1 = np.asarray(f1(x1))
    a2 = np.asarray(f2(x2))  # would raise UnexpectedTracerError pre-fix
    assert np.isfinite(a1).all() and np.isfinite(a2).all()
