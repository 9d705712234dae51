"""Fused mask-refinement Pallas kernel.

Fuses the post-model refinement chain -- morphological opening (erode +
dilate), prior-gated closing (dilate + erode), joint bilateral 3x3, and
threshold/gamma/prior refine (reference stages 5/7/8/9,
client/src/core/frameProcessorTest.ts:118,157,160-166) -- into ONE kernel:
five HBM-bound stencil passes become one VMEM-resident program per stream.

Design (per pallas_guide.md):
* grid = (S,): one program per stream; a whole 288x512 f32 mask plane is
  576 KB, guide 3 planes 1.7 MB, prior 576 KB, ~2 scratch planes -- all
  comfortably inside the ~16 MB VMEM budget, so no spatial tiling / halo
  exchange is needed.
* per-stream live knobs ride in SMEM as (1, 1) scalar blocks (tier-2
  config -- changing them never recompiles).
* W = 512 = 4 x 128 lanes, H = 288 = 36 x 8 sublanes: natively tiled f32.
* all stencils are value-level shifted-slice min/max/madd on the VPU;
  border semantics match ops/morphology.py exactly (interior-only writes,
  zero borders) and the bilateral self-normalizes at edges via validity
  accumulation.

Numerics are pinned against the pure-XLA ops (tests/test_kernels.py); the
pipeline can swap this in for the jnp chain via `use_fused_refine`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stream_segmenetation_tpu.ops.refine import (
    FACE_FLOOR,
    NEAR_BG_BLEND,
    NEAR_BG_CAP,
)


def _min3x3_interior(a: jnp.ndarray) -> jnp.ndarray:
    """[H, W] -> [H-2, W-2] windowed min, separable (vertical then
    horizontal single-axis slices -- Mosaic crashes on stacked graphs of
    diagonal slice windows, see tests/test_kernels.py notes)."""
    h, w = a.shape
    v = jnp.minimum(jnp.minimum(a[: h - 2, :], a[1 : h - 1, :]), a[2:, :])
    return jnp.minimum(jnp.minimum(v[:, : w - 2], v[:, 1 : w - 1]), v[:, 2:])


def _max3x3_interior(a: jnp.ndarray) -> jnp.ndarray:
    h, w = a.shape
    v = jnp.maximum(jnp.maximum(a[: h - 2, :], a[1 : h - 1, :]), a[2:, :])
    return jnp.maximum(jnp.maximum(v[:, : w - 2], v[:, 1 : w - 1]), v[:, 2:])


def _interior_only(x_interior: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Embed an interior plane into a zero-bordered [H, W] plane.

    jnp.pad (lax.pad) lowers cleanly in Mosaic for *stencil* outputs;
    .at[].set/.add do not (scatter unimplemented), and pad of a CENTER
    slice (pad(a[1:-1, 1:-1])) crashes the Mosaic compiler outright --
    use `_border_zero` for that case instead.
    """
    return jnp.pad(x_interior, ((1, 1), (1, 1)))


def _interior_mask(h: int, w: int) -> jnp.ndarray:
    """Static bool [H, W]: True away from the 1-px border (iota-based --
    the slice+pad formulation crashes Mosaic)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (ri > 0) & (ri < h - 1) & (ci > 0) & (ci < w - 1)


def _guide_bf16(g):
    """Guide plane as bf16 values in 0..255.  Accepts bf16 (pre-converted
    outside) or u8 (planar fast path: converted HERE so only 1 byte/px
    crosses HBM; Mosaic has no direct u8->float cast -- hop through i32)."""
    if g.dtype == jnp.uint8:
        return g.astype(jnp.int32).astype(jnp.bfloat16)
    return g


def _chain_body(i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
                has_prior_ref, a, g_r, g_g, g_b, prior, debug=()):
    """Stages 5/7/8/9 on one [H, W] plane (shared by both kernels).

    debug: bench-only stage truncations ('no_morph' skips stages 5/7,
    'no_bilateral' skips stage 8) -- compile-time, attribution only.
    """
    g_r, g_g, g_b = _guide_bf16(g_r), _guide_bf16(g_g), _guide_bf16(g_b)
    h, w = a.shape
    has_prior = has_prior_ref[i] > 0

    if "no_morph" not in debug:
        # ---- stage 5: opening (interior-only, zero borders; morphology.py)
        eroded = _interior_only(jnp.minimum(_min3x3_interior(a), 1.0), h, w)
        opened = _interior_only(jnp.maximum(_max3x3_interior(eroded), 0.0), h, w)

        # ---- stage 7: closing inside the prior (full-size selects against
        # an iota interior mask -- center-slice pads crash Mosaic)
        interior = _interior_mask(h, w)
        in_prior = interior & (prior > 0)
        dil_f = _interior_only(jnp.maximum(_max3x3_interior(opened), 0.0), h, w)
        dilated = jnp.where(
            in_prior, dil_f, jnp.where(interior, opened, 0.0)
        )
        ero_f = _interior_only(jnp.minimum(_min3x3_interior(dilated), 1.0), h, w)
        closed = jnp.where(in_prior, ero_f, dilated)
        a = jnp.where(has_prior, closed, opened)

    # ---- stage 8: joint bilateral 3x3 (self-normalizing at edges)
    ss = ss_ref[i]
    sr = sr_ref[i]
    inv_two_ss2 = 1.0 / (2.0 * ss * ss)
    inv_two_sr2 = 1.0 / (2.0 * sr * sr)

    # Shifts are composed per-axis (vertical pass, then horizontal):
    # Mosaic crashes on graphs with multiple *diagonal* slice+pad taps,
    # and single-axis pads also produce a simpler program.  Out-of-bounds
    # neighbors are excluded by the shifted ones-mask (self-normalizing
    # edges, frameProcessorTest.ts:248-251).
    def vshift(t, dy):
        if dy == 0:
            return t
        if dy > 0:
            return jnp.pad(t[dy:, :], ((0, dy), (0, 0)))
        return jnp.pad(t[:dy, :], ((-dy, 0), (0, 0)))

    def hshift(t, dx):
        if dx == 0:
            return t
        if dx > 0:
            return jnp.pad(t[:, dx:], ((0, 0), (0, dx)))
        return jnp.pad(t[:, :dx], ((0, 0), (-dx, 0)))

    if "no_bilateral" not in debug:
        ones = jnp.ones((h, w), jnp.bfloat16)
        sum_w = jnp.zeros((h, w), jnp.float32)
        sum_a = jnp.zeros((h, w), jnp.float32)
        for dy in (-1, 0, 1):
            a_y = vshift(a, dy)
            r_y = vshift(g_r, dy)
            gy_y = vshift(g_g, dy)
            b_y = vshift(g_b, dy)
            v_y = vshift(ones, dy)
            for dx in (-1, 0, 1):
                a_n = hshift(a_y, dx)
                dr = (hshift(r_y, dx) - g_r).astype(jnp.float32)
                dg = (hshift(gy_y, dx) - g_g).astype(jnp.float32)
                db = (hshift(b_y, dx) - g_b).astype(jnp.float32)
                v_n = hshift(v_y, dx)
                range2 = dr * dr + dg * dg + db * db
                spatial2 = jnp.float32(dy * dy + dx * dx)
                wgt = (
                    jnp.exp(-spatial2 * inv_two_ss2)
                    * jnp.exp(-range2 * inv_two_sr2)
                    * v_n
                )
                sum_w = sum_w + wgt
                sum_a = sum_a + wgt * a_n
        a_bi = sum_a / sum_w
        a = jnp.where(use_bi_ref[i] > 0, a_bi, a)

    # ---- stage 9: threshold/gamma + prior clamps (refine.py)
    low = low_ref[i]
    high = high_ref[i]
    gamma = gamma_ref[i]
    denom = jnp.maximum(1e-6, high - low)
    t = jnp.clip((a - low) / denom, 0.0, 1.0)
    mid = jnp.exp(gamma * jnp.log(jnp.maximum(t, 1e-30)))
    v = jnp.where(a <= low, 0.0, jnp.where(a >= high, 1.0, mid))
    floor = jnp.minimum(1.0, FACE_FLOOR * prior + 0.15)
    cap = NEAR_BG_CAP + NEAR_BG_BLEND * prior
    clamped = jnp.where(
        prior > 0.25, jnp.maximum(v, floor), jnp.where(prior > 0, jnp.minimum(v, cap), v)
    )
    return jnp.where(has_prior, clamped, v)


def _refine_kernel(
    # scalar-prefetch refs: full [S] arrays in SMEM, indexed by program id
    low_ref,
    high_ref,
    gamma_ref,
    use_bi_ref,
    ss_ref,
    sr_ref,
    has_prior_ref,
    # tensor (VMEM) refs
    alpha_ref,  # [1, H, W]
    gr_ref,  # [1, H, W] guide R (bf16, u8-valued)
    gg_ref,
    gb_ref,
    prior_ref,  # [1, H, W]
    out_ref,  # [1, H, W]
):
    i = pl.program_id(0)
    out_ref[0] = _chain_body(
        i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
        has_prior_ref, alpha_ref[0], gr_ref[0], gg_ref[0], gb_ref[0],
        prior_ref[0],
    )


def _temporal_refine_kernel(
    # scalar-prefetch refs
    low_ref,
    high_ref,
    gamma_ref,
    use_bi_ref,
    ss_ref,
    sr_ref,
    has_prior_ref,
    ema_ref,  # [S] f32 EMA knob
    adapt_ref,  # [S] f32 motion-adaptive EMA strength (0 = reference)
    use_warp_ref,  # [S] int -- has_affine & initialized
    init_ref,  # [S] int -- EMA initialized flag
    wb_ref,  # [S] f32 warp blend weight (0.3 active / 0.5 blaze)
    # tensor refs
    alpha_ref,  # [1, H, W] raw model alpha
    prev_ref,  # [1, H, W] previous EMA accumulator
    idx_ref,  # [1, 8, W] int32 aux: row 0 = yi (padded), row 1 = xi
    gr_ref,
    gg_ref,
    gb_ref,
    prior_ref,
    newprev_ref,  # out: [1, H, W] updated EMA accumulator
    out_ref,  # out: [1, H, W] refined alpha
    debug=(),  # bench-only truncation tokens (bound via functools.partial)
):
    """Plane-fed prior variant: prior rides as a [1, H, W] VMEM ref."""
    i = pl.program_id(0)
    _tr_body(
        i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
        has_prior_ref, ema_ref, adapt_ref, use_warp_ref, init_ref, wb_ref,
        alpha_ref[0], prev_ref, idx_ref, gr_ref[0], gg_ref[0], gb_ref[0],
        prior_ref[0], newprev_ref, out_ref, debug,
    )


def _temporal_refine_kernel_analytic(
    # scalar-prefetch refs (prior rides as 4 scalars per stream)
    low_ref,
    high_ref,
    gamma_ref,
    use_bi_ref,
    ss_ref,
    sr_ref,
    has_prior_ref,
    ema_ref,
    adapt_ref,
    use_warp_ref,
    init_ref,
    wb_ref,
    pcx_ref,  # [S] prior ellipse center x (mask px)
    pcy_ref,
    prx_ref,  # [S] prior ellipse radii (>= 1e-6)
    pry_ref,
    # tensor refs
    alpha_ref,
    prev_ref,
    idx_ref,
    gr_ref,
    gg_ref,
    gb_ref,
    newprev_ref,
    out_ref,
    debug=(),
):
    """Analytic-prior variant: the soft ellipse is rasterized in VMEM
    from 4 SMEM scalars (ops/prior.py::prior_plane_from_params) -- the
    [S, H, W] f32 prior plane never exists in HBM (saves the face-path
    scatter write + the kernel read, ~75 MB/step at S=64)."""
    from video_stream_segmenetation_tpu.ops.prior import (
        prior_plane_from_params,
    )

    i = pl.program_id(0)
    h, w = alpha_ref.shape[1], alpha_ref.shape[2]
    prior = jnp.where(
        has_prior_ref[i] > 0,
        prior_plane_from_params(
            pcx_ref[i], pcy_ref[i], prx_ref[i], pry_ref[i], (h, w)
        ),
        jnp.zeros((h, w), jnp.float32),
    )
    _tr_body(
        i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
        has_prior_ref, ema_ref, adapt_ref, use_warp_ref, init_ref, wb_ref,
        alpha_ref[0], prev_ref, idx_ref, gr_ref[0], gg_ref[0], gb_ref[0],
        prior, newprev_ref, out_ref, debug,
    )


def _guide_from_lanes(gl, fy, fx, w):
    """Unfold the raw gathered s2d guide lanes into the 3 bf16 guide
    planes, in VMEM (ops/layout.py::guide_lanes_s2d produces the lanes;
    the planar [S,3,H,W] guide and its (fy,fx)-interleave relayout never
    exist in HBM).

    gl: [nl, 1, hp, wp] u8 lane planes in guide_s2d_sel(planar=True)
    order (k = (c*fy + yy)*fx + xx); plane value at (i, j) = guide pixel
    (fy*i + yy, fx*j + xx).  Per (c, yy): the x-interleave is a one-hot
    MXU dot [hp, wp] @ E_xx[wp, w] (exact: u8 ints are exact in bf16 and
    every output column has exactly one contributor); the y-interleave is
    a sublane stack (Mosaic-probe-verified, see kernels/trunk_int8.py).
    """
    nl, _, hp, wp = gl.shape
    planes = []
    for c in range(3):
        rows = []
        for yy in range(fy):
            acc = None
            for xx in range(fx):
                g = gl[(c * fy + yy) * fx + xx, 0]  # [hp, wp] u8
                g = g.astype(jnp.int32).astype(jnp.bfloat16)
                row = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (wp, w), 1)
                e = (col == fx * row + xx).astype(jnp.bfloat16)
                d = jnp.dot(g, e, preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            rows.append(acc)  # [hp, w] f32 (u8-valued)
        plane = jnp.stack(rows, axis=1).reshape(hp * fy, w)
        planes.append(plane.astype(jnp.bfloat16))
    return planes


def _temporal_refine_kernel_fast(
    # scalar-prefetch refs (analytic prior: 4 scalars per stream)
    low_ref,
    high_ref,
    gamma_ref,
    use_bi_ref,
    ss_ref,
    sr_ref,
    has_prior_ref,
    ema_ref,
    adapt_ref,
    use_warp_ref,
    init_ref,
    wb_ref,
    pcx_ref,
    pcy_ref,
    prx_ref,
    pry_ref,
    # tensor refs (layout depends on the statically-bound options)
    *refs,
    lowres=False,
    lanes=None,
    debug=(),
):
    """Production fast-path variant (analytic prior required) with two
    statically-bound boundary cuts:

    * ``lowres``: alpha rides as HEAD-GRID logits [1, h0, w0] plus the
      two bilinear interp matrices; the x4 upsample + sigmoid run in
      VMEM, so the [S, H, W] f32 alpha_raw never exists in HBM
      (~150 MB/step round trip at S=64; matches the XLA path
      resize_bilinear_mxu(DEFAULT) + sigmoid, models/quantized.py).
    * ``lanes=(fy, fx)``: the guide rides as the raw gathered s2d lane
      planes [nl, 1, hp, wp] u8 and is unfolded in VMEM
      (_guide_from_lanes) -- the planar guide reassembly relayout
      (ops/layout.py::guide_from_gathered) never exists in HBM.
    """
    refs = list(refs)
    alpha_ref = refs.pop(0)
    prev_ref = refs.pop(0)
    idx_ref = refs.pop(0)
    if lowres:
        ah_ref = refs.pop(0)  # [H, h0] f32 bilinear rows
        aw_ref = refs.pop(0)  # [w0, W] f32 bilinear cols (pre-transposed)
    if lanes is not None:
        gl_ref = refs.pop(0)  # [nl, 1, hp, wp] u8
    else:
        gr_ref, gg_ref, gb_ref = refs[:3]
        refs = refs[3:]
    newprev_ref, out_ref = refs[-2:]

    from video_stream_segmenetation_tpu.ops.prior import (
        prior_plane_from_params,
    )

    i = pl.program_id(0)
    if lowres:
        logits = alpha_ref[0].astype(jnp.float32)  # [h0, w0]
        up = jnp.dot(
            ah_ref[...], logits, preferred_element_type=jnp.float32
        )
        a_raw = jax.nn.sigmoid(
            jnp.dot(up, aw_ref[...], preferred_element_type=jnp.float32)
        )
    else:
        a_raw = alpha_ref[0]
    h, w = a_raw.shape
    if lanes is not None:
        g_r, g_g, g_b = _guide_from_lanes(gl_ref[...], *lanes, w)
    else:
        g_r, g_g, g_b = gr_ref[0], gg_ref[0], gb_ref[0]
    prior = jnp.where(
        has_prior_ref[i] > 0,
        prior_plane_from_params(
            pcx_ref[i], pcy_ref[i], prx_ref[i], pry_ref[i], (h, w)
        ),
        jnp.zeros((h, w), jnp.float32),
    )
    _tr_body(
        i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
        has_prior_ref, ema_ref, adapt_ref, use_warp_ref, init_ref, wb_ref,
        a_raw, prev_ref, idx_ref, g_r, g_g, g_b,
        prior, newprev_ref, out_ref, debug,
    )


def _tr_body(
    i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
    has_prior_ref, ema_ref, adapt_ref, use_warp_ref, init_ref, wb_ref,
    a_raw, prev_ref, idx_ref, g_r, g_g, g_b,
    prior, newprev_ref, out_ref, debug,
):
    """Stages 3+4 (separable warp via one-hot MXU matmuls + EMA) fused in
    front of the refinement chain -- the whole post-model mask path
    (reference stages 3-9) in one VMEM-resident program."""
    h, w = a_raw.shape
    prev = prev_ref[0]

    # ---- stage 3: separable nearest warp of prev (ops.warp_affine_separable)
    # one-hot selection matrices; out-of-range indices (encoded -1 /
    # any value outside [0, n)) produce all-zero rows = zero fill
    yi = idx_ref[0, 0, :h]  # [H] int32 source row per output row
    xi = idx_ref[0, 1, :w]  # [W] int32 source col per output col
    r_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (h, h), 1) == yi[:, None]
    ).astype(jnp.float32)
    c_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (w, w), 0) == xi[None, :]
    ).astype(jnp.float32)
    # DEFAULT precision: Mosaic rejects HIGH, and HIGHEST costs 2x the
    # MXU passes.  One-hot selection is tolerant of reduced precision in
    # the SELECTOR (0/1 is exact in bf16); any rounding applies to the
    # selected prev values -- compiled-vs-interpret agreement is recorded
    # on the real chip by tools/kernel_parity.py.
    rows = jnp.dot(r_sel, prev, preferred_element_type=jnp.float32)
    warped = jnp.dot(rows, c_sel, preferred_element_type=jnp.float32)
    wb = wb_ref[i]
    base = jnp.where(
        use_warp_ref[i] > 0, warped * wb + a_raw * (1.0 - wb), a_raw
    )

    # ---- stage 4: temporal EMA (first-frame copy semantics), with the
    # optional per-pixel motion-adaptive gate (adapt=0 = reference-exact;
    # ops/temporal.py::temporal_ema is the pinned XLA twin)
    from video_stream_segmenetation_tpu.runtime.config import (
        EMA_ADAPT_T0,
        EMA_ADAPT_T1,
    )

    k = ema_ref[i]
    ad = adapt_ref[i]
    d = jnp.abs(base - prev)
    m = jnp.clip(
        (d - EMA_ADAPT_T0) * (1.0 / (EMA_ADAPT_T1 - EMA_ADAPT_T0)), 0.0, 1.0
    )
    ke = k * (1.0 - ad * m)
    new_prev = jnp.where(
        init_ref[i] > 0, ke * prev + (1.0 - ke) * base, base
    )
    newprev_ref[0] = new_prev

    refined = _chain_body(
        i, low_ref, high_ref, gamma_ref, use_bi_ref, ss_ref, sr_ref,
        has_prior_ref, new_prev, g_r, g_g, g_b,
        prior, debug=debug,
    )
    out_ref[0] = refined.astype(out_ref.dtype)


def fused_refine(
    alpha: jnp.ndarray,  # [S, H, W] f32 (post warp+EMA)
    guide: jnp.ndarray,  # [S, H, W, 3] in 0..255 units
    prior: jnp.ndarray,  # [S, H, W]
    knobs_low: jnp.ndarray,  # [S]
    knobs_high: jnp.ndarray,
    knobs_gamma: jnp.ndarray,
    knobs_use_bilateral: jnp.ndarray,  # [S] bool
    knobs_ss: jnp.ndarray,
    knobs_sr: jnp.ndarray,
    has_prior: jnp.ndarray,  # [S] bool
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One fused pass over all streams.  Returns refined alpha [S, H, W].

    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (the CPU test backend), mirroring the reference's EP fallback stance.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, h, w = alpha.shape
    # quantize the guide to u8 integer values (the reference's guide comes
    # from canvas getImageData and IS u8, frameProcessorTest.ts:315-321);
    # integers <= 255 are exact in bf16, halving the kernel's VMEM
    guide = jnp.floor(guide + 0.5).astype(jnp.bfloat16)

    plane = pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(s,),
        in_specs=[plane, plane, plane, plane, plane],
        out_specs=plane,
    )

    kwargs = {}
    if not interpret:
        # streams are independent -> the grid dim is parallel; raising the
        # scoped-vmem budget past the 16M default lets the pipeliner
        # double-buffer freely (measured 5.8 -> 4.4 ms at S=64)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    return pl.pallas_call(
        _refine_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, h, w), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(
        jnp.asarray(knobs_low, jnp.float32),
        jnp.asarray(knobs_high, jnp.float32),
        jnp.asarray(knobs_gamma, jnp.float32),
        jnp.asarray(knobs_use_bilateral, jnp.int32),
        jnp.asarray(knobs_ss, jnp.float32),
        jnp.asarray(knobs_sr, jnp.float32),
        jnp.asarray(has_prior, jnp.int32),
        alpha.astype(jnp.float32),
        guide[..., 0],
        guide[..., 1],
        guide[..., 2],
        prior.astype(jnp.float32),
    )


def fused_temporal_refine(
    alpha_raw: jnp.ndarray,  # [S, H, W] raw model alpha
    prev_alpha: jnp.ndarray,  # [S, H, W] EMA accumulator
    affine: jnp.ndarray,  # [S, 6] mask-space affine (scale+translate used)
    use_warp: jnp.ndarray,  # [S] bool (has_affine & initialized)
    initialized: jnp.ndarray,  # [S] bool
    warp_blend: float,
    guide: jnp.ndarray,  # [S, H, W, 3] 0..255, or [S, 3, H, W] u8 planar
    prior: jnp.ndarray,
    knobs_ema: jnp.ndarray,
    knobs_low: jnp.ndarray,
    knobs_high: jnp.ndarray,
    knobs_gamma: jnp.ndarray,
    knobs_use_bilateral: jnp.ndarray,
    knobs_ss: jnp.ndarray,
    knobs_sr: jnp.ndarray,
    has_prior: jnp.ndarray,
    knobs_ema_adapt: jnp.ndarray | None = None,
    interpret: bool | None = None,
    guide_planar: bool = False,
    debug: tuple = (),
    prior_params: jnp.ndarray | None = None,
    alpha_lowres_hw: tuple[int, int] | None = None,
    guide_lanes_geom: tuple[int, int] | None = None,
    out_dtype=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stages 3-9 in one kernel.  Returns (new_prev, refined_alpha).

    debug: bench-only in-kernel truncation tokens ('no_morph',
    'no_bilateral') for stage attribution -- never set in production.

    prior_params: optional [S, 4] (cx, cy, rx, ry) mask-space ellipse
    scalars (ops/prior.py::face_prior_params).  When given, ``prior`` is
    IGNORED and the soft ellipse is rasterized inside the kernel -- the
    full prior plane never exists in HBM.

    The warp is the separable (scale+translate) fast path, computed as
    one-hot selection matmuls inside the kernel; index vectors are
    prepared here exactly as ops.warp_affine_separable (JS Math.round,
    out-of-range -> zero fill via all-zero one-hot rows).

    guide_planar=True takes the guide as channel-leading u8 planes
    ([S, 3, H, W], guide_from_s2d(planar=True)): 1 byte/px of guide
    HBM traffic instead of 2, zero channel-minormost u8 relayout, and
    the u8->bf16 convert happens in VMEM (identical numerics: u8 values
    are exact in bf16).

    alpha_lowres_hw=(H, W) (requires prior_params): ``alpha_raw`` is the
    HEAD-GRID logit plane [S, h0, w0] (models/quantized.py
    'alpha_logit_lr'); the bilinear x(H/h0) upsample + sigmoid run in
    VMEM with the same taps/precision as the XLA path
    (resize_bilinear_mxu(method='half_pixel', DEFAULT) + sigmoid), so
    the [S, H, W] f32 alpha_raw never exists in HBM.

    guide_lanes_geom=(fy, fx) (requires prior_params): ``guide`` is the
    raw gathered lane tensor [nl, S, hp, wp] u8
    (ops/layout.py::guide_lanes_s2d); the (fy, fx) interleave unfold
    runs in VMEM (_guide_from_lanes), so the planar guide reassembly
    relayout never exists in HBM.

    out_dtype: dtype of the REFINED alpha output (default f32; bf16
    halves its HBM write + the composite's read -- the composite dot
    reads it as bf16 anyway).  new_prev (the EMA accumulator state)
    always stays f32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lowres = alpha_lowres_hw is not None
    lanes = guide_lanes_geom is not None
    if (lowres or lanes) and prior_params is None:
        raise ValueError(
            "alpha_lowres_hw/guide_lanes_geom require prior_params "
            "(the analytic-prior fast kernel)"
        )
    if lowres:
        s, h0, w0 = alpha_raw.shape
        h, w = alpha_lowres_hw
    else:
        s, h, w = alpha_raw.shape
    if lanes:
        g0 = g1 = g2 = None
    elif guide_planar:
        g0, g1, g2 = guide[:, 0], guide[:, 1], guide[:, 2]
    else:
        guide = jnp.floor(guide + 0.5).astype(jnp.bfloat16)
        g0, g1, g2 = guide[..., 0], guide[..., 1], guide[..., 2]

    from video_stream_segmenetation_tpu.ops.warp import invert_affine

    inv = invert_affine(affine)
    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    sy = inv[..., 4:5] * y + inv[..., 5:6]  # [S, H]
    sx = inv[..., 0:1] * x + inv[..., 2:3]  # [S, W]
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.where((yi >= 0) & (yi < h), yi, -1)
    xi = jnp.where((xi >= 0) & (xi < w), xi, -1)
    # pack into a lane-aligned aux plane: [S, 8, W] (row 0: yi padded,
    # row 1: xi); W >= H for all supported geometries
    assert w >= h, "mask geometry must have W >= H for the index pack"
    aux = jnp.zeros((s, 8, w), jnp.int32)
    aux = aux.at[:, 0, :h].set(yi)
    aux = aux.at[:, 1, :].set(xi)

    plane = pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0))
    idx_spec = pl.BlockSpec((1, 8, w), lambda i, *_: (i, 0, 0))
    analytic = prior_params is not None
    fast = lowres or lanes
    if fast:
        alpha_spec = (
            pl.BlockSpec((1, h0, w0), lambda i, *_: (i, 0, 0))
            if lowres
            else plane
        )
        in_specs = [alpha_spec, plane, idx_spec]
        if lowres:
            in_specs += [
                pl.BlockSpec((h, h0), lambda i, *_: (0, 0)),
                pl.BlockSpec((w0, w), lambda i, *_: (0, 0)),
            ]
        if lanes:
            nl = guide.shape[0]
            hp, wp = guide.shape[2], guide.shape[3]
            in_specs.append(
                pl.BlockSpec((nl, 1, hp, wp), lambda i, *_: (0, i, 0, 0))
            )
        else:
            in_specs += [plane, plane, plane]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=16,
            grid=(s,),
            in_specs=in_specs,
            out_specs=[plane, plane],
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=16 if analytic else 12,
            grid=(s,),
            in_specs=(
                [plane, plane, idx_spec, plane, plane, plane]
                + ([] if analytic else [plane])
            ),
            out_specs=[plane, plane],
        )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        )
    scalars = [
        jnp.asarray(knobs_low, jnp.float32),
        jnp.asarray(knobs_high, jnp.float32),
        jnp.asarray(knobs_gamma, jnp.float32),
        jnp.asarray(knobs_use_bilateral, jnp.int32),
        jnp.asarray(knobs_ss, jnp.float32),
        jnp.asarray(knobs_sr, jnp.float32),
        jnp.asarray(has_prior, jnp.int32),
        jnp.asarray(knobs_ema, jnp.float32),
        (
            jnp.zeros((s,), jnp.float32)
            if knobs_ema_adapt is None
            else jnp.asarray(knobs_ema_adapt, jnp.float32)
        ),
        jnp.asarray(use_warp, jnp.int32),
        jnp.asarray(initialized, jnp.int32),
        jnp.full((s,), warp_blend, jnp.float32),
    ]
    if analytic:
        pp = jnp.asarray(prior_params, jnp.float32)
        scalars += [pp[:, 0], pp[:, 1], pp[:, 2], pp[:, 3]]
    tensors = [
        alpha_raw.astype(jnp.float32),
        prev_alpha.astype(jnp.float32),
        aux,
    ]
    if fast:
        if lowres:
            from video_stream_segmenetation_tpu.ops.resize import (
                _interp_matrix,
            )

            tensors += [
                jnp.asarray(
                    _interp_matrix(h, h0, "half_pixel"), jnp.float32
                ),
                jnp.asarray(
                    _interp_matrix(w, w0, "half_pixel"), jnp.float32
                ).T,
            ]
        if lanes:
            tensors.append(guide)  # [nl, S, hp, wp] u8
        else:
            tensors += [g0, g1, g2]
        kernel_fn = functools.partial(
            _temporal_refine_kernel_fast,
            lowres=lowres,
            lanes=tuple(guide_lanes_geom) if lanes else None,
        )
    else:
        tensors += [g0, g1, g2]
        if not analytic:
            tensors.append(prior.astype(jnp.float32))
        kernel_fn = (
            _temporal_refine_kernel_analytic if analytic
            else _temporal_refine_kernel
        )
    new_prev, refined = pl.pallas_call(
        functools.partial(kernel_fn, debug=tuple(debug)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, h, w), jnp.float32),
            jax.ShapeDtypeStruct(
                (s, h, w), jnp.float32 if out_dtype is None else out_dtype
            ),
        ],
        interpret=interpret,
        **kwargs,
    )(*scalars, *tensors)
    return new_prev, refined
