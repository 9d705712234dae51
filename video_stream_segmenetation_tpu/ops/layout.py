"""Space-to-depth frame layout (the TPU-first ingestion format).

The MatteNetHD stem is a ``k x k`` stride-``k`` conv on uint8 720p frames
-- i.e. a non-overlapping patch extraction followed by a ``[k*k*3, C]``
matmul.  Feeding the natural ``[S, H, W, 3]`` layout makes XLA pay ~4 ms
per 64-stream batch in pure byte shuffling (im2col / padded-lane
transposes measured via tools/bench_stem.py); feeding patches
``[S, H/k, W/k, k*k*3]`` turns the stem into a single dense matmul
(5.4 ms -> 1.5 ms at S=64 on v5e).

The permutation itself is free on the host: the native ingestion stage
(native/framebuf.cpp) already touches every byte converting I420 -> RGB,
so it simply *writes* batch frames in patch order (`vst_pack_rgb_s2d`).
Device-side equivalents here are used by tests, by the CPU demo path, and
to reconstruct the natural layout where the pipeline still needs it
(composite, face crops).

Patch vector order is ``(dy, dx, c)`` row-major -- exactly the HWIO
reshape of the conv kernel, so weights stay checkpoint-compatible
(models/backbones.py::PatchifiedConv).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from video_stream_segmenetation_tpu.ops.resize import (
    Method,
    _interp_matrix,
    _nearest_taps,
)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """``[..., H, W, C] -> [..., H/b, W/b, b*b*C]``, patch order (dy,dx,c)."""
    *lead, h, w, c = x.shape
    b = block
    if h % b or w % b:
        raise ValueError(f"space_to_depth: {h}x{w} not divisible by {b}")
    x = x.reshape(*lead, h // b, b, w // b, b, c)
    nd = len(lead)
    x = x.transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.reshape(*lead, h // b, w // b, b * b * c)


def depth_to_space(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *lead, hp, wp, cc = x.shape
    b = block
    c = cc // (b * b)
    if cc != b * b * c:
        raise ValueError(f"depth_to_space: channel dim {cc} not {b}*{b}*c")
    x = x.reshape(*lead, hp, wp, b, b, c)
    nd = len(lead)
    x = x.transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.reshape(*lead, hp * b, wp * b, c)


def _lane_select_u8(xp: jnp.ndarray, sel: "np.ndarray") -> jnp.ndarray:
    """Static lane gather ``xp[..., sel]`` for u8 inputs, lowered as a
    one-hot bf16 matmul.  XLA lowers a small static ``jnp.take`` on the
    minormost axis to a SEQUENTIAL len(sel)-iteration while loop on TPU
    (observed in the compiled serving step: 48 serialized slice kernels);
    the MXU one-hot dot reads the operand once instead.  Exact: u8 values
    are integers <= 255 (exact in bf16) and each output column has a
    single 1 -- no rounding, no accumulation."""
    onehot = np.zeros((xp.shape[-1], len(sel)), np.float32)
    onehot[np.asarray(sel), np.arange(len(sel))] = 1.0
    y = jax.lax.dot_general(
        xp.astype(jnp.bfloat16),
        jnp.asarray(onehot, jnp.bfloat16),
        (((xp.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    return y.astype(jnp.uint8)


def guide_s2d_sel(
    frame_hw: tuple[int, int],
    out_hw: tuple[int, int],
    block: int,
    channels: int = 3,
    method: Method = "half_pixel",
    planar: bool = False,
):
    """Static lane-tap indices for :func:`guide_from_s2d`, or ``None``
    when the geometry does not decompose per-patch (callers must fall
    back to the generic resize).  Exposed so the serving pipeline can
    ride the taps on the matting stem matmul as extra one-hot columns
    (models/quantized.py ``stem_aux_cols``) -- the packed frame tensor
    is then read (and layout-converted) once instead of twice."""
    fh, fw = frame_hw
    oh, ow = out_hw
    hp, wp = fh // block, fw // block
    if (oh % hp) or (ow % wp):
        raise ValueError(f"guide_from_s2d: {out_hw} not a multiple of {(hp, wp)}")
    fy, fx = oh // hp, ow // wp

    iy = _nearest_taps(oh, fh, method)
    ix = _nearest_taps(ow, fw, method)
    # taps must decompose as (patch row i, fixed per-parity offset)
    offs_y = iy % block
    offs_x = ix % block
    ok_y = np.array_equal(iy // block, np.repeat(np.arange(hp), fy))
    ok_x = np.array_equal(ix // block, np.repeat(np.arange(wp), fx))
    per_y = np.array_equal(offs_y, np.tile(offs_y[:fy], hp))
    per_x = np.array_equal(offs_x, np.tile(offs_x[:fx], wp))
    if not (ok_y and ok_x and per_y and per_x):
        return None
    if planar:
        # c-major lane order so the post-gather permute never touches
        # a minormost channel axis
        return (
            np.arange(channels)[:, None, None]
            + (offs_y[None, :fy, None] * block + offs_x[None, None, :fx])
            * channels
        ).reshape(-1)
    return (
        (offs_y[:fy, None, None] * block + offs_x[None, :fx, None]) * channels
        + np.arange(channels)[None, None, :]
    ).reshape(-1)


def guide_from_gathered(
    g: jnp.ndarray,
    frame_hw: tuple[int, int],
    out_hw: tuple[int, int],
    block: int,
    channels: int = 3,
    planar: bool = False,
) -> jnp.ndarray:
    """Reassemble the :func:`guide_s2d_sel`-gathered lanes
    ``[..., hp, wp, len(sel)]`` into the guide image (``[..., C, oh, ow]``
    planar / ``[..., oh, ow, C]`` natural)."""
    fh, fw = frame_hw
    oh, ow = out_hw
    hp, wp = fh // block, fw // block
    fy, fx = oh // hp, ow // wp
    *lead, _, _, _ = g.shape
    nd = len(lead)
    if planar:
        g = g.reshape(*lead, hp, wp, channels, fy, fx)
        g = g.transpose(*range(nd), nd + 2, nd, nd + 3, nd + 1, nd + 4)
        return g.reshape(*lead, channels, oh, ow)
    g = g.reshape(*lead, hp, wp, fy, fx, channels)
    g = g.transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return g.reshape(*lead, oh, ow, channels)


def guide_from_s2d(
    xp: jnp.ndarray,
    frame_hw: tuple[int, int],
    out_hw: tuple[int, int],
    block: int,
    channels: int = 3,
    method: Method = "half_pixel",
    planar: bool = False,
) -> jnp.ndarray:
    """Nearest-neighbor resize of an s2d-packed frame, by lane selection.

    Equivalent to ``resize_nearest(depth_to_space(xp, block), out_hw,
    method)`` (the reference's guide resample, sampleGuidePixels,
    client/src/core/frameProcessorTest.ts:315-321), but exploits that the
    nearest taps land on a per-patch-periodic offset pattern: the resize
    becomes a static gather of ``f*f*C`` of the ``block*block*C`` patch
    lanes (f = out/ patches per axis), with no full-res reconstruction.

    ``planar=True`` returns ``[..., C, oh, ow]`` (channel-leading): the
    lane axis stays wide for downstream planar math (no channel-minormost
    relayout; see multiclass_composite_s2d).
    """
    sel = guide_s2d_sel(frame_hw, out_hw, block, channels, method, planar)
    if sel is None:
        # fall back to the generic path for odd geometries
        g = _fallback_guide(xp, block, out_hw, method)
        if planar:
            g = jnp.moveaxis(g, -1, -3)
        return g
    g = _lane_select_u8(xp, sel)  # [..., hp, wp, len(sel)]
    return guide_from_gathered(g, frame_hw, out_hw, block, channels, planar)


def guide_lanes_s2d(
    xp: jnp.ndarray,
    frame_hw: tuple[int, int],
    out_hw: tuple[int, int],
    block: int,
    channels: int = 3,
    method: Method = "half_pixel",
):
    """Raw gathered guide lanes ``[nl, S, hp, wp]`` u8 (+ the (fy, fx)
    interleave geometry), for in-kernel unfolding.

    Same one-hot MXU gather as :func:`guide_from_s2d` (planar tap order),
    but the (fy, fx) spatial interleave is NOT applied: the fused refine
    kernel unfolds the lanes in VMEM (kernels/refine_fused.py::
    _guide_from_lanes), so the planar guide plane -- and the XLA
    reassembly relayout of :func:`guide_from_gathered` -- never exist in
    HBM.  Lane k = (c*fy + yy)*fx + xx holds guide pixel
    (fy*i + yy, fx*j + xx) at patch (i, j).  Returns ``None`` when the
    geometry does not decompose per-patch (callers fall back to
    :func:`guide_from_s2d`).
    """
    sel = guide_s2d_sel(frame_hw, out_hw, block, channels, method, planar=True)
    if sel is None:
        return None
    hp, wp = frame_hw[0] // block, frame_hw[1] // block
    fy, fx = out_hw[0] // hp, out_hw[1] // wp
    onehot = np.zeros((len(sel), xp.shape[-1]), np.float32)
    onehot[np.arange(len(sel)), np.asarray(sel)] = 1.0
    gl = jax.lax.dot_general(
        jnp.asarray(onehot, jnp.bfloat16),
        xp.astype(jnp.bfloat16),
        (((1,), (xp.ndim - 1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ).astype(jnp.uint8)  # [nl, S, hp, wp]
    return gl, (fy, fx)


def _fallback_guide(xp, block, out_hw, method):
    from video_stream_segmenetation_tpu.ops.resize import resize_nearest

    return resize_nearest(depth_to_space(xp, block), out_hw, method=method)


def packed_color(color_f32, block: int) -> jnp.ndarray:
    """Solid RGB color (floats 0..1) as one packed-layout patch vector
    ``[block*block*3]`` uint8."""
    c_u8 = jnp.clip(
        jnp.floor(jnp.asarray(color_f32, jnp.float32) * 255.0 + 0.5), 0, 255
    ).astype(jnp.uint8)
    return jnp.tile(c_u8, block * block)


def alpha_composite_s2d(
    frame_p: jnp.ndarray,
    alpha: jnp.ndarray,
    bg_p: jnp.ndarray,
    frame_hw: tuple[int, int],
    block: int,
    method: Method = "half_pixel",
    precision=None,
    impl: str = "per_dy",
    s_chunk: int | None = None,
) -> jnp.ndarray:
    """Upsample + composite entirely in the packed layout -- no transposes.

    Semantics match ``upsample_alpha`` (mxu taps, clamp) + ``alpha_composite``
    (out = frame*a + bg*(1-a), Math.round u8 store) on the natural layout
    (the reference's drawImage upscale + 'destination-in' + CSS stack,
    client/src/core/frameProcessorTest.ts:169-178), but the frame/background
    ride as s2d patches: reconstructing the natural uint8 layout on device
    costs ~27 ms/64-stream batch in XLA byte shuffling, while this
    formulation needs only matmuls and lane-sliced elementwise math:

      C     = Ah_dymajor @ alpha                  [S, b*HP, mw]  (1 matmul)
      a_dy  = C[:, dy*HP:(dy+1)*HP] @ Aw^T        [S, HP, FW]    (b matmuls)
      out[..., 3*b*dy + 3*dx + c] = a_dy * frame + (1-a_dy) * bg  (fused)

    Pass order matters for HBM traffic: the b per-dy matmuls re-read their
    stationary operand b times, so the hoisted single pass must be the one
    whose output is SMALL per dy.  H-pass-first makes each per-dy read a
    ``[S, HP, mw]`` slice (4.7 MB at S=64), where the older W-pass-first
    form re-read the full ``[S, mh, FW]`` bmat (47 MB) in every dy matmul
    -- ~0.4 GB/step of extra reads (measured 1.96 -> see RESULTS.md).

    frame_p/bg_p: ``[S, H/b, W/b, b*b*3]`` uint8.  alpha: ``[S, mh, mw]``.
    Returns the packed uint8 composite (the native output stage unpacks
    host-side while encoding, native/framebuf.cpp).
    """
    import jax

    # Stream-axis chunking (s_chunk): above ~64 streams XLA's emitter for
    # the dot30 blend ("EmitAllBatchInSublanes") stops reading the packed
    # u8 operands in their native {2,3,1,0} layout and inserts full
    # {2,0,3,1} relayout copies of BOTH frame_p and bg_p (337.5 MB each
    # at S=128 -- the whole S=128 per-stream degradation in the 2026-08-19
    # HLO census).  Composing in <= s_chunk slices keeps every dot at the
    # copy-free S<=64 shape; pure stream slicing, bit-identical output.
    if s_chunk and frame_p.shape[0] > s_chunk:
        outs = []
        for lo in range(0, frame_p.shape[0], s_chunk):
            hi = min(lo + s_chunk, frame_p.shape[0])
            outs.append(
                alpha_composite_s2d(
                    frame_p[lo:hi], alpha[lo:hi],
                    bg_p[lo:hi] if bg_p.shape[0] == frame_p.shape[0] else bg_p,
                    frame_hw, block, method=method, precision=precision,
                    impl=impl, s_chunk=None,
                )
            )
        return jnp.concatenate(outs, axis=0)

    fh, fw = frame_hw
    b = block
    hp, wp = fh // b, fw // b
    prec = jax.lax.Precision.DEFAULT if precision is None else precision
    dt = jnp.bfloat16 if prec == jax.lax.Precision.DEFAULT else jnp.float32

    a_h = _interp_matrix(fh, alpha.shape[-2], method)  # [fh, mh]
    a_w = jnp.asarray(_interp_matrix(fw, alpha.shape[-1], method), dt)  # [fw, mw]
    # dy-major row stacking: hstack[dy*hp + i] = a_h[i*b + dy]
    hstack = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(a_h).reshape(hp, b, -1).transpose(1, 0, 2)
        ).reshape(b * hp, -1),
        dt,
    )
    cmat = jnp.einsum(
        "im,smw->siw", hstack, alpha.astype(dt), precision=prec
    )  # [S, b*hp, mw]

    # NOTE: the b per-dy matmuls are deliberate.  A single stacked
    # [b*hp, mh] @ [mh, fw] matmul would read its inputs once -- but its
    # [S, fh, fw] output MATERIALIZES (236 MB f32 at S=64), where the
    # per-dy form fuses each a_dy straight into the blend epilogue;
    # measured 3.86 vs 2.10 ms for the composite at S=64 (2026-08-17).
    #
    # impl='dot30' (the TPU default via PipelineStatics): the per-dy
    # 'per_dy' form still pays a hidden relayout tax -- its [S, hp, fw]
    # matmul output must be re-split into (wp, b) lanes and broadcast
    # over c, and XLA materializes that as f32 copies (~700 MB/step at
    # S=64; tools/inspect_step_hlo.py census: 10x f32[64,72,1280]
    # fusion+copy + 10x relayout copy).  dot30 instead bakes the (j,dx)
    # packing AND the c-triplication into the weight matrix, so the dot
    # emits the blend-ready [S, hp, wp, 3b] tensor directly and the u8
    # blend fuses as the dot's epilogue -- 3x the MACs, zero relayout.
    if impl == "dot30":
        # aw30[j, 3*dx+c, w] = a_w[j*b+dx, w]
        aw30 = jnp.broadcast_to(
            a_w.reshape(wp, b, 1, -1), (wp, b, 3, a_w.shape[-1])
        ).reshape(wp, 3 * b, -1)
        out_slices = []
        for dy in range(b):
            a3 = jnp.einsum(
                "siw,jlw->sijl", cmat[:, dy * hp : (dy + 1) * hp], aw30,
                precision=prec,
            )
            a3 = jnp.clip(a3.astype(jnp.float32), 0.0, 1.0)
            f_sl = frame_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(
                jnp.float32
            )
            bg_sl = bg_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(
                jnp.float32
            )
            blend = f_sl * a3 + bg_sl * (1.0 - a3)
            out_slices.append(
                jnp.clip(jnp.floor(blend + 0.5), 0, 255).astype(jnp.uint8)
            )
        return jnp.concatenate(out_slices, axis=-1)

    out_slices = []
    for dy in range(b):
        a_dy = jnp.einsum(
            "siw,xw->six", cmat[:, dy * hp : (dy + 1) * hp], a_w,
            precision=prec,
        )
        a_dy = jnp.clip(a_dy.astype(jnp.float32), 0.0, 1.0)
        s = a_dy.shape[0]
        a3 = jnp.broadcast_to(
            a_dy.reshape(s, hp, wp, b, 1), (s, hp, wp, b, 3)
        ).reshape(s, hp, wp, 3 * b)
        f_sl = frame_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(jnp.float32)
        bg_sl = bg_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(jnp.float32)
        blend = f_sl * a3 + bg_sl * (1.0 - a3)
        out_slices.append(
            jnp.clip(jnp.floor(blend + 0.5), 0, 255).astype(jnp.uint8)
        )
    return jnp.concatenate(out_slices, axis=-1)




def multiclass_composite_s2d(
    frame_p: jnp.ndarray,
    class_alpha: jnp.ndarray,
    effects,
    frame_hw: tuple[int, int],
    block: int,
    method: Method = "half_pixel",
    precision=None,
    blur_sigma_frame: float | None = None,
    assume_simplex: bool = False,
) -> jnp.ndarray:
    """Per-class-effect composite entirely in the packed layout.

    The multiclass generalization of :func:`alpha_composite_s2d` (BASELINE
    config 5: K class maps, one effect layer per class).  Every effect
    layer is affine in (frame, blurred-frame, constant):

        layer_k = alpha_k * frame + beta_k * blurred + c_k

    (keep: alpha=1 | tint s: alpha=1-s, c=s*tint | color: c=color |
    blur: beta=1), so the whole blend collapses to TWO fields:

        out = up(w_f) * frame + up(R)
        w_f = sum_k alpha_k a_k                    [S, mh, mw]
        R   = blurred * sum_k beta_k a_k + sum_k c_k a_k   [S, mh, mw, 3]

    with a_k the (re-normalized) class simplex at class-map resolution and
    ``up`` the separable interp-matmul upsample.  **Semantics**: all
    non-frame contributions (blurred background, tints, colors) are
    composited at class-map resolution and upsampled once -- the
    downscale-blend-upscale serving approximation (they are low-frequency
    by construction; only the live frame term is blended at full
    resolution).  Blur uses the nearest-gathered guide
    (:func:`guide_from_s2d`) with sigma scaled by mh/fh.  Pinned by the
    natural-layout oracle in tests/test_multiclass_fast.py.

    TPU layout notes: the packed output wants (dx, c)-interleaved lanes;
    a post-hoc transpose of an [S, 3, H, W] upsample is a lane relayout
    that measured ~8 ms at S=64 -- instead R's W-pass uses the
    channel-interleaved Kronecker matrix A_w (x) I_3 (built in-graph from
    the small A_w), so every matmul output is already in packed lane
    order and no transpose ever happens.

    effects: list of K dicts -- {"keep"}, {"color": rgb}, {"tint": rgb,
    "strength": s}, {"blur": sigma}.

    frame_p ``[S, H/b, W/b, b*b*3]`` uint8; class_alpha ``[S, mh, mw, K]``.
    Returns the packed uint8 composite.
    """
    import jax

    fh, fw = frame_hw
    b = block
    hp, wp = fh // b, fw // b
    mh, mw = class_alpha.shape[-3], class_alpha.shape[-2]
    k = class_alpha.shape[-1]
    if len(effects) != k:
        raise ValueError(f"need {k} effects, got {len(effects)}")
    prec = jax.lax.Precision.DEFAULT if precision is None else precision
    dt = jnp.bfloat16 if prec == jax.lax.Precision.DEFAULT else jnp.float32
    s = frame_p.shape[0]

    # effect algebra: layer_k = alpha_w[k]*frame + beta_w[k]*blurred + cmat[k]
    alpha_w = np.zeros((k,), np.float32)
    beta_w = np.zeros((k,), np.float32)
    cmat = np.zeros((k, 3), np.float32)
    need_blur = False
    for ci, eff in enumerate(effects):
        if eff.get("keep"):
            alpha_w[ci] = 1.0
        elif "color" in eff:
            cmat[ci] = np.asarray(eff["color"], np.float32) * 255.0
        elif "blur" in eff:
            beta_w[ci] = 1.0
            need_blur = True
        elif "tint" in eff:
            st = float(eff.get("strength", 0.5))
            alpha_w[ci] = 1.0 - st
            cmat[ci] = np.asarray(eff["tint"], np.float32) * 255.0 * st
        else:
            raise ValueError(f"unknown effect: {eff}")

    # re-normalize the simplex at class-map resolution (cheap); the
    # upsample preserves it exactly (bilinear rows are convex), so no
    # full-resolution division is ever needed.  assume_simplex=True skips
    # even that (the pipeline renormalizes after the temporal EMA,
    # runtime/pipeline.py::make_multiclass_step).
    ca = class_alpha.astype(jnp.float32)
    if not assume_simplex:
        ca = ca / jnp.maximum(ca.sum(-1, keepdims=True), 1e-6)

    # planar K-contractions: one pass over ca, channel-LEADING outputs
    # (the lane axis stays mw-wide; a channel-minormost [.., mh, mw, 3]
    # intermediate would tile 3 lanes of 128 on TPU)
    coef = np.concatenate(
        [alpha_w[:, None], beta_w[:, None], cmat], axis=1
    )  # [K, 5] -> (w_f, w_b, c_r, c_g, c_b)
    planes = jnp.einsum(
        "smwk,kp->spmw", ca, jnp.asarray(coef),
        precision=jax.lax.Precision.HIGHEST,
    )                                                         # [S, 5, mh, mw]
    w_f = planes[:, 0]
    rgb = planes[:, 2:5]                                      # [S, 3, mh, mw]
    if need_blur:
        from video_stream_segmenetation_tpu.ops.blur import (
            gaussian_blur_planar_mxu,
        )

        guide = guide_from_s2d(
            frame_p, frame_hw, (mh, mw), b, method=method, planar=True
        ).astype(jnp.float32) / 255.0                         # [S, 3, mh, mw]
        sigma = float(next(e["blur"] for e in effects if "blur" in e))
        if blur_sigma_frame is not None:
            sigma = float(blur_sigma_frame)
        sigma_small = max(sigma * mh / fh, 0.5)
        blurred = jnp.clip(
            gaussian_blur_planar_mxu(guide, sigma_small, precision=prec),
            0.0, 1.0,
        )                                                     # [S, 3, mh, mw]
        rgb = rgb + blurred * 255.0 * planes[:, 1:2]

    a_h = _interp_matrix(fh, mh, method)                      # [fh, mh]
    a_w_m = jnp.asarray(_interp_matrix(fw, mw, method), dt)   # [fw, mw]
    # rows grouped dy-major (row (dy, i) = a_h[i*b + dy]) for the
    # ALREADY-MATERIALIZED hmat_r intermediate: per-dy consumers then
    # read contiguous row blocks instead of strided dy::b slices.  (The
    # w_f H-pass stays per-dy: stacking it would materialize a full-res
    # plane the per-dy form fuses into the blend -- see the note in
    # alpha_composite_s2d.)
    a_h_perm = np.concatenate([a_h[dy::b] for dy in range(b)], axis=0)

    # scalar w_f plane: H pass first (dy-major rows), so each per-dy W
    # matmul below reads only its own [S, hp, mw] slice -- see the
    # traffic note in alpha_composite_s2d
    cmat_f = jnp.einsum(
        "rm,smw->srw", jnp.asarray(a_h_perm, dt), w_f.astype(dt),
        precision=prec,
    )                                                         # [S, b*hp, mw]

    # RGB field, H-pass FIRST with the channels concatenated on the lane
    # axis c-major ([S, mh, 3*mw] -- a cheap planar concat, never a
    # channel-minormost interleave), rows dy-major so the per-slice
    # re-reads hit contiguous row blocks of one [S, fh, 3*mw]
    # intermediate.  The W-pass per slice uses the c-major Kronecker
    # matrix (I_3 (x) A_w rows, built in-graph from a_w_m) whose OUTPUT
    # lane axis is already X = (wp*b + dx)*3 + c -- packed order, no
    # transpose ever happens.
    rgb_cat = jnp.concatenate(
        [rgb[:, c].astype(dt) for c in range(3)], axis=-1
    )                                                         # [S, mh, 3*mw]
    hmat_r = jnp.einsum(
        "rm,smq->srq", jnp.asarray(a_h_perm, dt), rgb_cat, precision=prec
    )                                                         # [S, b*hp(dy-major), 3*mw]
    # kron[X=(x, cx), q=(cq, w)] = a_w[x, w] * delta(cx, cq)
    kron = (
        a_w_m[:, None, None, :] * jnp.eye(3, dtype=dt)[None, :, :, None]
    ).reshape(fw * 3, 3 * mw)

    out_slices = []
    for dy in range(b):
        wf_sl = jnp.einsum(
            "siw,xw->six", cmat_f[:, dy * hp : (dy + 1) * hp], a_w_m,
            precision=prec,
        ).astype(jnp.float32)                                 # [S, hp, fw]
        r_sl = jnp.einsum(
            "Xq,siq->siX", kron, hmat_r[:, dy * hp : (dy + 1) * hp],
            precision=prec,
        ).astype(jnp.float32)                                 # [S, hp, fw*3]
        wf3 = jnp.broadcast_to(
            wf_sl.reshape(s, hp, wp, b, 1), (s, hp, wp, b, 3)
        ).reshape(s, hp, wp, 3 * b)
        f_sl = frame_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(jnp.float32)
        # fw*3 index = (wp_idx*b + dx)*3 + c -> reshape splits straight
        # into the packed (dx, c) lane order; no transpose
        acc = f_sl * wf3 + r_sl.reshape(s, hp, wp, 3 * b)
        out_slices.append(
            jnp.clip(jnp.floor(acc + 0.5), 0, 255).astype(jnp.uint8)
        )
    return jnp.concatenate(out_slices, axis=-1)
