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


def guide_from_s2d(
    xp: jnp.ndarray,
    frame_hw: tuple[int, int],
    out_hw: tuple[int, int],
    block: int,
    channels: int = 3,
    method: Method = "half_pixel",
) -> jnp.ndarray:
    """Nearest-neighbor resize of an s2d-packed frame, by lane selection.

    Equivalent to ``resize_nearest(depth_to_space(xp, block), out_hw,
    method)`` (the reference's guide resample, sampleGuidePixels,
    client/src/core/frameProcessorTest.ts:315-321), but exploits that the
    nearest taps land on a per-patch-periodic offset pattern: the resize
    becomes a static gather of ``f*f*C`` of the ``block*block*C`` patch
    lanes (f = out/ patches per axis), with no full-res reconstruction.
    """
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
        # fall back to the generic path for odd geometries
        return _fallback_guide(xp, block, out_hw, method)

    sel = (
        (offs_y[:fy, None, None] * block + offs_x[None, :fx, None]) * channels
        + np.arange(channels)[None, None, :]
    ).reshape(-1)
    g = jnp.take(xp, jnp.asarray(sel), axis=-1)  # [..., hp, wp, fy*fx*C]
    *lead, _, _, _ = g.shape
    nd = len(lead)
    g = g.reshape(*lead, hp, wp, fy, fx, channels)
    g = g.transpose(*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return g.reshape(*lead, oh, ow, channels)


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
) -> jnp.ndarray:
    """Upsample + composite entirely in the packed layout -- no transposes.

    Semantics match ``upsample_alpha`` (mxu taps, clamp) + ``alpha_composite``
    (out = frame*a + bg*(1-a), Math.round u8 store) on the natural layout
    (the reference's drawImage upscale + 'destination-in' + CSS stack,
    client/src/core/frameProcessorTest.ts:169-178), but the frame/background
    ride as s2d patches: reconstructing the natural uint8 layout on device
    costs ~27 ms/64-stream batch in XLA byte shuffling, while this
    formulation needs only matmuls and lane-sliced elementwise math:

      B     = alpha @ Aw^T                        [S, mh, FW]   (1 matmul)
      a_dy  = Ah[dy::b] @ B                       [S, HP, FW]   (b matmuls)
      out[..., 3*b*dy + 3*dx + c] = a_dy * frame + (1-a_dy) * bg  (fused)

    frame_p/bg_p: ``[S, H/b, W/b, b*b*3]`` uint8.  alpha: ``[S, mh, mw]``.
    Returns the packed uint8 composite (the native output stage unpacks
    host-side while encoding, native/framebuf.cpp).
    """
    import jax

    fh, fw = frame_hw
    b = block
    hp, wp = fh // b, fw // b
    prec = jax.lax.Precision.DEFAULT if precision is None else precision
    dt = jnp.bfloat16 if prec == jax.lax.Precision.DEFAULT else jnp.float32

    a_h = _interp_matrix(fh, alpha.shape[-2], method)  # [fh, mh]
    a_w = jnp.asarray(_interp_matrix(fw, alpha.shape[-1], method), dt)  # [fw, mw]
    bmat = jnp.einsum(
        "xw,smw->smx", a_w, alpha.astype(dt), precision=prec
    )  # [S, mh, fw]

    out_slices = []
    for dy in range(b):
        v = jnp.asarray(a_h[dy::b], dt)  # [hp, mh]
        a_dy = jnp.einsum("im,smx->six", v, bmat, precision=prec)
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
) -> jnp.ndarray:
    """Per-class-effect composite entirely in the packed layout.

    The multiclass generalization of :func:`alpha_composite_s2d` (BASELINE
    config 5: K class maps, one effect layer per class): K alpha planes are
    upsampled by the same interp-matmul scheme (the K axis rides as a
    batch dim), each class's layer is built lane-sliced, and the blend
    accumulates per packed row-parity slice -- the natural uint8 layout is
    never reconstructed on device.

    effects: list of K dicts -- {"keep"}, {"color": rgb}, {"tint": rgb,
    "strength": s}, {"blur": sigma}.  **Blur semantics**: computed at the
    class-map resolution on the nearest-gathered guide
    (:func:`guide_from_s2d`) with sigma scaled by mh/fh, then bilinearly
    upsampled -- the standard downscale-blur-upscale serving approximation
    (a full-res separable blur in packed layout would need cross-lane
    mixing; the approximation is visually identical for background blur
    and is pinned by its own oracle in tests/test_s2d.py).

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

    a_h = _interp_matrix(fh, mh, method)                      # [fh, mh]
    a_w = jnp.asarray(_interp_matrix(fw, mw, method), dt)     # [fw, mw]
    # K planes through one einsum: k rides as a batch axis
    bmat = jnp.einsum(
        "xw,smwk->skmx", a_w, class_alpha.astype(dt), precision=prec
    )  # [S, K, mh, fw]

    # blurred-guide RGB (only if some class wants blur)
    blur_bmat = None
    if any("blur" in e for e in effects):
        from video_stream_segmenetation_tpu.ops.blur import gaussian_blur_mxu

        guide = guide_from_s2d(
            frame_p, frame_hw, (mh, mw), b, method=method
        ).astype(jnp.float32) / 255.0
        sigma = float(next(e["blur"] for e in effects if "blur" in e))
        if blur_sigma_frame is not None:
            sigma = float(blur_sigma_frame)
        sigma_small = max(sigma * mh / fh, 0.5)
        blurred = gaussian_blur_mxu(guide, sigma_small)       # [S, mh, mw, 3]
        blur_bmat = jnp.einsum(
            "xw,smwc->scmx", a_w, blurred.astype(dt), precision=prec
        )  # [S, 3, mh, fw]

    out_slices = []
    for dy in range(b):
        v = jnp.asarray(a_h[dy::b], dt)                       # [hp, mh]
        a_dy = jnp.einsum("im,skmx->skix", v, bmat, precision=prec)
        a_dy = jnp.clip(a_dy.astype(jnp.float32), 0.0, 1.0)   # [S, K, hp, fw]
        # renormalize the upsampled simplex (per-class interp can break it)
        a_dy = a_dy / jnp.maximum(a_dy.sum(axis=1, keepdims=True), 1e-6)

        f_sl = frame_p[..., 3 * b * dy : 3 * b * (dy + 1)].astype(jnp.float32)
        if blur_bmat is not None:
            bl = jnp.einsum("im,scmx->scix", v, blur_bmat, precision=prec)
            bl = jnp.clip(bl.astype(jnp.float32), 0.0, 1.0) * 255.0
            # [S, 3, hp, fw] -> packed slice [S, hp, wp, 3b] (c minormost)
            bl_sl = bl.transpose(0, 2, 3, 1).reshape(s, hp, wp, 3 * b)

        acc = jnp.zeros_like(f_sl)
        for ci, eff in enumerate(effects):
            ak = a_dy[:, ci]                                   # [S, hp, fw]
            ak3 = jnp.broadcast_to(
                ak.reshape(s, hp, wp, b, 1), (s, hp, wp, b, 3)
            ).reshape(s, hp, wp, 3 * b)
            if eff.get("keep"):
                layer = f_sl
            elif "color" in eff:
                col = jnp.asarray(eff["color"], jnp.float32) * 255.0
                layer = jnp.broadcast_to(jnp.tile(col, b), f_sl.shape)
            elif "blur" in eff:
                layer = bl_sl
            elif "tint" in eff:
                st = float(eff.get("strength", 0.5))
                tint = jnp.tile(jnp.asarray(eff["tint"], jnp.float32) * 255.0, b)
                layer = f_sl * (1.0 - st) + tint * st
            else:
                raise ValueError(f"unknown effect: {eff}")
            acc = acc + layer * ak3
        out_slices.append(
            jnp.clip(jnp.floor(acc + 0.5), 0, 255).astype(jnp.uint8)
        )
    return jnp.concatenate(out_slices, axis=-1)
