"""Geometry: Procrustes similarity solve, letterboxing, box utilities.

Reference: estimateAffineFromLandmarks (client/src/core/
frameProcessorTest.ts:505-601), toSquareLetterbox (:613-642), cropFaceROI
(:451-470).
"""

from __future__ import annotations

import jax.numpy as jnp

# The 5 FaceMesh anchor landmark indices used by the reference
# (frameProcessorTest.ts:518): eye outer corners 33/263, nose tip 1, and
# points 13/14 (labeled mouth corners; actually inner-lip midpoints -- see
# SURVEY.md Appendix A -- but consistent for a similarity solve).
ANCHOR_IDXS = (33, 263, 1, 13, 14)

# Canonical face layout in normalized coords (frameProcessorTest.ts:526-532).
REF_NORM = (
    (0.35, 0.40),  # right eye
    (0.65, 0.40),  # left eye
    (0.50, 0.55),  # nose tip
    (0.58, 0.70),  # mouth right
    (0.42, 0.70),  # mouth left
)


def estimate_similarity_transform(
    dst_pts: jnp.ndarray,
    ref_pts: jnp.ndarray,
) -> jnp.ndarray:
    """2-D Procrustes/Kabsch similarity: dst ~= s R ref + t.

    Exactly the reference's solve (frameProcessorTest.ts:541-568): centroids,
    scale s = sqrt(sum|dst_c|^2 / sum|ref_c|^2), rotation theta =
    atan2(Sxy, Sxx) from the cross-covariance, then translation.

    dst_pts, ref_pts: ``[..., N, 2]``.  Returns ``[..., 6]`` affine
    (a11, a12, tx, a21, a22, ty) such that p' = A p + t maps ref -> dst.
    """
    c_ref = jnp.mean(ref_pts, axis=-2)
    c_dst = jnp.mean(dst_pts, axis=-2)
    ref_c = ref_pts - c_ref[..., None, :]
    dst_c = dst_pts - c_dst[..., None, :]

    ref_norm = jnp.sum(ref_c * ref_c, axis=(-2, -1))
    dst_norm = jnp.sum(dst_c * dst_c, axis=(-2, -1))

    sxx = jnp.sum(ref_c[..., 0] * dst_c[..., 0] + ref_c[..., 1] * dst_c[..., 1], axis=-1)
    sxy = jnp.sum(-ref_c[..., 1] * dst_c[..., 0] + ref_c[..., 0] * dst_c[..., 1], axis=-1)
    theta = jnp.arctan2(sxy, sxx)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    s = jnp.sqrt(dst_norm / jnp.maximum(ref_norm, 1e-12))

    a11 = s * cos_t
    a12 = -s * sin_t
    a21 = s * sin_t
    a22 = s * cos_t
    tx = c_dst[..., 0] - (s * (cos_t * c_ref[..., 0] - sin_t * c_ref[..., 1]))
    ty = c_dst[..., 1] - (s * (sin_t * c_ref[..., 0] + cos_t * c_ref[..., 1]))
    return jnp.stack([a11, a12, tx, a21, a22, ty], axis=-1)


def affine_video_to_mask(
    affine_v: jnp.ndarray,
    video_hw: tuple[int, int],
    mask_hw: tuple[int, int],
    mode: str = "exact",
) -> jnp.ndarray:
    """Convert an affine in video pixel coords to mask pixel coords.

    mode='exact' applies the full conjugation A_m = S A_v S^-1, t_m = S t_v
    with S = diag(sx, sy) -- the *intended* behavior.  mode='reference'
    reproduces the reference verbatim (frameProcessorTest.ts:593-600), which
    scales only tx/ty and keeps the linear part in video units (a latent
    anisotropy defect, SURVEY.md Appendix A); kept for parity testing.
    """
    vh, vw = video_hw
    mh, mw = mask_hw
    sx = mw / vw
    sy = mh / vh
    a11, a12, tx, a21, a22, ty = (affine_v[..., i] for i in range(6))
    if mode == "reference":
        return jnp.stack([a11, a12, tx * sx, a21, a22, ty * sy], axis=-1)
    if mode == "exact":
        return jnp.stack(
            [a11, a12 * (sx / sy), tx * sx, a21 * (sy / sx), a22, ty * sy],
            axis=-1,
        )
    raise ValueError(f"unknown mode: {mode}")


def affine_from_landmarks(
    points_full: jnp.ndarray,
    video_hw: tuple[int, int],
    mask_hw: tuple[int, int],
    mode: str = "exact",
) -> jnp.ndarray:
    """Full estimateAffineFromLandmarks: 468 full-frame landmark pixels ->
    mask-space affine (frameProcessorTest.ts:505-601).

    points_full: ``[..., 468, 2]`` landmark positions in video pixels
    (already ROI->full mapped).
    """
    vh, vw = video_hw
    idxs = jnp.asarray(ANCHOR_IDXS)
    dst = jnp.take(points_full, idxs, axis=-2)
    ref = jnp.asarray(
        [(x * vw, y * vh) for x, y in REF_NORM], dtype=points_full.dtype
    )
    ref = jnp.broadcast_to(ref, dst.shape)
    affine_v = estimate_similarity_transform(dst, ref)
    return affine_video_to_mask(affine_v, video_hw, mask_hw, mode=mode)


def letterbox_params(src_hw: tuple[int, int], target: int):
    """Static letterbox geometry (toSquareLetterbox,
    frameProcessorTest.ts:613-642): scale = min(t/w, t/h),
    draw = max(1, round(src*scale)), offset = floor((t - draw)/2).

    Returns (scale, draw_w, draw_h, off_x, off_y) as Python numbers.
    """
    src_h, src_w = src_hw
    scale = min(target / src_w, target / src_h)
    draw_w = max(1, round(src_w * scale))
    draw_h = max(1, round(src_h * scale))
    off_x = (target - draw_w) // 2
    off_y = (target - draw_h) // 2
    return scale, draw_w, draw_h, off_x, off_y


def letterbox_inverse_map(
    pts: jnp.ndarray, src_hw: tuple[int, int], target: int
) -> jnp.ndarray:
    """Map points from letterboxed square coords back to source pixels
    (mapFromSquareToSrc, frameProcessorTest.ts:637-640):
    src = (pt - offset) / scale.  pts: ``[..., 2]`` (x, y)."""
    scale, _, _, off_x, off_y = letterbox_params(src_hw, target)
    off = jnp.asarray([off_x, off_y], dtype=pts.dtype)
    return (pts - off) / scale


def pad_box(
    box: jnp.ndarray,
    pad_ratio: float,
    frame_hw: tuple[int, int],
) -> jnp.ndarray:
    """Expand a face box by pad_ratio per side with floor/ceil clamping and
    a min size of 1 px (cropFaceROI, frameProcessorTest.ts:451-460).

    box: ``[..., 4]`` = (x0, y0, x1, y1) video pixels.  Returns the padded
    integer-valued box as floats.
    """
    fh, fw = frame_hw
    x0, y0, x1, y1 = (box[..., i] for i in range(4))
    bw = x1 - x0
    bh = y1 - y0
    px = bw * pad_ratio
    py = bh * pad_ratio
    nx0 = jnp.maximum(0.0, jnp.floor(x0 - px))
    ny0 = jnp.maximum(0.0, jnp.floor(y0 - py))
    nx1 = jnp.minimum(float(fw), jnp.ceil(x1 + px))
    ny1 = jnp.minimum(float(fh), jnp.ceil(y1 + py))
    nx1 = jnp.maximum(nx1, nx0 + 1.0)
    ny1 = jnp.maximum(ny1, ny0 + 1.0)
    return jnp.stack([nx0, ny0, nx1, ny1], axis=-1)
