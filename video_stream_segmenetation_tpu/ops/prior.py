"""Elliptical soft face-prior rasterization.

Reference: facePriorMask, client/src/core/frameProcessorTest.ts:697-741.
A detector box (video coords) becomes, in mask space, a soft ellipse:
center = box center, radii rx = bw*0.56, ry = bh*0.70; value = cosine ramp
1 at center -> 0 at the ellipse edge (0.5 - 0.5*cos(pi*(1-t)) with
t = sqrt(d2)); plus a >= 0.25 floor in a thin edge zone
(d2 > 1 - pad/max(rx, ry), pad = max(4, floor(min(W, H)*0.02))).
"""

from __future__ import annotations

import jax.numpy as jnp


def face_prior_params(
    box_video: jnp.ndarray,
    video_hw: tuple[int, int],
    mask_hw: tuple[int, int],
) -> jnp.ndarray:
    """Compact form of ``face_prior_mask``: ``[..., 4]`` = (cx, cy, rx, ry)
    in mask pixels, same floor/ceil box conversion.  The plane is analytic
    in these four scalars, so the fused refine kernel can rasterize it
    in VMEM (``prior_impl='analytic'``) instead of reading a scattered
    ``[S, H, W]`` f32 plane from HBM (~75 MB/step at S=64)."""
    vh, vw = video_hw
    mh, mw = mask_hw
    sx = mw / vw
    sy = mh / vh
    x0 = jnp.floor(box_video[..., 0] * sx)
    y0 = jnp.floor(box_video[..., 1] * sy)
    x1 = jnp.ceil(box_video[..., 2] * sx)
    y1 = jnp.ceil(box_video[..., 3] * sy)
    cx = (x0 + x1) / 2.0
    cy = (y0 + y1) / 2.0
    rx = jnp.maximum(1e-6, (x1 - x0) * 0.56)
    ry = jnp.maximum(1e-6, (y1 - y0) * 0.70)
    return jnp.stack([cx, cy, rx, ry], axis=-1)


def prior_plane_from_params(
    cx, cy, rx, ry, mask_hw: tuple[int, int]
) -> jnp.ndarray:
    """Rasterize the soft ellipse from (cx, cy, rx, ry) scalars -- the
    exact per-pixel formula of ``face_prior_mask`` (shared by the jnp
    path and the in-kernel analytic path).  Scalars broadcast against an
    [H, W] grid: pass shapes [..., 1, 1] for batched use, plain scalars
    in-kernel.  Mosaic-safe: 2-D broadcasted_iota, no 1-D arange."""
    import jax

    mh, mw = mask_hw
    pad = max(4, int(min(mw, mh) * 0.02))
    x = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 1).astype(jnp.float32)
    y = jax.lax.broadcasted_iota(jnp.int32, (mh, mw), 0).astype(jnp.float32)
    dx = (x - cx) / rx
    dy = (y - cy) / ry
    d2 = dx * dx + dy * dy
    t = jnp.sqrt(jnp.clip(d2, 0.0, 1.0))
    v = 0.5 - 0.5 * jnp.cos(jnp.pi * (1.0 - t))
    edge_zone = d2 > 1.0 - pad / jnp.maximum(rx, ry)
    v = jnp.where(edge_zone, jnp.maximum(v, 0.25), v)
    return jnp.where(d2 <= 1.0, v, 0.0)


def face_prior_mask(
    box_video: jnp.ndarray,
    video_hw: tuple[int, int],
    mask_hw: tuple[int, int],
) -> jnp.ndarray:
    """box_video: ``[..., 4]`` = (x0, y0, x1, y1) in video pixels (traced).

    Returns ``[..., H, W]`` float32 prior.  The box->mask conversion uses
    floor/ceil exactly as the reference (frameProcessorTest.ts:709-712).
    """
    vh, vw = video_hw
    mh, mw = mask_hw
    sx = mw / vw
    sy = mh / vh
    x0 = jnp.floor(box_video[..., 0] * sx)
    y0 = jnp.floor(box_video[..., 1] * sy)
    x1 = jnp.ceil(box_video[..., 2] * sx)
    y1 = jnp.ceil(box_video[..., 3] * sy)

    cx = (x0 + x1) / 2.0
    cy = (y0 + y1) / 2.0
    rx = (x1 - x0) * 0.56
    ry = (y1 - y0) * 0.70
    pad = max(4, int(min(mw, mh) * 0.02))

    x = jnp.arange(mw, dtype=jnp.float32)[None, :]
    y = jnp.arange(mh, dtype=jnp.float32)[:, None]
    cxb = cx[..., None, None]
    cyb = cy[..., None, None]
    rxb = jnp.maximum(1e-6, rx)[..., None, None]
    ryb = jnp.maximum(1e-6, ry)[..., None, None]
    dx = (x - cxb) / rxb
    dy = (y - cyb) / ryb
    d2 = dx * dx + dy * dy

    t = jnp.sqrt(jnp.clip(d2, 0.0, 1.0))
    v = 0.5 - 0.5 * jnp.cos(jnp.pi * (1.0 - t))
    edge_zone = d2 > 1.0 - pad / jnp.maximum(rxb, ryb)
    v = jnp.where(edge_zone, jnp.maximum(v, 0.25), v)
    return jnp.where(d2 <= 1.0, v, 0.0)
