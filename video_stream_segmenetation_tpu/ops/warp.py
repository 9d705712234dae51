"""Affine / translation warps of the previous-frame alpha (motion comp).

Reference kernels: invertAffine + warpAffineNearest
(client/src/core/frameProcessorTest.ts:323-353) and warpTranslate
(client/src/core/frameProcessor.ts:100-114).

The JS rounds source coordinates with Math.round, which is round-half-up
(floor(x + 0.5)) -- NOT banker's rounding; we match it exactly.  Out-of-
bounds sources produce 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def invert_affine(affine: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Invert ``[..., 6]`` = (a11, a12, tx, a21, a22, ty).

    Matches invertAffine (frameProcessorTest.ts:323-333) including its
    det==0 -> 1e-6 guard (exact-zero substitution, not clamping).
    """
    a11, a12, tx, a21, a22, ty = (affine[..., i] for i in range(6))
    det = a11 * a22 - a12 * a21
    d = jnp.where(det != 0, det, eps)
    ia11 = a22 / d
    ia12 = -a12 / d
    ia21 = -a21 / d
    ia22 = a11 / d
    itx = -(ia11 * tx + ia12 * ty)
    ity = -(ia21 * tx + ia22 * ty)
    return jnp.stack([ia11, ia12, itx, ia21, ia22, ity], axis=-1)


def warp_affine_nearest(src: jnp.ndarray, affine: jnp.ndarray) -> jnp.ndarray:
    """Warp ``src [..., H, W]`` by the *forward* affine: for each output
    (x, y), sample src at round(inv(A) @ (x, y)) (warpAffineNearest,
    frameProcessorTest.ts:335-353).

    affine: ``[..., 6]`` broadcastable against src's leading dims.
    """
    h, w = src.shape[-2], src.shape[-1]
    inv = invert_affine(affine)
    ia11, ia12, itx, ia21, ia22, ity = (
        inv[..., i][..., None, None] for i in range(6)
    )
    x = jnp.arange(w, dtype=src.dtype)[None, :]
    y = jnp.arange(h, dtype=src.dtype)[:, None]
    sx = ia11 * x + ia12 * y + itx
    sy = ia21 * x + ia22 * y + ity
    # JS Math.round == floor(x + 0.5)
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xc = jnp.clip(xi, 0, w - 1)
    yc = jnp.clip(yi, 0, h - 1)
    gathered = jnp.take_along_axis(
        src.reshape(src.shape[:-2] + (-1,)),
        (yc * w + xc).reshape(yc.shape[:-2] + (-1,)),
        axis=-1,
    ).reshape(yc.shape)
    return jnp.where(valid, gathered, jnp.zeros((), dtype=src.dtype))


def warp_affine_separable(src: jnp.ndarray, affine: jnp.ndarray) -> jnp.ndarray:
    """Fast nearest warp for (near-)axis-aligned affines: applies only the
    diagonal + translation part of the transform as two per-axis 1-D
    gathers (row pick then lane pick) instead of a full 2-D gather.

    On TPU the exact 2-D gather of `warp_affine_nearest` costs ~99 ms for
    a [64, 288, 512] batch; this separable form is ~20x cheaper.  It is
    EXACT when a12 == a21 == 0 (pure scale+translate, e.g. the
    translation-only tracking of the BlazeFace variant,
    client/src/core/frameProcessor.ts:100-114).  For the Procrustes
    similarity of the active pipeline the rotation term (typically <2
    degrees between landmark updates) is dropped -- visually negligible
    inside the 30% warp blend (frameProcessorTest.ts:108) but NOT
    bit-identical to the reference; use warp_impl='exact' for parity.
    """
    h, w = src.shape[-2], src.shape[-1]
    inv = invert_affine(affine)
    ia11, ia12, itx, ia21, ia22, ity = (inv[..., i] for i in range(6))
    y = jnp.arange(h, dtype=src.dtype)
    x = jnp.arange(w, dtype=src.dtype)
    # drop the off-diagonal (rotation/shear) terms
    sy = ia22[..., None] * y + ity[..., None]  # [..., H]
    sx = ia11[..., None] * x + itx[..., None]  # [..., W]
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yv = (yi >= 0) & (yi < h)
    xv = (xi >= 0) & (xi < w)
    yc = jnp.clip(yi, 0, h - 1)
    xc = jnp.clip(xi, 0, w - 1)
    rows = jnp.take_along_axis(src, yc[..., :, None], axis=-2)
    out = jnp.take_along_axis(rows, xc[..., None, :], axis=-1)
    valid = yv[..., :, None] & xv[..., None, :]
    return jnp.where(valid, out, jnp.zeros((), src.dtype))


def warp_translate(src: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Integer translation warp (warpTranslate, frameProcessor.ts:100-114).

    The JS truncates dx/dy toward zero (``| 0``); out-of-range reads 0.
    dx, dy: scalars or ``[...]`` per-stream (can be traced floats).
    """
    dxi = jnp.trunc(jnp.asarray(dx, jnp.float32)).astype(jnp.int32)
    dyi = jnp.trunc(jnp.asarray(dy, jnp.float32)).astype(jnp.int32)
    affine = jnp.stack(
        [
            jnp.ones_like(dxi, jnp.float32),
            jnp.zeros_like(dxi, jnp.float32),
            dxi.astype(jnp.float32),
            jnp.zeros_like(dxi, jnp.float32),
            jnp.ones_like(dxi, jnp.float32),
            dyi.astype(jnp.float32),
        ],
        axis=-1,
    )
    return warp_affine_nearest(src, affine)
