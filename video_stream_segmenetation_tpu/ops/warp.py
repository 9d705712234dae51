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
