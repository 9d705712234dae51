"""Joint (cross) bilateral 3x3 filter, guided by the video frame.

Reference: jointBilateral3x3, client/src/core/frameProcessorTest.ts:230-266.
Per pixel: weight each of the up-to-9 in-bounds neighbors by
``exp(-(dx^2+dy^2)/(2*sigma_s^2)) * exp(-|dRGB|^2/(2*sigma_r^2))`` against the
guide image (RGB in 0..255), normalize by the weight sum.  Out-of-bounds
neighbors are *excluded* (the filter self-normalizes at edges) -- reproduced
here with validity masks, not padding tricks.

Batched over leading axes; sigmas may be per-stream arrays (live knobs
config.BILATERAL_SIGMA_*, frameProcessorTest.ts:26-27).
"""

from __future__ import annotations

import jax.numpy as jnp


def joint_bilateral3x3(
    alpha: jnp.ndarray,
    guide_rgb: jnp.ndarray,
    sigma_spatial: jnp.ndarray | float = 1.0,
    sigma_range: jnp.ndarray | float = 12.0,
) -> jnp.ndarray:
    """alpha ``[..., H, W]``; guide_rgb ``[..., H, W, 3]`` in 0..255 units.

    sigma_spatial / sigma_range: scalars or ``[...]`` per-stream arrays.
    """
    dt = alpha.dtype
    h, w = alpha.shape[-2], alpha.shape[-1]

    ss = jnp.asarray(sigma_spatial, dtype=dt)
    sr = jnp.asarray(sigma_range, dtype=dt)
    extra = alpha.ndim - 2
    if ss.ndim and ss.ndim < alpha.ndim:
        ss = ss.reshape(ss.shape + (1,) * (alpha.ndim - ss.ndim))
    if sr.ndim and sr.ndim < alpha.ndim:
        sr = sr.reshape(sr.shape + (1,) * (alpha.ndim - sr.ndim))
    inv_two_ss2 = 1.0 / (2.0 * ss * ss)
    inv_two_sr2 = 1.0 / (2.0 * sr * sr)

    apad = jnp.pad(alpha, [(0, 0)] * extra + [(1, 1), (1, 1)])
    gpad = jnp.pad(guide_rgb, [(0, 0)] * extra + [(1, 1), (1, 1), (0, 0)])
    vpad = jnp.pad(
        jnp.ones((h, w), dtype=dt), [(1, 1), (1, 1)]
    )  # 1 inside, 0 at virtual out-of-bounds ring

    g0 = guide_rgb.astype(dt)
    sum_w = jnp.zeros_like(alpha)
    sum_a = jnp.zeros_like(alpha)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            a_n = apad[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            g_n = gpad[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :].astype(dt)
            v_n = vpad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            d = g_n - g0
            range2 = jnp.sum(d * d, axis=-1)
            spatial2 = jnp.asarray(float(dx * dx + dy * dy), dtype=dt)
            wgt = jnp.exp(-spatial2 * inv_two_ss2) * jnp.exp(-range2 * inv_two_sr2)
            wgt = wgt * v_n
            sum_w = sum_w + wgt
            sum_a = sum_a + wgt * a_n
    # sumW > 0 always holds (center tap weight is exp(0)*exp(0) = 1), but the
    # reference still guards (frameProcessorTest.ts:262); keep it for exactness
    # under extreme sigma underflow.
    return jnp.where(sum_w > 0, sum_a / jnp.maximum(sum_w, 1e-30), alpha)
