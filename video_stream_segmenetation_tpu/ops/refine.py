"""Threshold + gamma transfer with elliptical face-prior clamps.

Reference: refineAlphaOnce, client/src/core/frameProcessorTest.ts:270-313.

Piecewise transfer (all knobs live-tunable per stream):
    v <= low          -> 0
    v >= high         -> 1
    else              -> ((v - low) / max(1e-6, high - low)) ** gamma
Then, where a face prior p is present:
    p > 0.25          -> v = max(v, min(1, 0.55*p + 0.15))   (face floor)
    0 < p <= 0.25     -> v = min(v, 0.35 + 0.15*p)           (near-face cap)
"""

from __future__ import annotations

import jax.numpy as jnp

FACE_FLOOR = 0.55  # minFaceFloor, frameProcessorTest.ts:281
NEAR_BG_CAP = 0.35  # maxNearBgCap, :282
NEAR_BG_BLEND = 0.15  # nearBgBlend, :283


def refine_alpha(
    alpha: jnp.ndarray,
    low: jnp.ndarray | float,
    high: jnp.ndarray | float,
    gamma: jnp.ndarray | float,
    prior: jnp.ndarray | None = None,
    has_prior: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """alpha ``[..., H, W]``; low/high/gamma scalars or per-stream ``[...]``.

    prior: optional ``[..., H, W]``; has_prior gates the clamps per stream
    (a stream with no face detection this step skips them, mirroring the
    ``prior?`` null check at frameProcessorTest.ts:298).
    """
    dt = alpha.dtype

    def bcast(v):
        v = jnp.asarray(v, dtype=dt)
        if v.ndim and v.ndim < alpha.ndim:
            v = v.reshape(v.shape + (1,) * (alpha.ndim - v.ndim))
        return v

    lo, hi, g = bcast(low), bcast(high), bcast(gamma)
    denom = jnp.maximum(1e-6, hi - lo)
    t = jnp.clip((alpha - lo) / denom, 0.0, 1.0)
    mid = jnp.power(t, g)
    v = jnp.where(alpha <= lo, 0.0, jnp.where(alpha >= hi, 1.0, mid))

    if prior is not None:
        p = prior.astype(dt)
        floor = jnp.minimum(1.0, FACE_FLOOR * p + 0.15)
        cap = NEAR_BG_CAP + NEAR_BG_BLEND * p
        clamped = jnp.where(
            p > 0.25,
            jnp.maximum(v, floor),
            jnp.where(p > 0, jnp.minimum(v, cap), v),
        )
        gate = bcast(jnp.asarray(has_prior))
        v = jnp.where(gate, clamped, v)
    return v
