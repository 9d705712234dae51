"""Temporal filters: the reference's O(1)-state recurrences, made functional.

The reference mutates module-global state in place (prevAlpha,
client/src/core/frameProcessorTest.ts:47,218-227; lastAffine,
main.ts:14,77-94).  Here every filter is pure: ``(state, x) -> (state', y)``,
batched over a leading stream axis, so the whole chain lives inside one
jitted program and per-stream state is just a row of a device array.
"""

from __future__ import annotations

import jax.numpy as jnp


def temporal_ema(
    prev: jnp.ndarray,
    current: jnp.ndarray,
    ema: jnp.ndarray | float,
    initialized: jnp.ndarray,
    adapt: jnp.ndarray | float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EMA with the reference's cold-start semantics, plus an optional
    motion-adaptive mode that the reference does not have.

    Reference (client/src/core/frameProcessorTest.ts:218-227): on the first
    frame prevAlpha is a copy of current and *current* is returned; after
    that prev = EMA*prev + (1-EMA)*current, and the (aliased) prev buffer is
    returned.  Functionally: out == new_prev on warm frames, out == current
    (== new_prev) on the first frame, so out always equals new_prev.

    ``adapt`` (None or 0 = reference-exact): per-pixel the effective EMA
    is ``ema * (1 - adapt * m)`` where the motion gate m ramps 0 -> 1 as
    ``|current - prev|`` crosses [config.EMA_ADAPT_T0, EMA_ADAPT_T1].
    Static pixels (model jitter below T0) keep the full smoothing;
    moving content tracks the current frame instead of lagging a fixed
    EMA behind it -- the fix for the reference's own smoothing lag on
    fast motion (the thing to beat, not inherit).

    prev, current: ``[..., H, W]``.  ema/adapt: scalar or ``[...]``
    broadcastable per-stream knobs (config.EMA, frameProcessorTest.ts:21;
    config.DEFAULT_EMA_ADAPT).
    initialized: bool ``[...]`` per-stream flag (False on first frame).
    Returns (new_prev, out).
    """
    from video_stream_segmenetation_tpu.runtime.config import (
        EMA_ADAPT_T0,
        EMA_ADAPT_T1,
    )

    k = jnp.asarray(ema, dtype=current.dtype)
    if k.ndim < current.ndim:
        k = k.reshape(k.shape + (1,) * (current.ndim - k.ndim))
    init = jnp.asarray(initialized)
    if init.ndim < current.ndim:
        init = init.reshape(init.shape + (1,) * (current.ndim - init.ndim))
    if adapt is not None:
        ad = jnp.asarray(adapt, dtype=current.dtype)
        if ad.ndim < current.ndim:
            ad = ad.reshape(ad.shape + (1,) * (current.ndim - ad.ndim))
        d = jnp.abs(current - prev)
        m = jnp.clip(
            (d - EMA_ADAPT_T0) * (1.0 / (EMA_ADAPT_T1 - EMA_ADAPT_T0)),
            0.0, 1.0,
        )
        k = k * (1.0 - ad * m)
    blended = k * prev + (1 - k) * current
    new_prev = jnp.where(init, blended, current)
    return new_prev, new_prev


def hole_filling_ema(
    prev: jnp.ndarray,
    current: jnp.ndarray,
    ema: jnp.ndarray | float,
    initialized: jnp.ndarray,
    hole_threshold: float = 0.1,
    hole_margin: float = 0.2,
    decay: float = 0.90,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The reference's documented alternative temporal filter.

    From the commented-out variant in
    client/src/core/frameProcessor_branch.ts:155-180: where the current
    pixel is a sudden "hole" (current < HOLE_THRESHOLD while
    prev > HOLE_THRESHOLD + 0.2) trust the previous value with a 0.90 decay
    instead of EMA-blending, which plugs momentary dropouts.
    """
    k = jnp.asarray(ema, dtype=current.dtype)
    if k.ndim < current.ndim:
        k = k.reshape(k.shape + (1,) * (current.ndim - k.ndim))
    init = jnp.asarray(initialized)
    if init.ndim < current.ndim:
        init = init.reshape(init.shape + (1,) * (current.ndim - init.ndim))
    is_hole = (current < hole_threshold) & (prev > hole_threshold + hole_margin)
    blended = jnp.where(is_hole, prev * decay, k * prev + (1 - k) * current)
    new_prev = jnp.where(init, blended, current)
    return new_prev, new_prev


def affine_lowpass(
    last: jnp.ndarray,
    update: jnp.ndarray,
    gain: float | jnp.ndarray,
    has_last: jnp.ndarray,
    has_update: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Low-pass the 6-param affine update stream.

    Reference (client/src/core/main.ts:77-94): when processFrame returns an
    updatedAffine, lastAffine = lerp(lastAffine, update, WARP_GAIN=0.7)
    elementwise, or the update verbatim if there was no lastAffine yet.
    Without an update, lastAffine is unchanged.

    last, update: ``[..., 6]`` (a11, a12, tx, a21, a22, ty).
    has_last / has_update: bool ``[...]`` flags.
    Returns (new_last, new_has_last).
    """
    g = jnp.asarray(gain, dtype=last.dtype)
    merged = last * (1 - g) + update * g
    taken = jnp.where(has_last[..., None], merged, update)
    new_last = jnp.where(has_update[..., None], taken, last)
    new_has = has_last | has_update
    return new_last, new_has
