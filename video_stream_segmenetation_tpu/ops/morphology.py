"""Grayscale 3x3 morphology with the reference's exact border semantics.

The reference's loops (client/src/core/frameProcessorTest.ts:644-685,
743-787) only write interior pixels (y,x in [1, dim-2]); the border ring of
each *output* buffer keeps its Float32Array zero-initialization.  That means:

* erode: interior = min over the 3x3 window (seeded with 1.0, i.e. clamped
  to <= 1), border = 0;
* dilate: interior = max over 3x3 (seeded 0.0 -> clamped >= 0), border = 0;
* the second stage of opening reads those zero borders.

We reproduce this bit-for-bit (it is visible in mask IoU at the frame edge)
using shifted-window reductions instead of per-pixel loops, batched over
leading axes.  All inputs are ``[..., H, W]`` float arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def _window_reduce(x: jnp.ndarray, op: str, pad_value: float) -> jnp.ndarray:
    """3x3 min/max over ``[..., H, W]`` using a padded stack (VPU-friendly)."""
    pads = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pads, constant_values=pad_value)
    h, w = x.shape[-2], x.shape[-1]
    acc = None
    for dy in range(3):
        for dx in range(3):
            win = xp[..., dy : dy + h, dx : dx + w]
            if acc is None:
                acc = win
            else:
                acc = jnp.minimum(acc, win) if op == "min" else jnp.maximum(acc, win)
    return acc


def _zero_border(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    interior = jnp.zeros((h, w), dtype=bool).at[1 : h - 1, 1 : w - 1].set(True)
    return jnp.where(interior, x, jnp.zeros((), dtype=x.dtype))


def erode3x3(alpha: jnp.ndarray) -> jnp.ndarray:
    """min-filter; interior only, border = 0; result <= 1 (the reference
    seeds minVal with 1.0, frameProcessorTest.ts:652)."""
    return _zero_border(jnp.minimum(_window_reduce(alpha, "min", jnp.inf), 1.0))


def dilate3x3(alpha: jnp.ndarray) -> jnp.ndarray:
    """max-filter; interior only, border = 0; result >= 0 (maxVal seeded 0.0,
    frameProcessorTest.ts:671)."""
    return _zero_border(jnp.maximum(_window_reduce(alpha, "max", -jnp.inf), 0.0))


def morphological_opening(alpha: jnp.ndarray) -> jnp.ndarray:
    """erode then dilate (client/src/core/frameProcessorTest.ts:644-685).

    The dilation pass reads the eroded buffer *including* its zeroed border,
    exactly as the JS does.
    """
    return dilate3x3(erode3x3(alpha))


def morphological_closing_in_prior(
    alpha: jnp.ndarray,
    prior: jnp.ndarray,
    has_prior: jnp.ndarray | bool = True,
) -> jnp.ndarray:
    """Prior-gated dilate-then-erode (frameProcessorTest.ts:743-787).

    Where prior <= 0 each stage passes its input through *at the interior*;
    the border ring of each stage's output buffer is 0 regardless of prior
    (the JS loops never write it).  With no prior at all the function
    returns alpha unmodified, including borders (the early return at :744).

    has_prior: bool or ``[...]`` per-stream flag; streams without a face
    detection this step take the identity path.
    """
    h, w = alpha.shape[-2], alpha.shape[-1]
    interior = jnp.zeros((h, w), dtype=bool).at[1 : h - 1, 1 : w - 1].set(True)
    in_prior = prior > 0

    dil = jnp.maximum(_window_reduce(alpha, "max", -jnp.inf), 0.0)
    dilated = jnp.where(interior & in_prior, dil, jnp.where(interior, alpha, 0.0))

    ero = jnp.minimum(_window_reduce(dilated, "min", jnp.inf), 1.0)
    closed = jnp.where(interior & in_prior, ero, jnp.where(interior, dilated, 0.0))

    gate = jnp.asarray(has_prior)
    if gate.ndim < alpha.ndim:
        gate = gate.reshape(gate.shape + (1,) * (alpha.ndim - gate.ndim))
    return jnp.where(gate, closed, alpha)
