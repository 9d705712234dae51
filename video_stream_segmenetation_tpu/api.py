"""Public functional API -- the reference client's surface, batched.

BASELINE.json names the contract: per-frame ``segment(frame) -> mask`` plus
``composite(frame, mask, background)`` with the customization knobs and
quality counters.  These free functions are the stateless entry points; the
stateful multi-stream loop lives in `service.engine.Engine`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from video_stream_segmenetation_tpu import ops
from video_stream_segmenetation_tpu.models.registry import get_spec
from video_stream_segmenetation_tpu.runtime.config import PipelineStatics


@functools.lru_cache(maxsize=4)
def _default_matting(model_name: str = "mattenet"):
    model, params = get_spec(model_name).init_params()
    # prefer trained weights when the repo checkpoint exists
    # (tools/train_flagship.py / train_variants.py)
    import os

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", model_name,
    )
    if os.path.isdir(ckpt):
        try:
            from video_stream_segmenetation_tpu.utils.checkpoint import (
                restore_params,
            )

            params = restore_params(ckpt)
        except Exception as e:
            # incompatible/partial checkpoint: keep the random init, but
            # say so -- silent fallback serves garbage masks with no signal
            import warnings

            warnings.warn(
                f"checkpoint restore failed for {ckpt!r} ({e!r}); "
                f"serving randomly-initialized {model_name} weights"
            )
    return model, params


def _ensure_batched(x: jnp.ndarray, rank: int):
    x = jnp.asarray(x)
    if x.ndim == rank - 1:
        return x[None], True
    return x, False


@functools.partial(jax.jit, static_argnames=("model_name", "mask_h", "mask_w"))
def _segment_jit(params, frames_u8, model_name, mask_h, mask_w):
    model, _ = _default_matting(model_name)
    f = frames_u8.astype(jnp.float32) / 255.0
    small = ops.resize_bilinear(f, (mask_h, mask_w), method="asymmetric")
    return model.apply(params, small)["alpha"].astype(jnp.float32)


def segment(frame, params=None, model_name: str = "mattenet", mask_hw=(288, 512)):
    """``segment(frame) -> mask``.

    frame: uint8 ``[H, W, 3]`` or ``[S, H, W, 3]``.  Returns float32 alpha
    at mask resolution (``[h, w]`` or ``[S, h, w]``).  With no params, the
    repo's trained checkpoint for ``model_name`` is loaded when present
    (checkpoints/, produced by tools/train_flagship.py), else a
    deterministic randomly-initialized model.
    """
    frames, squeezed = _ensure_batched(frame, 4)
    if params is None:
        _, params = _default_matting(model_name)
    a = _segment_jit(params, frames, model_name, mask_hw[0], mask_hw[1])
    return a[0] if squeezed else a


@functools.partial(
    jax.jit, static_argnames=("bg_mode", "bg_blur_sigma", "upsample_method")
)
def _composite_jit(frames_u8, alpha, background, bg_mode, bg_blur_sigma, upsample_method):
    f = frames_u8.astype(jnp.float32) / 255.0
    if bg_mode == "blur":
        bg = ops.gaussian_blur_auto(f, bg_blur_sigma)
    elif bg_mode == "image":
        bg = background.astype(jnp.float32)
        if bg.dtype != f.dtype or bg.shape[-3:-1] != f.shape[-3:-1]:
            bg = ops.resize_bilinear(bg, f.shape[-3:-1], method="half_pixel")
        bg = jnp.broadcast_to(bg, f.shape)
    else:
        bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), f.shape)
    return ops.alpha_composite(
        f, alpha, background=bg, upsample_method=upsample_method, out_u8=True
    )


def composite(
    frame,
    mask,
    background=None,
    bg_blur_sigma: float | None = None,
    upsample_method: str = "half_pixel",
):
    """``composite(frame, mask, background) -> frame``.

    frame: uint8 ``[H, W, 3]`` / ``[S, H, W, 3]``.  mask: float alpha at any
    resolution (upsampled on device).  background: None -> blur if
    bg_blur_sigma else black; an RGB image (any size -- resized on device);
    or a 3-tuple color in 0..1.  Returns uint8 frames.
    """
    frames, squeezed = _ensure_batched(frame, 4)
    mask = jnp.asarray(mask)
    if squeezed and mask.ndim == 2:
        mask = mask[None]
    if background is None and bg_blur_sigma is not None:
        out = _composite_jit(frames, mask, jnp.zeros(3), "blur", float(bg_blur_sigma), upsample_method)
    elif background is None:
        out = _composite_jit(frames, mask, jnp.zeros(3), "color", 0.0, upsample_method)
    elif isinstance(background, (tuple, list)) and len(background) == 3:
        out = _composite_jit(frames, mask, jnp.asarray(background, jnp.float32), "color", 0.0, upsample_method)
    else:
        bg = jnp.asarray(background)
        if bg.dtype == jnp.uint8:
            bg = bg.astype(jnp.float32) / 255.0
        out = _composite_jit(frames, mask, bg, "image", 0.0, upsample_method)
    return out[0] if squeezed else out


@functools.partial(
    jax.jit,
    static_argnames=(
        "model_name", "mask_h", "mask_w", "bg_mode", "bg_blur_sigma",
        "upsample_method",
    ),
)
def _process_jit(
    params, frames_u8, background, model_name, mask_h, mask_w,
    bg_mode, bg_blur_sigma, upsample_method,
):
    """segment + composite as ONE device program: a single upload and a
    single download per call (the two-round-trip segment()->composite()
    chain costs 2x the tunnel/PCIe traffic for the same math)."""
    model, _ = _default_matting(model_name)
    f = frames_u8.astype(jnp.float32) / 255.0
    small = ops.resize_bilinear(f, (mask_h, mask_w), method="asymmetric")
    alpha = model.apply(params, small)["alpha"].astype(jnp.float32)
    if bg_mode == "blur":
        bg = ops.gaussian_blur_auto(f, bg_blur_sigma)
    elif bg_mode == "image":
        bg = background.astype(jnp.float32)
        if bg.shape[-3:-1] != f.shape[-3:-1]:
            bg = ops.resize_bilinear(bg, f.shape[-3:-1], method="half_pixel")
        bg = jnp.broadcast_to(bg, f.shape)
    else:
        bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), f.shape)
    out = ops.alpha_composite(
        f, alpha, background=bg, upsample_method=upsample_method, out_u8=True
    )
    return out, alpha


def process_frame(
    frame,
    background=None,
    params=None,
    model_name: str = "mattenet",
    mask_hw=(288, 512),
    bg_blur_sigma: float | None = None,
    upsample_method: str = "half_pixel",
):
    """segment + composite in one call (the single-stream convenience --
    what the reference's processFrame does per rAF tick, without state).

    Unlike calling ``segment`` then ``composite``, this runs as one jitted
    program: the frame is uploaded once and only the composite + mask come
    back.  For stateful many-stream serving use `service.Engine`."""
    frames, squeezed = _ensure_batched(frame, 4)
    if params is None:
        _, params = _default_matting(model_name)
    if background is None and bg_blur_sigma is not None:
        bg_mode, bg, sig = "blur", jnp.zeros(3), float(bg_blur_sigma)
    elif background is None:
        bg_mode, bg, sig = "color", jnp.zeros(3), 0.0
    elif isinstance(background, (tuple, list)) and len(background) == 3:
        bg_mode, bg, sig = "color", jnp.asarray(background, jnp.float32), 0.0
    else:
        bg = jnp.asarray(background)
        if bg.dtype == jnp.uint8:
            bg = bg.astype(jnp.float32) / 255.0
        bg_mode, sig = "image", 0.0
    out, mask = _process_jit(
        params, frames, bg, model_name, mask_hw[0], mask_hw[1],
        bg_mode, sig, upsample_method,
    )
    if squeezed:
        return out[0], mask[0]
    return out, mask
