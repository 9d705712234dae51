"""Alpha compositing: the explicit op the reference splits across Canvas2D
'destination-in' and CSS canvas stacking.

Reference composite path (client/src/core/frameProcessorTest.ts:169-178 +
style.css:571-586): the 512x288 mask is bilinearly upscaled by drawImage to
frame size and applied as the person layer's alpha; the generated background
shows through via CSS z-stacking.  The in-code constant-color composite is
explicitAlphaBlend (client/src/core/frameProcessor.ts:422-448), and the
hand-written upscale is bilinearUpscale (:213-242, align_corners + output
clamp).

Here it is one fused op: out = frame * a + background * (1 - a), with the
background being a replacement image, a solid color, or a blur of the frame
itself (BASELINE.json configs).
"""

from __future__ import annotations

import jax.numpy as jnp

from video_stream_segmenetation_tpu.ops.blur import (
    gaussian_blur,
    gaussian_blur_auto,
    gaussian_blur_mxu,
)
from video_stream_segmenetation_tpu.ops.color import denormalize_to_u8, quantize_alpha_u8
from video_stream_segmenetation_tpu.ops.resize import resize_bilinear


def upsample_alpha(
    alpha: jnp.ndarray,
    out_hw: tuple[int, int],
    method: str = "half_pixel",
    clamp: bool = True,
) -> jnp.ndarray:
    """Mask-res alpha ``[..., h, w]`` -> frame-res ``[..., H, W]``.

    method='half_pixel' matches Canvas drawImage upscale (the active path,
    frameProcessorTest.ts:177); 'align_corners' matches the hand-written
    bilinearUpscale (frameProcessor.ts:213-242), which also clamps.
    """
    up = resize_bilinear(alpha, out_hw, method=method, channel_last=False)
    return jnp.clip(up, 0.0, 1.0) if clamp else up


def alpha_composite(
    frame: jnp.ndarray,
    alpha: jnp.ndarray,
    background: jnp.ndarray | None = None,
    bg_color: tuple[float, float, float] | None = None,
    bg_blur_sigma: float | None = None,
    upsample_method: str = "half_pixel",
    quantize_alpha: bool = False,
    out_u8: bool = False,
) -> jnp.ndarray:
    """out = frame * a + bg * (1 - a), all on-device, no host hops.

    frame: ``[..., H, W, 3]`` float 0..1 (or 0..255 -- units just pass
    through).  alpha: ``[..., h, w]`` at mask resolution (upsampled here) or
    already ``[..., H, W]``.  Background priority: explicit image >
    blur-of-frame > solid color > black.

    quantize_alpha reproduces the reference's u8 alpha round-trip
    (alphaToImageData, frameProcessorTest.ts:204-216) for parity tests.
    """
    h, w = frame.shape[-3], frame.shape[-2]
    if alpha.shape[-2:] != (h, w):
        alpha = upsample_alpha(alpha, (h, w), method=upsample_method)
    else:
        alpha = jnp.clip(alpha, 0.0, 1.0)
    if quantize_alpha:
        alpha = quantize_alpha_u8(alpha)
    a = alpha[..., None].astype(frame.dtype)

    if background is not None:
        bg = background.astype(frame.dtype)
    elif bg_blur_sigma is not None:
        bg = gaussian_blur(frame, bg_blur_sigma)
    elif bg_color is not None:
        bg = jnp.asarray(bg_color, dtype=frame.dtype)
        bg = jnp.broadcast_to(bg, frame.shape)
    else:
        bg = jnp.zeros_like(frame)

    out = frame * a + bg * (1 - a)
    # out_u8 assumes 0..1 units (Math.round semantics, frameProcessor.ts:442-444)
    return denormalize_to_u8(out) if out_u8 else out


def binarize_alpha(alpha: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Hard-alpha option: the 'soft/hard' composite switch of the U2Net
    variant's composeMatteOnCanvas (client/src/core/u2FrameProc.ts:78-148)
    and BASELINE.json's 'binary mask' config."""
    return (alpha >= threshold).astype(alpha.dtype)


def multiclass_composite(
    frame: jnp.ndarray,
    class_alpha: jnp.ndarray,
    effects: list[dict],
    upsample_method: str = "half_pixel",
    out_u8: bool = False,
) -> jnp.ndarray:
    """Per-class composite effects (BASELINE.json config 5: multi-class
    person/hair/clothing segmentation with per-class effects).

    frame: ``[..., H, W, 3]`` float 0..1.  class_alpha: ``[..., h, w, K]``
    softmax maps (class 0 = background).  effects: list of K dicts, one
    per class, each one of:
        {"keep": true}                      -- pass the frame through
        {"color": (r, g, b)}                -- replace with a solid color
        {"blur": sigma}                     -- blur that region
        {"tint": (r, g, b), "strength": s}  -- blend toward a tint

    Output = sum_k effect_k(frame) * alpha_k (alphas sum to 1).
    """
    h, w = frame.shape[-3], frame.shape[-2]
    k = class_alpha.shape[-1]
    if len(effects) != k:
        raise ValueError(f"need {k} effects, got {len(effects)}")
    if class_alpha.shape[-3:-1] != (h, w):
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        # planar MXU upsample (same taps as the gather path; dense
        # matmuls -- the gather lowering dominates config-5 step time)
        maps = [
            jnp.clip(
                resize_bilinear_mxu(
                    class_alpha[..., i], (h, w), method=upsample_method,
                    channel_last=False,
                ),
                0.0, 1.0,
            )
            for i in range(k)
        ]
        class_alpha = jnp.stack(maps, axis=-1)
        class_alpha = class_alpha / jnp.maximum(
            class_alpha.sum(-1, keepdims=True), 1e-6
        )

    out = jnp.zeros_like(frame)
    for i, eff in enumerate(effects):
        a = class_alpha[..., i : i + 1]
        if eff.get("keep"):
            layer = frame
        elif "color" in eff:
            layer = jnp.broadcast_to(
                jnp.asarray(eff["color"], frame.dtype), frame.shape
            )
        elif "blur" in eff:
            layer = gaussian_blur_auto(frame, float(eff["blur"]))
        elif "tint" in eff:
            s = float(eff.get("strength", 0.5))
            tint = jnp.asarray(eff["tint"], frame.dtype)
            layer = frame * (1 - s) + tint * s
        else:
            raise ValueError(f"unknown effect: {eff}")
        out = out + layer * a
    return denormalize_to_u8(out) if out_u8 else out
