"""Pixel-format / normalization ops.

Replaces the reference's preprocess chain (uint8 canvas pixels -> /255 float
NCHW, client/src/core/frameProcessorTest.ts:79-87) and the u8 model-output
path (squeezeMaskTo2D, frameProcessorTest.ts:190-201).  We keep NHWC
(TPU-native layout); the NCHW transpose of the reference exists only because
ONNX models want it and has no equivalent here.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_frame(
    frame_u8: jnp.ndarray,
    mode: str = "unit",
    mean: tuple[float, float, float] | None = None,
    std: tuple[float, float, float] | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8 [..., C] -> float.

    mode='unit'      : x/255                   (frameProcessorTest.ts:81)
    mode='centered'  : x/255*2 - 1             (USE_NEG_ONE_TO_ONE flag,
                                                frameProcessorTest.ts:7)
    mode='imagenet'  : (x/255 - mean)/std      (u2FrameProc.ts:5-7,26-32)
    """
    x = frame_u8.astype(dtype) / 255.0
    if mode == "unit":
        return x
    if mode == "centered":
        return x * 2.0 - 1.0
    if mode == "imagenet":
        mean = mean or (0.485, 0.456, 0.406)
        std = std or (0.229, 0.224, 0.225)
        return (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)
    raise ValueError(f"unknown normalize mode: {mode}")


def denormalize_to_u8(x: jnp.ndarray) -> jnp.ndarray:
    """float [0,1] -> uint8 with JS Math.round (round-half-up) semantics.

    Matches explicitAlphaBlend's Math.round stores
    (client/src/core/frameProcessor.ts:438-445).
    """
    return jnp.clip(jnp.floor(x * 255.0 + 0.5), 0, 255).astype(jnp.uint8)


def u8_mask_to_f32(mask_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 alpha -> float32 /255 (squeezeMaskTo2D u8 branch,
    client/src/core/frameProcessorTest.ts:193-197)."""
    return mask_u8.astype(jnp.float32) / 255.0


def mask_to_f32(mask: jnp.ndarray) -> jnp.ndarray:
    """Normalize any model mask dtype to float32: the multi-dtype squeeze
    of the reference (toFloat32Squeezed, frameProcessorRVM.ts:98-121 --
    f32 passthrough, f16 software-converted there / native here, u8 /255).
    """
    if mask.dtype == jnp.uint8:
        return u8_mask_to_f32(mask)
    return mask.astype(jnp.float32)


def quantize_alpha_u8(alpha: jnp.ndarray) -> jnp.ndarray:
    """clamp + round(a*255)/255 -- the precision loss the reference incurs by
    routing alpha through an RGBA canvas (alphaToImageData,
    client/src/core/frameProcessorTest.ts:204-216).  Exposed so parity tests
    can opt into reference-exact quantization; production keeps float.
    """
    a = jnp.clip(alpha, 0.0, 1.0)
    return jnp.floor(a * 255.0 + 0.5) / 255.0
