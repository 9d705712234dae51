"""Fused composite Pallas kernel: mask-res alpha -> frame-res blend, u8 out.

Replaces the XLA tail of the pipeline (alpha upsample + frame/background
blend + u8 quantization, reference stage 10: Canvas drawImage upscale +
'destination-in', frameProcessorTest.ts:169-178) with one kernel per
(stream, row-block):

* vertical interp  = V[rows, mask_h] @ alpha         (MXU)
* horizontal + channel replication = _ @ Wc[mask_w, 3*W]  (MXU) -- the
  interp matrix is pre-expanded to interleaved RGB lanes, so the result
  lands directly on the [rows, W*3] u8 pixel layout with no lane
  shuffles;
* blend: out = frame * a + bg * (1 - a), u8 round-half-up.

Frames/background/output ride as [S, H, W*3] uint8 views (lane dim
W*3 = 3840 = 30 x 128); alpha stays a f32 [mask_h, mask_w] plane per
stream.  Interp matrices use the same taps as ops.resize (half_pixel by
default); Wc is bf16 (weights <= 1, error < 1 u8 LSB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_stream_segmenetation_tpu.ops.resize import _interp_matrix

ROW_BLOCK = 80


@functools.lru_cache(maxsize=None)
def _wc_interleaved(mask_w: int, out_w: int, method: str) -> np.ndarray:
    """[mask_w, out_w*3] horizontal interp matrix with RGB replication."""
    w = _interp_matrix(out_w, mask_w, method)  # [out_w, mask_w]
    wc = np.zeros((mask_w, out_w * 3), np.float32)
    for c in range(3):
        wc[:, c::3] = w.T
    return wc


def _composite_kernel(v_ref, wc_ref, alpha_ref, frame_ref, bg_ref, out_ref):
    j = pl.program_id(1)
    rows = out_ref.shape[1]
    # vertical interp rows for this block: V[j*rows : (j+1)*rows, :]
    v = v_ref[pl.ds(j * rows, rows), :]  # [rows, mask_h] f32
    a_rows = jnp.dot(v, alpha_ref[0], preferred_element_type=jnp.float32)
    # horizontal interp + channel replication -> [rows, W*3]
    a_up = jnp.dot(
        a_rows.astype(jnp.bfloat16), wc_ref[...], preferred_element_type=jnp.float32
    )
    a_up = jnp.clip(a_up, 0.0, 1.0)
    # Mosaic lacks a direct u8 -> f32 cast; hop through int32
    fr = frame_ref[0].astype(jnp.int32).astype(jnp.float32)
    bg = bg_ref[0].astype(jnp.int32).astype(jnp.float32)
    out = fr * a_up + bg * (1.0 - a_up)
    out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    out_ref[0] = out.astype(jnp.int32).astype(jnp.uint8)


def fused_composite(
    frames_u8: jnp.ndarray,  # [S, H, W, 3] uint8
    alpha: jnp.ndarray,  # [S, mh, mw] f32 in [0, 1]
    background_u8: jnp.ndarray,  # [S, H, W, 3] uint8
    method: str = "half_pixel",
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns composited [S, H, W, 3] uint8."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s, h, w, _ = frames_u8.shape
    mh, mw = alpha.shape[-2:]
    assert h % ROW_BLOCK == 0, f"H={h} must be a multiple of {ROW_BLOCK}"
    fr = frames_u8.reshape(s, h, w * 3)
    bg = jnp.broadcast_to(background_u8, frames_u8.shape).reshape(s, h, w * 3)
    v = jnp.asarray(_interp_matrix(h, mh, method))  # [H, mh] f32
    wc = jnp.asarray(_wc_interleaved(mw, w, method), jnp.bfloat16)

    grid = (s, h // ROW_BLOCK)
    out = pl.pallas_call(
        _composite_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, mh), lambda i, j: (0, 0)),  # V (full)
            pl.BlockSpec((mw, w * 3), lambda i, j: (0, 0)),  # Wc (full)
            pl.BlockSpec((1, mh, mw), lambda i, j: (i, 0, 0)),  # alpha plane
            pl.BlockSpec((1, ROW_BLOCK, w * 3), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, ROW_BLOCK, w * 3), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, ROW_BLOCK, w * 3), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((s, h, w * 3), jnp.uint8),
        interpret=interpret,
    )(v, wc, alpha.astype(jnp.float32), fr, bg)
    return out.reshape(s, h, w, 3)
