"""RecurrentMatteNet: RobustVideoMatting-class stateful matting.

Fills the role of the RVM ONNX model the reference's frameProcessorRVM.ts
expects (contract from client/src/core/frameProcessorRVM.ts:16-19,46-70:
{src [1,3,H,W], downsample_ratio f32[1], r1i [1,16,dH,dW], r2i [1,20,..],
r3i [1,40,..], r4i [1,64,..]} -> {pha [1,1,H,W], r1o..r4o}), with the
zero-init cold start at :48-53.

TPU-first redesign:
* NHWC [S,H,W,3]; recurrent state is a pytree of 4 NHWC tensors with the
  same channel plan (16/20/40/64) carried per stream -- state threads
  through `lax.scan` for clip processing or through the stream state
  manager for live serving.
* downsample_ratio is a *static* model attribute (XLA needs static
  shapes); the reference computes dH = round(H * ratio) dynamically per
  session but uses a fixed 0.25 (frameProcessorRVM.ts:7).
* Recurrence is a ConvGRU at each decoder scale (the RVM design), built
  from fused sigmoid/tanh convs.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import (
    ConvBN,
    MobileEncoder,
    nearest_x2,
)
from video_stream_segmenetation_tpu.ops.resize import resize_bilinear

# Recurrent channel plan mirrors the reference contract
# (frameProcessorRVM.ts:16-19): scales /2, /4, /8, /16 of the downsampled
# input with 16, 20, 40, 64 channels.
REC_CHANNELS = (16, 20, 40, 64)


class RecurrentState(NamedTuple):
    r1: jnp.ndarray  # [S, dH/2,  dW/2,  16]
    r2: jnp.ndarray  # [S, dH/4,  dW/4,  20]
    r3: jnp.ndarray  # [S, dH/8,  dW/8,  40]
    r4: jnp.ndarray  # [S, dH/16, dW/16, 64]


def init_state(
    batch: int, hw: tuple[int, int], downsample_ratio: float = 0.25, dtype=jnp.float32
) -> RecurrentState:
    """Zero recurrent state -- the documented cold start
    (frameProcessorRVM.ts:48-53)."""
    h, w = hw
    dh = max(1, round(h * downsample_ratio))
    dw = max(1, round(w * downsample_ratio))
    # SAME-padded stride-2 convs produce ceil(n/2) per stage
    return RecurrentState(
        *[
            jnp.zeros((batch, -(-dh // s), -(-dw // s), c), dtype)
            for s, c in zip((2, 4, 8, 16), REC_CHANNELS)
        ]
    )


class ConvGRU(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, h):
        h = h.astype(self.dtype)
        xh = jnp.concatenate([x, h], axis=-1)
        zr = nn.Conv(2 * self.features, (3, 3), padding="SAME", dtype=self.dtype)(xh)
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        cand = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(
            jnp.concatenate([x, r * h], axis=-1)
        )
        cand = jnp.tanh(cand)
        new_h = (1 - z) * h + z * cand
        return new_h, new_h


class RecurrentMatteNet(nn.Module):
    """Stateful matting: (frames, state) -> (alpha, state')."""

    downsample_ratio: float = 0.25
    width: float = 1.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, state: RecurrentState, train: bool = False):
        """x: [S, H, W, 3] in [0,1].  Returns dict(alpha [S,H,W], state)."""
        s, h, w, _ = x.shape
        dh = max(1, round(h * self.downsample_ratio))
        dw = max(1, round(w * self.downsample_ratio))
        x32 = x.astype(jnp.float32)
        small = resize_bilinear(x32, (dh, dw), method="half_pixel").astype(self.dtype)

        f2, f4, f8, f16 = MobileEncoder(self.width, dtype=self.dtype)(small, train)

        # bottleneck GRU at /16
        g4 = ConvBN(REC_CHANNELS[3], (1, 1), dtype=self.dtype)(f16, train)
        g4, r4 = ConvGRU(REC_CHANNELS[3], dtype=self.dtype)(g4, state.r4)

        def up_block(x_lo, skip, rec, channels):
            xu = nearest_x2(x_lo)[..., : skip.shape[-3], : skip.shape[-2], :]
            xu = jnp.concatenate([xu, skip], axis=-1)
            xu = ConvBN(channels, dtype=self.dtype)(xu, train)
            return ConvGRU(channels, dtype=self.dtype)(xu, rec)

        g3, r3 = up_block(g4, f8, state.r3, REC_CHANNELS[2])  # /8
        g2, r2 = up_block(g3, f4, state.r2, REC_CHANNELS[1])  # /4
        g1, r1 = up_block(g2, f2, state.r1, REC_CHANNELS[0])  # /2

        # low-res alpha at /2 of the downsampled input
        out = nearest_x2(g1)[..., :dh, :dw, :]
        out = jnp.concatenate([out, small], axis=-1)
        out = ConvBN(16, dtype=self.dtype)(out, train)
        alpha_small = nn.sigmoid(
            nn.Conv(1, (1, 1), dtype=self.dtype)(out).astype(jnp.float32)
        )[..., 0]

        # full-res: bilinear upsample + guided refinement conv on the
        # full-res frame (cheap deep-guided-filter stand-in)
        alpha_up = resize_bilinear(
            alpha_small, (h, w), method="half_pixel", channel_last=False
        )
        guide = jnp.concatenate([x32, alpha_up[..., None]], axis=-1).astype(self.dtype)
        res = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(guide)
        res = nn.relu(res)
        res = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(res)
        alpha = jnp.clip(alpha_up + res.astype(jnp.float32)[..., 0], 0.0, 1.0)

        new_state = RecurrentState(
            r1.astype(state.r1.dtype),
            r2.astype(state.r2.dtype),
            r3.astype(state.r3.dtype),
            r4.astype(state.r4.dtype),
        )
        # alpha_small (the pre-refinement downsampled matte) rides along
        # for training: supervising it gives the recurrent decoder a
        # short gradient path -- with only the full-res L1 the net
        # collapses to all-background through the saturated sigmoid
        # (tools/train_variants.py)
        return {"alpha": alpha, "alpha_small": alpha_small, "state": new_state}
