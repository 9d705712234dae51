"""SaliencyNet: U2Net-class nested-U salient object segmenter.

Fills the role of the U2Net ONNX model expected by
client/src/core/u2FrameProc.ts (contract at :4-7, 43-75, 165-167:
'input.1' [1,3,320,320], optional ImageNet normalization, any [1,1,320,320]
output picked by shape).

TPU-first: NHWC batched, RSU (residual U) blocks built from the shared
ConvBN primitive, nearest-repeat upsampling, bf16 compute.  Depth/widths
are trimmed relative to full U2Net (u2netp-class) -- this is the optional
second model family, not the flagship.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import ConvBN, nearest_x2


class RSU(nn.Module):
    """Residual U-block: an inner encoder-decoder at the block's scale."""

    depth: int
    mid: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        hx = ConvBN(self.out, dtype=self.dtype)(x, train)
        # inner encoder
        feats = []
        h = hx
        for _ in range(self.depth):
            h = ConvBN(self.mid, dtype=self.dtype)(h, train)
            feats.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        h = ConvBN(self.mid, dilation=(2, 2), dtype=self.dtype)(h, train)
        # inner decoder
        for skip in reversed(feats):
            h = nearest_x2(h)[..., : skip.shape[-3], : skip.shape[-2], :]
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBN(self.mid, dtype=self.dtype)(h, train)
        h = ConvBN(self.out, dtype=self.dtype)(h, train)
        return h + hx


class SaliencyNet(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [S, H, W, 3] (320x320 canonical).  Returns dict with 'alpha'
        [S, H, W] plus side outputs for deep supervision."""
        x = x.astype(self.dtype)
        s, h, w, _ = x.shape

        e1 = RSU(4, 16, 32, self.dtype)(x, train)
        p1 = nn.max_pool(e1, (2, 2), strides=(2, 2), padding="SAME")
        e2 = RSU(3, 16, 48, self.dtype)(p1, train)
        p2 = nn.max_pool(e2, (2, 2), strides=(2, 2), padding="SAME")
        e3 = RSU(2, 24, 64, self.dtype)(p2, train)
        p3 = nn.max_pool(e3, (2, 2), strides=(2, 2), padding="SAME")
        e4 = RSU(1, 32, 96, self.dtype)(p3, train)

        d3 = nearest_x2(e4)[..., : e3.shape[-3], : e3.shape[-2], :]
        d3 = RSU(1, 24, 64, self.dtype)(jnp.concatenate([d3, e3], axis=-1), train)
        d2 = nearest_x2(d3)[..., : e2.shape[-3], : e2.shape[-2], :]
        d2 = RSU(2, 16, 48, self.dtype)(jnp.concatenate([d2, e2], axis=-1), train)
        d1 = nearest_x2(d2)[..., : e1.shape[-3], : e1.shape[-2], :]
        d1 = RSU(3, 16, 32, self.dtype)(jnp.concatenate([d1, e1], axis=-1), train)

        def side(feat, times):
            s_logit = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(feat)
            up = s_logit
            if times:
                up = nearest_x2(up, times)[..., :h, :w, :]
            return up.astype(jnp.float32)[..., 0]

        s1 = side(d1, 0)
        s2 = side(d2, 1)
        s3 = side(d3, 2)
        s4 = side(e4, 3)
        fused = nn.Conv(1, (1, 1), dtype=jnp.float32)(
            jnp.stack([s1, s2, s3, s4], axis=-1)
        )[..., 0]
        return {
            "alpha": nn.sigmoid(fused),
            "side": [nn.sigmoid(s) for s in (s1, s2, s3, s4)],
        }
