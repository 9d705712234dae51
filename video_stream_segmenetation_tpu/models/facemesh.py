"""LandmarkNet: FaceMesh-468-class landmark regressor.

Fills the role of `MediaPipeFaceLandmarkDetector.onnx` (contract from
client/src/core/frameProcessorTest.ts:475-500: 'image' f32 [1,3,192,192] ->
'scores' [1] + 'landmarks' [1,468,3] normalized to the 192x192 input).

TPU-first: NHWC [S,192,192,3] batched; regression head is one big dense
layer over pooled features (a clean MXU matmul) instead of the original's
mixed conv stack.  Landmarks come out normalized to [0,1] x/y (+z), exactly
the convention the JS denormalizes with roi width/height
(frameProcessorTest.ts:490-497).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import ConvBN

NUM_LANDMARKS = 468


class LandmarkNet(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # dense 3x3 trunk (TPU-first; see blazeface.py note on depthwise)
        x = x.astype(self.dtype)
        x = ConvBN(32, strides=(2, 2), dtype=self.dtype)(x, train)  # 96
        x = ConvBN(48, strides=(2, 2), dtype=self.dtype)(x, train)  # 48
        x = ConvBN(48, dtype=self.dtype)(x, train)
        x = ConvBN(64, strides=(2, 2), dtype=self.dtype)(x, train)  # 24
        x = ConvBN(64, dtype=self.dtype)(x, train)
        x = ConvBN(96, strides=(2, 2), dtype=self.dtype)(x, train)  # 12
        x = ConvBN(96, dtype=self.dtype)(x, train)
        x = ConvBN(128, strides=(2, 2), dtype=self.dtype)(x, train)  # 6
        x = ConvBN(256, (1, 1), dtype=self.dtype)(x, train)

        pooled = jnp.mean(x, axis=(-3, -2))  # [S, 256]
        # One MXU-friendly matmul: 256 -> 468*3 + 1
        out = nn.Dense(NUM_LANDMARKS * 3 + 1, dtype=self.dtype)(pooled)
        out = out.astype(jnp.float32)
        lm = out[..., : NUM_LANDMARKS * 3].reshape(
            out.shape[:-1] + (NUM_LANDMARKS, 3)
        )
        # x/y normalized to [0,1]; z unconstrained (depth-ish)
        xy = nn.sigmoid(lm[..., :2])
        z = lm[..., 2:3]
        score = nn.sigmoid(out[..., -1])
        return {"landmarks": jnp.concatenate([xy, z], axis=-1), "scores": score}
