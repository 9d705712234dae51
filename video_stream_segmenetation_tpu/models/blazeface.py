"""FaceFinder: BlazeFace-class anchor detector.

Fills the role of `MediaPipeFaceDetector.onnx` (I/O contract from
client/src/core/model.ts:32-34 and frameProcessorTest.ts:406-412:
'image' f32 [1,3,256,256] -> box_coords [1,896,16] + box_scores [1,896,1])
and of `blaze.onnx` (same detector + in-graph NMS with
conf/iou/max_detections scalar inputs, frameProcessor.ts:270-291).

TPU-first deltas from the ONNX originals:
* NHWC [S, 256, 256, 3] batched input;
* the SSD anchor decode lives in ops/detect.py as a reusable op and the
  model emits *decoded normalized corner boxes* -- same contract the
  reference's patched graph exposes to JS;
* scores are sigmoid probabilities (the JS thresholds at 0.6 on the raw
  score values, frameProcessorTest.ts:35,134);
* NMS (for the blaze.onnx-style API) is `ops.detect.nms`, jit-friendly,
  instead of an ONNX NonMaxSuppression node.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import ConvBN
from video_stream_segmenetation_tpu.ops.detect import blazeface_anchors, decode_anchor_boxes


class FaceFinder(nn.Module):
    """256x256 in -> (box_coords [S,896,16] normalized, box_scores [S,896])."""

    dtype: Any = jnp.bfloat16
    input_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        # dense 3x3 trunk (not the ONNX original's depthwise blocks:
        # depthwise convs at 24-96 channels are VPU-bound on TPU; dense
        # convs of the same footprint ride the MXU)
        x = x.astype(self.dtype)
        x = ConvBN(32, strides=(2, 2), dtype=self.dtype)(x, train)  # /2 128
        x = ConvBN(48, strides=(2, 2), dtype=self.dtype)(x, train)  # /4 64
        x = ConvBN(48, dtype=self.dtype)(x, train)
        x = ConvBN(64, strides=(2, 2), dtype=self.dtype)(x, train)  # /8 32
        x = ConvBN(64, dtype=self.dtype)(x, train)
        f16 = ConvBN(96, strides=(2, 2), dtype=self.dtype)(x, train)  # /16 16
        f16 = ConvBN(96, dtype=self.dtype)(f16, train)
        f32 = ConvBN(128, strides=(2, 2), dtype=self.dtype)(f16, train)  # /32 8
        f32 = ConvBN(128, dtype=self.dtype)(f32, train)

        # anchor heads: 16x16 grid x2 anchors, 8x8 grid x6 anchors = 896
        def head(feat, per_cell):
            raw = nn.Conv(per_cell * 16, (3, 3), padding="SAME", dtype=self.dtype)(feat)
            cls = nn.Conv(per_cell, (3, 3), padding="SAME", dtype=self.dtype)(feat)
            s = feat.shape[0]
            raw = raw.reshape(s, -1, 16)
            cls = cls.reshape(s, -1)
            return raw, cls

        raw16, cls16 = head(f16, 2)
        raw32, cls32 = head(f32, 6)
        raw = jnp.concatenate([raw16, raw32], axis=1).astype(jnp.float32)
        logits = jnp.concatenate([cls16, cls32], axis=1).astype(jnp.float32)

        anchors = jnp.asarray(blazeface_anchors(self.input_size))
        coords = decode_anchor_boxes(raw, anchors, self.input_size)
        scores = nn.sigmoid(logits)
        return {"box_coords": coords, "box_scores": scores}
