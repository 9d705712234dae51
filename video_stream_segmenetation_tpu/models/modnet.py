"""MatteNet: the flagship MODNet-class portrait matting network.

Fills the role of the reference's `model_q4f16.onnx` (a quantized MODNet,
referenced at client/src/core/main.ts:6 but absent from the repo; I/O
contract: f32 [1,3,288,512] 'input' -> [1,1,288,512] 'output',
client/src/core/frameProcessorTest.ts:79-98).

Architecture follows the MODNet decomposition -- semantic branch at low
resolution, detail branch at high resolution, fusion -- re-designed
TPU-first:

* NHWC everywhere, bfloat16 compute / float32 params;
* one batched `[S, H, W, 3]` call serves all streams;
* static shapes; upsampling via nearest-repeat + refinement convs (no
  data-dependent resizes);
* channel counts in multiples of 8 (VPU lanes), biggest convs land on the
  MXU.

Outputs (dict):
    alpha    [S, H, W]   final matte in [0, 1]
    semantic [S, H/16, W/16]  coarse person probability (aux, training)
    detail   [S, H/4, W/4]    boundary detail logits   (aux, training)

Multi-class mode (person/hair/clothing..., BASELINE.json config 5) is
``MatteNet(num_classes=K)``: alpha becomes ``[S, H, W, K]`` softmax maps;
class 0 is background.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import (
    ConvBN,
    EASPP,
    MobileEncoder,
    nearest_x2,
)


class _DecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nearest_x2(x)
        if skip is not None:
            x = x[..., : skip.shape[-3], : skip.shape[-2], :]
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBN(self.features, dtype=self.dtype)(x, train)
        x = ConvBN(self.features, dtype=self.dtype)(x, train)
        return x


class MatteNet(nn.Module):
    """Trimap-free portrait matting, MODNet-class."""

    width: float = 1.0
    num_classes: int = 1  # 1 => single alpha matte; K>1 => multi-class
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [S, H, W, 3] float in [0, 1]; H, W divisible by 16."""
        in_dtype = x.dtype
        x = x.astype(self.dtype)
        s, h, w, _ = x.shape

        f2, f4, f8, f16 = MobileEncoder(self.width, dtype=self.dtype)(x, train)

        # --- semantic (low-res) branch: global context at /16
        sem = EASPP(96, dtype=self.dtype)(f16, train)
        sem_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(sem)

        # --- detail (high-res) branch: boundary refinement at /4
        sem_up = nearest_x2(sem, 2)[..., : f4.shape[-3], : f4.shape[-2], :]  # /16 -> /4
        d = jnp.concatenate([f4, sem_up], axis=-1)
        d = ConvBN(48, dtype=self.dtype)(d, train)
        d = ConvBN(32, dtype=self.dtype)(d, train)
        det_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(d)

        # --- fusion branch: decode /16 -> full res with skips
        u8 = _DecoderBlock(64, dtype=self.dtype)(sem, f8, train)  # /8
        u4 = _DecoderBlock(48, dtype=self.dtype)(u8, jnp.concatenate([f4, d], axis=-1), train)  # /4
        u2 = _DecoderBlock(24, dtype=self.dtype)(u4, f2, train)  # /2
        u1 = nearest_x2(u2)[..., :h, :w, :]
        u1 = jnp.concatenate([u1, x], axis=-1)
        u1 = ConvBN(16, dtype=self.dtype)(u1, train)
        alpha_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(u1)

        if self.num_classes == 1:
            alpha = nn.sigmoid(alpha_logit.astype(jnp.float32))[..., 0]
            sem_out = nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0]
            det_out = det_logit.astype(jnp.float32)[..., 0]
        else:
            alpha = nn.softmax(alpha_logit.astype(jnp.float32), axis=-1)
            sem_out = nn.softmax(sem_logit.astype(jnp.float32), axis=-1)
            det_out = det_logit.astype(jnp.float32)

        return {
            "alpha": alpha.astype(in_dtype) if in_dtype == jnp.float32 else alpha,
            "semantic": sem_out,
            "detail": det_out,
        }


def matting_alpha(model: MatteNet, params, frames) -> jnp.ndarray:
    """Convenience: frames [S, H, W, 3] in [0,1] -> alpha [S, H, W]."""
    return model.apply(params, frames)["alpha"]
