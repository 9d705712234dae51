"""MatteNetHD: the 720p-native, MXU-dense flagship matting network.

Profiling on TPU v5e (tools/bench_components.py) showed the original
pipeline spent 49 ms/batch on the 720p->288x512 gather resize and 23 ms
on a MobileNet-style MatteNet whose depthwise convs and 8-24 channel
layers reach ~5% of MXU peak.  This redesign is the TPU-first answer:

* **No host-style preprocess at all**: the network ingests the uint8
  720p frame directly; a 5x5 stride-5 conv stem performs the learned
  downsample 720x1280 -> 144x256 (the resize the reference only does
  because its ONNX model demands a 288x512 input,
  client/src/core/frameProcessorTest.ts:79-84, becomes a conv that the
  MXU executes at full tilt).
* **Dense 3x3 convolutions** with channel widths 32-256 (MXU-tile
  friendly) instead of depthwise blocks (VPU-bound on TPU).
* bf16 compute, NHWC, SE attention at the deep stages, dilated context
  block at /16 (the e-ASPP role).
* Output: alpha at 288x512 (the reference mask contract) -- i.e. 2x the
  stem resolution -- plus the MODNet-style aux outputs for training.

FLOP budget ~9 GFLOP/frame at 720p (MODNet-class capacity), laid out so
the batch-64 forward lands on the MXU as a handful of large matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from video_stream_segmenetation_tpu.models.backbones import ConvBN, SEBlock, nearest_x2

# plan-E-family deep widths (c2 at /2, c3 at /4 of the stem grid): the
# width/quality knee hunt of benchmarks/RESULTS.md.  Every member shares
# the plan-E structure (_plan_d with single convs) and the int8 serving
# graph including the whole-trunk megakernel, which reads channel counts
# from the weights (kernels/trunk_int8.py).
NANO_WIDTHS = {
    "nano": (192, 256),   # plan E
    "pico": (128, 192),   # plan F: ~38% fewer MACs than nano
    "femto": (128, 128),  # plan G: every level exactly one 128-lane group
}


class _Block(nn.Module):
    """Dense residual conv block: 3x3 -> 3x3 with SE option."""

    features: int
    use_se: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBN(self.features, dtype=self.dtype)(x, train)
        h = ConvBN(self.features, act=False, dtype=self.dtype)(h, train)
        if self.use_se:
            h = SEBlock(dtype=self.dtype)(h)
        if x.shape[-1] == self.features:
            h = h + x
        return nn.relu6(h)


class MatteNetHD(nn.Module):
    """uint8/float [S, 720, 1280, 3] -> alpha [S, 288, 512] (float32).

    Two channel plans, selected by ``stem_stride``:

    * stride 5 (plan A): stem to 144x256x32, /2 encoder to 18x32x256,
      alpha head at 144x256 + 2x matmul upsample.
    * stride >= 8 (plan B, the lane-perfect trunk): stem straight to
      72x128x128 -- every activation has >= 128 channels, so nothing
      pads on the 128-lane VPU/MXU tile; alpha head at 72x128 +
      ``head_upsample``x matmul upsample, with the guided joint-bilateral
      refine stage (stage 8) restoring edge detail against the full-res
      guide.  ~2.2x the FLOPs of plan A but the same wall-clock at bf16
      (47% vs 22% MXU, tools: /tmp probes 2026-08-16), and the int8
      serving path (models/quantized.py) runs it ~1.8x faster.
    """

    width: float = 1.0
    num_classes: int = 1
    stem_stride: int = 5
    head_upsample: int = 2
    # 'full' = plan B decoder (3x3 over the concat at every level);
    # 'light' = plan C: single b1 conv, 1x1-reduce decoder (u2 keeps one
    # 3x3 at /2, u1 is 1x1-only; the guided bilateral refine stage
    # restores edge detail against the full-res guide) -- ~43% fewer
    # FLOPs, the int8 serving step's round-2 lever (benchmarks/RESULTS.md);
    # 'micro' = plan D: no full-res-level conv at all (stem feeds the u1
    # skip directly), single dilation-3 context conv, 1x1-only decoder --
    # ~37% fewer FLOPs than plan C (8.5 vs 13.4 GFLOP/frame at 720p);
    # 'nano' = plan E: plan D with the residual _Blocks at /2 and /4
    # replaced by single 3x3 convs (6.3 GFLOP/frame);
    # 'pico'/'femto' = plans F/G: the nano structure at reduced deep
    # widths (NANO_WIDTHS) -- every level stays lane-perfect (multiples
    # of 128/64 lanes) and the int8 trunk megakernel reads widths from
    # the weights, so these need no kernel changes.
    # Quality-vs-ms study across plans: benchmarks/RESULTS.md.
    decoder: str = "full"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(n):
            return max(16, int(n * self.width) // 16 * 16)

        ss = self.stem_stride
        if ss >= 8 and (self.decoder == "micro" or self.decoder in NANO_WIDTHS):
            return self._plan_d(x, train, c)
        if ss >= 8 and self.decoder == "light":
            return self._plan_c(x, train, c)
        if ss >= 8:
            return self._plan_b(x, train, c)
        # stem: learned downsample (720p/5 = 144x256).  Two input layouts:
        # natural [S,H,W,3] (conv path) or space-to-depth packed
        # [S,H/ss,W/ss,ss*ss*3] uint8 / [0,1] float (ops/layout.py) -- the
        # stem collapses to one MXU matmul, same params either way
        # (backbones.PatchifiedConv).
        patched = x.shape[-1] == 3 * ss * ss
        if not patched:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) / 255.0
            else:
                x = x.astype(self.dtype)
        x0 = ConvBN(
            c(32), (ss, ss), strides=(ss, ss), dtype=self.dtype,
            patch_input=patched,
        )(x, train)

        d1 = ConvBN(c(64), strides=(2, 2), dtype=self.dtype)(x0, train)  # 72x128
        d1 = _Block(c(64), dtype=self.dtype)(d1, train)
        d2 = ConvBN(c(128), strides=(2, 2), dtype=self.dtype)(d1, train)  # 36x64
        d2 = _Block(c(128), use_se=True, dtype=self.dtype)(d2, train)
        d3 = ConvBN(c(256), strides=(2, 2), dtype=self.dtype)(d2, train)  # 18x32
        d3 = _Block(c(256), use_se=True, dtype=self.dtype)(d3, train)

        # context (e-ASPP role): dilated 3x3 pyramid at /16-of-mask res
        ctx = ConvBN(c(256), dilation=(2, 2), dtype=self.dtype)(d3, train)
        ctx = ConvBN(c(256), dilation=(4, 4), act=False, dtype=self.dtype)(ctx, train)
        ctx = SEBlock(dtype=self.dtype)(nn.relu6(ctx + d3))
        sem_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(ctx)

        # decoder with skips
        u2 = nearest_x2(ctx)[..., : d2.shape[-3], : d2.shape[-2], :]
        u2 = ConvBN(c(128), dtype=self.dtype)(jnp.concatenate([u2, d2], axis=-1), train)  # 36x64
        u1 = nearest_x2(u2)[..., : d1.shape[-3], : d1.shape[-2], :]
        u1 = ConvBN(c(64), dtype=self.dtype)(jnp.concatenate([u1, d1], axis=-1), train)  # 72x128
        det_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(u1)

        u0 = nearest_x2(u1)[..., : x0.shape[-3], : x0.shape[-2], :]
        u0 = ConvBN(c(32), dtype=self.dtype)(jnp.concatenate([u0, x0], axis=-1), train)  # 144x256
        # alpha logits at stem res, then an exact half-pixel 2x bilinear
        # upsample to the 288x512 mask contract -- an interp matmul is far
        # cheaper on TPU than full-res convs (decoder tail was ~60% of the
        # forward before this; see ARCHITECTURE.md perf notes)
        alpha_logit = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype
        )(u0)
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        # channelless planar resizes (clean MXU layout); per-class loop
        alpha_logit = jnp.stack(
            [
                resize_bilinear_mxu(
                    alpha_logit[..., k].astype(jnp.float32),
                    (2 * h0, 2 * w0),
                    method="half_pixel",
                    channel_last=False,
                )
                for k in range(self.num_classes)
            ],
            axis=-1,
        )

        if self.num_classes == 1:
            alpha = nn.sigmoid(alpha_logit.astype(jnp.float32))[..., 0]
            sem = nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0]
            det = det_logit.astype(jnp.float32)[..., 0]
        else:
            alpha = nn.softmax(alpha_logit.astype(jnp.float32), axis=-1)
            sem = nn.softmax(sem_logit.astype(jnp.float32), axis=-1)
            det = det_logit.astype(jnp.float32)

        return {"alpha": alpha, "semantic": sem, "detail": det}

    def _plan_d(self, x, train, c):
        """Micro lane-perfect trunk (decoder='micro'): plan C minus the
        full-res b1 conv (the stem output feeds the u1 skip directly),
        one dilation-3 context conv instead of the 2/4 pyramid, and a
        1x1-only decoder at both levels.  Edge detail rides the guided
        bilateral refine stage, as established by the plan-C study
        (lite evals BETTER than plan B; benchmarks/RESULTS.md).  Flax
        module order (the int8 quantizer keys off it):

          ConvBN_0 stem | ConvBN_1 d2dn | _Block_0 d2b | ConvBN_2 d3dn |
          _Block_1 d3b | ConvBN_3 ctx | SEBlock_0 ctxse |
          ConvBN_4 u2red(1x1) | ConvBN_5 u1red(1x1) | Conv_0 sem |
          Conv_1 det | Conv_2 alpha

        Plan E ('nano') replaces the two residual _Blocks with single 3x3
        ConvBNs (module order: ConvBN_0 stem | ConvBN_1 d2dn | ConvBN_2
        d2b | ConvBN_3 d3dn | ConvBN_4 d3b | ConvBN_5 ctx | SEBlock_0 |
        ConvBN_6 u2red | ConvBN_7 u1red | Conv_0..2 heads).
        """
        ss = self.stem_stride
        nano = self.decoder in NANO_WIDTHS
        # plans F/G ('pico'/'femto'): the nano structure at reduced deep
        # widths (c0 stays 128 so every level remains lane-perfect) --
        # the quality-vs-width knee hunt (benchmarks/RESULTS.md).
        w2, w3 = (
            (c(n) for n in NANO_WIDTHS[self.decoder])
            if nano else (c(192), c(256))
        )
        patched = x.shape[-1] == 3 * ss * ss
        if not patched:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) / 255.0
            else:
                x = x.astype(self.dtype)
        x0 = ConvBN(
            c(128), (ss, ss), strides=(ss, ss), dtype=self.dtype,
            patch_input=patched,
        )(x, train)  # 72x128
        d2 = ConvBN(w2, strides=(2, 2), dtype=self.dtype)(x0, train)  # 36x64
        if nano:
            d2 = ConvBN(w2, dtype=self.dtype)(d2, train)
        else:
            d2 = _Block(w2, use_se=True, dtype=self.dtype)(d2, train)
        d3 = ConvBN(w3, strides=(2, 2), dtype=self.dtype)(d2, train)  # 18x32
        if nano:
            d3 = ConvBN(w3, dtype=self.dtype)(d3, train)
        else:
            d3 = _Block(w3, use_se=True, dtype=self.dtype)(d3, train)

        ctx = ConvBN(w3, dilation=(3, 3), act=False, dtype=self.dtype)(
            d3, train
        )
        ctx = SEBlock(dtype=self.dtype)(nn.relu6(ctx + d3))

        u2 = nearest_x2(ctx)[..., : d2.shape[-3], : d2.shape[-2], :]
        u2 = ConvBN(w2, (1, 1), dtype=self.dtype)(
            jnp.concatenate([u2, d2], axis=-1), train
        )
        u1 = nearest_x2(u2)[..., : x0.shape[-3], : x0.shape[-2], :]
        u1 = ConvBN(c(128), (1, 1), dtype=self.dtype)(
            jnp.concatenate([u1, x0], axis=-1), train
        )

        sem_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(ctx)
        det_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(u1)
        alpha_logit = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype
        )(u1)
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        uf = self.head_upsample
        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        alpha_logit = jnp.stack(
            [
                resize_bilinear_mxu(
                    alpha_logit[..., k].astype(jnp.float32),
                    (uf * h0, uf * w0),
                    method="half_pixel",
                    channel_last=False,
                )
                for k in range(self.num_classes)
            ],
            axis=-1,
        )
        if self.num_classes == 1:
            alpha = nn.sigmoid(alpha_logit.astype(jnp.float32))[..., 0]
            sem = nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0]
            det = det_logit.astype(jnp.float32)[..., 0]
        else:
            alpha = nn.softmax(alpha_logit.astype(jnp.float32), axis=-1)
            sem = nn.softmax(sem_logit.astype(jnp.float32), axis=-1)
            det = det_logit.astype(jnp.float32)
        return {"alpha": alpha, "semantic": sem, "detail": det}

    def _plan_c(self, x, train, c):
        """Lite lane-perfect trunk (decoder='light'): same stem/deep
        stages as plan B, ~43% fewer FLOPs -- single 3x3 at the 72x128
        level, 1x1-reduce decoder.  Flax module order (the int8 quantizer
        keys off it, models/quantized.py):

          ConvBN_0 stem | ConvBN_1 b1 | ConvBN_2 d2dn | _Block_0 d2b |
          ConvBN_3 d3dn | _Block_1 d3b | ConvBN_4 ctx2 | ConvBN_5 ctx4 |
          SEBlock_0 ctxse | ConvBN_6 u2red(1x1) | ConvBN_7 u2(3x3) |
          ConvBN_8 u1red(1x1) | Conv_0 sem | Conv_1 det | Conv_2 alpha
        """
        ss = self.stem_stride
        patched = x.shape[-1] == 3 * ss * ss
        if not patched:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) / 255.0
            else:
                x = x.astype(self.dtype)
        x0 = ConvBN(
            c(128), (ss, ss), strides=(ss, ss), dtype=self.dtype,
            patch_input=patched,
        )(x, train)  # 72x128
        b1 = ConvBN(c(128), dtype=self.dtype)(x0, train)  # single 3x3
        d2 = ConvBN(c(192), strides=(2, 2), dtype=self.dtype)(b1, train)  # 36x64
        d2 = _Block(c(192), use_se=True, dtype=self.dtype)(d2, train)
        d3 = ConvBN(c(256), strides=(2, 2), dtype=self.dtype)(d2, train)  # 18x32
        d3 = _Block(c(256), use_se=True, dtype=self.dtype)(d3, train)

        ctx = ConvBN(c(256), dilation=(2, 2), dtype=self.dtype)(d3, train)
        ctx = ConvBN(c(256), dilation=(4, 4), act=False, dtype=self.dtype)(ctx, train)
        ctx = SEBlock(dtype=self.dtype)(nn.relu6(ctx + d3))
        sem_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(ctx)

        u2 = nearest_x2(ctx)[..., : d2.shape[-3], : d2.shape[-2], :]
        u2 = ConvBN(c(192), (1, 1), dtype=self.dtype)(
            jnp.concatenate([u2, d2], axis=-1), train
        )
        u2 = ConvBN(c(192), dtype=self.dtype)(u2, train)  # one 3x3 at /2
        u1 = nearest_x2(u2)[..., : b1.shape[-3], : b1.shape[-2], :]
        u1 = ConvBN(c(128), (1, 1), dtype=self.dtype)(
            jnp.concatenate([u1, b1], axis=-1), train
        )
        det_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(u1)

        alpha_logit = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype
        )(u1)
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        uf = self.head_upsample
        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        alpha_logit = jnp.stack(
            [
                resize_bilinear_mxu(
                    alpha_logit[..., k].astype(jnp.float32),
                    (uf * h0, uf * w0),
                    method="half_pixel",
                    channel_last=False,
                )
                for k in range(self.num_classes)
            ],
            axis=-1,
        )
        if self.num_classes == 1:
            alpha = nn.sigmoid(alpha_logit.astype(jnp.float32))[..., 0]
            sem = nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0]
            det = det_logit.astype(jnp.float32)[..., 0]
        else:
            alpha = nn.softmax(alpha_logit.astype(jnp.float32), axis=-1)
            sem = nn.softmax(sem_logit.astype(jnp.float32), axis=-1)
            det = det_logit.astype(jnp.float32)
        return {"alpha": alpha, "semantic": sem, "detail": det}

    def _plan_b(self, x, train, c):
        """Lane-perfect trunk (stem_stride >= 8; see class docstring)."""
        ss = self.stem_stride
        patched = x.shape[-1] == 3 * ss * ss
        if not patched:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) / 255.0
            else:
                x = x.astype(self.dtype)
        x0 = ConvBN(
            c(128), (ss, ss), strides=(ss, ss), dtype=self.dtype,
            patch_input=patched,
        )(x, train)  # 720p/10 = 72x128
        b1 = _Block(c(128), dtype=self.dtype)(x0, train)
        d2 = ConvBN(c(192), strides=(2, 2), dtype=self.dtype)(b1, train)  # 36x64
        d2 = _Block(c(192), use_se=True, dtype=self.dtype)(d2, train)
        d3 = ConvBN(c(256), strides=(2, 2), dtype=self.dtype)(d2, train)  # 18x32
        d3 = _Block(c(256), use_se=True, dtype=self.dtype)(d3, train)

        ctx = ConvBN(c(256), dilation=(2, 2), dtype=self.dtype)(d3, train)
        ctx = ConvBN(c(256), dilation=(4, 4), act=False, dtype=self.dtype)(ctx, train)
        ctx = SEBlock(dtype=self.dtype)(nn.relu6(ctx + d3))
        sem_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(ctx)

        u2 = nearest_x2(ctx)[..., : d2.shape[-3], : d2.shape[-2], :]
        u2 = ConvBN(c(192), dtype=self.dtype)(jnp.concatenate([u2, d2], axis=-1), train)
        u1 = nearest_x2(u2)[..., : b1.shape[-3], : b1.shape[-2], :]
        u1 = ConvBN(c(128), dtype=self.dtype)(jnp.concatenate([u1, b1], axis=-1), train)
        det_logit = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(u1)

        alpha_logit = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype
        )(u1)
        from video_stream_segmenetation_tpu.ops.resize import resize_bilinear_mxu

        uf = self.head_upsample
        h0, w0 = alpha_logit.shape[-3], alpha_logit.shape[-2]
        alpha_logit = jnp.stack(
            [
                resize_bilinear_mxu(
                    alpha_logit[..., k].astype(jnp.float32),
                    (uf * h0, uf * w0),
                    method="half_pixel",
                    channel_last=False,
                )
                for k in range(self.num_classes)
            ],
            axis=-1,
        )
        if self.num_classes == 1:
            alpha = nn.sigmoid(alpha_logit.astype(jnp.float32))[..., 0]
            sem = nn.sigmoid(sem_logit.astype(jnp.float32))[..., 0]
            det = det_logit.astype(jnp.float32)[..., 0]
        else:
            alpha = nn.softmax(alpha_logit.astype(jnp.float32), axis=-1)
            sem = nn.softmax(sem_logit.astype(jnp.float32), axis=-1)
            det = det_logit.astype(jnp.float32)
        return {"alpha": alpha, "semantic": sem, "detail": det}
